"""vln_ver_tpu — TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
DefaultRui/VLN-VER (CVPR 2024 "Volumetric Environment Representation for
Vision-Language Navigation").

The package is a ground-up redesign, not a port: the compute path is pure-functional
JAX compiled to single XLA programs per mode (train-step / eval-forward / bev-only),
the deformable-attention sampling runs as a fused Pallas TPU kernel with an XLA
reference fallback, and scaling is expressed as shardings over a
``jax.sharding.Mesh`` instead of NCCL/DDP.

Layer map (mirrors SURVEY.md §1, reimagined TPU-first):

* ``vln_ver_tpu.geometry``   — voxel reference grids + camera projection (pure fp32)
* ``vln_ver_tpu.boxes``      — 10-code box codec (normalize/denormalize)
* ``vln_ver_tpu.occupancy``  — sparse<->dense occupancy, decode rules
* ``vln_ver_tpu.ops``        — deformable-attention sampling (XLA oracle + Pallas)
* ``vln_ver_tpu.models``     — flax.linen modules (encoder/decoder/heads/detector)
* ``vln_ver_tpu.losses``     — focal / L1 losses with mmdet avg_factor semantics
* ``vln_ver_tpu.matching``   — Hungarian assignment (in-graph auction + host exact)
* ``vln_ver_tpu.coders``     — NMS-free box decode, layout decode
* ``vln_ver_tpu.evaluation`` — SSC occupancy metrics, indoor 3D-AP
* ``vln_ver_tpu.data``       — MP3D dataset (pkl/HDF5/npy), synthetic scenes
* ``vln_ver_tpu.parallel``   — mesh construction + sharding rules
* ``vln_ver_tpu.train``      — optax train state, jitted train/eval steps
* ``vln_ver_tpu.config``     — MMDetection3D-compatible config front-end
"""

__version__ = "0.1.0"
