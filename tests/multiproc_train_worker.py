"""Worker for tests/test_multiprocess_train.py.

One of 2 ``jax.distributed`` CPU processes (4 local virtual devices each)
jitting the FULL global train step — forward + in-graph auction matching
+ losses + backward + clip + AdamW — over the joint 8-device
(data=4, view=2) mesh, i.e. the reference's DDP-training behavior
(apis/mmdet_train.py:76-86) expressed as one GSPMD program spanning
processes.  Writes the per-step loss trajectory and the final params so
the parent test can assert agreement with a single-process 8-device run.

``build_setup()`` is shared with the parent test: both sides must build
bit-identical configs, init params, and batches.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_LOCAL = 4          # virtual CPU devices per process
N_STEPS = 3
MESH_SHAPE = (4, 2)  # (data, view) over the 8 global devices


def build_setup():
    """Deterministic tiny train setup (cfg, init params as host arrays,
    train config, N_STEPS batches as host arrays)."""
    import numpy as np

    import jax

    from vln_ver_tpu import geometry
    from vln_ver_tpu.models import VERConfig, VoxelFormer

    cfg = VERConfig(
        bev_z=2, bev_h=4, bev_w=4, occupancy_size=(1.5, 1.5, 0.4375),
        num_cams=4, feat_h=4, feat_w=4, in_channels=32, embed_dims=32,
        num_heads=4, encoder_layers=1, decoder_layers=2, ffn_dim=64,
        num_query=8, occ_dims=16, dropout_rate=0.0,
    )
    bs, max_gt = 8, 4

    def make_batch(seed):
        rng = np.random.default_rng(seed)
        feats = rng.standard_normal(
            (bs, cfg.num_cams, cfg.feat_h, cfg.feat_w,
             cfg.in_channels)).astype(np.float32)
        w2p = np.stack([
            np.stack([geometry.make_pinhole_world2pixel(
                70.0, 90.0 * i, (0.0, 0.0, 0.0))
                for i in range(cfg.num_cams)])
            for _ in range(bs)]).astype(np.float32)
        gt = np.zeros((bs, max_gt, 9), np.float32)
        gt[..., 0:2] = rng.uniform(-2, 2, (bs, max_gt, 2))
        gt[..., 3:6] = rng.uniform(0.5, 1.5, (bs, max_gt, 3))
        return dict(
            features=feats, world2pixel=w2p,
            origin_shift=np.zeros((bs, 3), np.float32),
            gt_boxes=gt,
            gt_labels=rng.integers(0, cfg.num_classes,
                                   (bs, max_gt)).astype(np.int32),
            gt_valid=np.tile(np.asarray([True, True, False, False]),
                             (bs, 1)),
            occ_dense=rng.integers(0, cfg.occupancy_classes + 1,
                                   (bs, cfg.voxel_num)).astype(np.int32))

    batches = [make_batch(41 + i) for i in range(N_STEPS)]
    model = VoxelFormer(cfg)
    b0 = batches[0]
    import jax.numpy as jnp
    params = jax.device_get(model.init(
        jax.random.PRNGKey(0), jnp.asarray(b0["features"][:1]),
        jnp.asarray(b0["world2pixel"][:1]),
        jnp.asarray(b0["origin_shift"][:1])))
    return cfg, model, params, batches


def run_steps(mesh, cfg, model, params, batches):
    """Replicate state on ``mesh``, run N_STEPS, return (losses, final
    host params)."""
    import jax

    from vln_ver_tpu.parallel import replicate, shard_batch
    from vln_ver_tpu.train import (TrainConfig, create_train_state,
                                   make_train_step)

    from jax.sharding import NamedSharding, PartitionSpec

    tc = TrainConfig(warmup_steps=1, total_steps=10)
    state = jax.device_get(create_train_state(model, params, tc))
    state = replicate(mesh, state)
    # pin outputs replicated: keeps the step's signature identical across
    # calls so ONE AOT executable serves every step (see make_train_step)
    step = make_train_step(cfg, tc, donate=False,
                           out_sharding=NamedSharding(mesh,
                                                      PartitionSpec()))
    losses = []
    with mesh:
        # AOT-compile BEFORE the first execution, then rendezvous on the
        # coordination-service barrier (minutes-long timeout).  Gloo's
        # context init only allows ~30 s of skew between processes at
        # the first collective; on a 1-core host the two processes'
        # compiles serialize (minutes each when the AOT cache was built
        # on a different machine type), so executing straight out of
        # jit would strand process 0 in the Gloo rendezvous while
        # process 1 is still compiling.
        compiled = step.lower(state, shard_batch(mesh, batches[0]),
                              jax.random.PRNGKey(100)).compile()
        _sync_processes("train_step_compiled")
        for i, b in enumerate(batches):
            state, metrics = compiled(state, shard_batch(mesh, b),
                                      jax.random.PRNGKey(100 + i))
            losses.append(float(metrics["loss"]))
    return losses, jax.device_get(state.params)


def _sync_processes(name: str, timeout_ms: int = 1_200_000):
    """Coordination-service barrier (NOT a device collective — those are
    what we are trying to protect from rendezvous-window skew)."""
    from jax._src import distributed
    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)


def main():
    out_json = sys.argv[1]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={N_LOCAL}").strip()
    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from vln_ver_tpu.parallel.multihost import initialize_if_needed
    initialize_if_needed()
    assert jax.local_device_count() == N_LOCAL, jax.local_devices()
    assert jax.device_count() == 2 * N_LOCAL, jax.devices()

    import numpy as np

    from vln_ver_tpu.parallel import make_mesh

    cfg, model, params, batches = build_setup()
    mesh = make_mesh(MESH_SHAPE, devices=jax.devices())
    losses, final = run_steps(mesh, cfg, model, params, batches)

    if jax.process_index() == 0:
        from vln_ver_tpu.utils.params import flatten_params
        np.savez(out_json + ".npz", **flatten_params(final["params"]))
        with open(out_json, "w") as f:
            json.dump({"losses": losses}, f)
    # all processes exit cleanly so the coordinator shuts down
    jax.effects_barrier()


if __name__ == "__main__":
    main()
