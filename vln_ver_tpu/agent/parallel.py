"""Data-parallel agent training over a device mesh.

The reference's one distributed behavior is DDP *training*
(apis/mmdet_train.py:76-86).  The perception trainer matches it with the
(data, view) mesh; this module gives the agent stage (pretraining +
imitation updates) the same story: a 1-axis ``data`` mesh, params/opt
state replicated, the stacked decision-step batch sharded on its leading
axis, and GSPMD inserting the gradient all-reduce — exactly the DDP
recipe, with XLA collectives instead of NCCL.

Both agent objectives are pure global means/sums over the batch axis
(rollout.imitation_step_loss, pretrain.pretrain_loss), so the sharded
step is math-identical to the single-device step
(tests/test_agent_mesh.py proves bit-level loss parity; random masking
included — JAX's partitionable threefry generates identical bits for a
sharded shape).

Rollouts stay single-device: episode stepping is host-side by design
(BASELINE.json north star) and the policy-step batch is small; the
optimizer update is where the FLOPs and the reference's DDP live.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_agent_mesh(n: Optional[int] = None, devices=None) -> Mesh:
    """1-axis ('data',) mesh over the first ``n`` local devices."""
    devices = list(devices if devices is not None else jax.local_devices())
    n = n or len(devices)
    if n > len(devices):
        raise ValueError(f"--mesh {n}: only {len(devices)} local devices")
    return Mesh(np.asarray(devices[:n]), axis_names=("data",))


def shard_agent_batch(mesh: Mesh, batch):
    """Shard every leaf (arrays AND the EpisodicMemory namedtuple) on its
    leading batch axis.  Batch size must divide the mesh."""
    s = NamedSharding(mesh, P("data"))
    bsz = mesh.devices.shape[0]

    def put(x):
        x = jnp.asarray(x)
        if x.shape[0] % bsz:
            raise ValueError(
                f"batch dim {x.shape[0]} not divisible by mesh size {bsz}")
        return jax.device_put(x, s)

    return jax.tree.map(put, batch)


def replicate_agent(mesh: Mesh, tree):
    """Replicate params / optimizer state across the mesh (the one
    replication rule lives in parallel.mesh.replicate)."""
    from ..parallel.mesh import replicate
    return replicate(mesh, tree)
