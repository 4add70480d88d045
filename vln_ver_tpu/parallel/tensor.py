"""Tensor parallelism: shard large parameter matrices over a ``model``
mesh axis.

The reference has no TP (SURVEY.md §2.7 — DDP only); at ~200M params the
VER model does not *need* it, but larger variants (wider embeds, more
cameras, bigger occupancy heads) do, so the capability ships here as a
generic GSPMD rule: every parameter matrix above a size threshold gets its
largest model-axis-divisible dimension sharded over ``model``; everything
else (biases, norms, embeddings below threshold) replicates.  XLA inserts
the all-gathers / reduce-scatters; because the rule also shards the AdamW
moments, optimizer memory scales down with the ``model`` axis too.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_tp_mesh(data: int, model: int, view: int = 1,
                 devices=None) -> Mesh:
    """(data, view, model) mesh: batch over ``data``, cameras over
    ``view``, parameter matrices over ``model``."""
    devices = devices if devices is not None else jax.devices()
    assert data * view * model == len(devices), (data, view, model,
                                                 len(devices))
    arr = np.asarray(devices).reshape(data, view, model)
    return Mesh(arr, axis_names=("data", "view", "model"))


def param_pspec(x, model_size: int, min_size: int = 1 << 15) -> P:
    """Sharding rule for one parameter leaf: shard the LARGEST
    model-divisible axis over ``model`` (ties resolve to the LAST such
    axis — the output/features axis of square kernels); replicate small
    or indivisible leaves.  Largest-first matters: a (4096, 8) kernel on
    an 8-way model axis must shard the 4096 rows, not leave one scalar
    column per device."""
    shape = getattr(x, "shape", ())
    if len(shape) < 2 or int(np.prod(shape)) < min_size:
        return P()
    best_ax, best = -1, -1
    for ax in range(len(shape)):
        if (shape[ax] % model_size == 0 and shape[ax] >= model_size
                and shape[ax] >= best):
            best, best_ax = shape[ax], ax
    if best_ax >= 0:
        spec = [None] * len(shape)
        spec[best_ax] = "model"
        return P(*spec)
    return P()


def shard_params(mesh: Mesh, tree, min_size: int = 1 << 15):
    """device_put a params/opt-state pytree with the TP rule (leaves that
    don't match the rule replicate)."""
    model_size = dict(zip(mesh.axis_names, mesh.devices.shape))["model"]

    def put(x):
        if not hasattr(x, "shape"):
            return x
        return jax.device_put(
            x, NamedSharding(mesh, param_pspec(x, model_size, min_size)))

    return jax.tree.map(put, tree)


def shard_state(mesh: Mesh, state, min_size: int = 1 << 15):
    """Shard a TrainState: params and the matching optimizer moments get
    the TP rule; scalars/steps replicate."""
    return shard_params(mesh, state, min_size)


def tp_fraction(tree, mesh) -> float:
    """Fraction of parameter bytes that are model-sharded (diagnostics)."""
    model_size = dict(zip(mesh.axis_names, mesh.devices.shape))["model"]
    tot = shd = 0
    for x in jax.tree.leaves(tree):
        if not hasattr(x, "shape"):
            continue
        n = int(np.prod(x.shape)) if x.shape else 1
        tot += n
        if param_pspec(x, model_size) != P():
            shd += n
    return shd / max(tot, 1)
