"""Pipeline parallelism: a GPipe-style transform for uniform layer stacks.

The reference scales only by DDP (SURVEY.md §2.7); like tensor
parallelism (parallel/tensor.py) this capability ships beyond it for
deeper VER variants (more encoder layers / bigger stacks than the active
3-layer config needs).  TPU-idiomatic design per the scaling-book recipe:

* a ``stage`` mesh axis holds the layer stack sharded along its leading
  (layer) axis — stage ``s`` owns the contiguous block of
  ``L / S`` layers;
* the batch is split into ``M`` microbatches; inside one
  ``shard_map``, a ``lax.scan`` over ``M + S - 1`` ticks advances every
  stage in lockstep, activations hop to the next stage over ICI via
  ``lax.ppermute`` each tick (the classic pipelined-scan schedule with
  ``S - 1`` bubble ticks);
* outputs are collected on the last stage and replicated with a masked
  ``psum``; the whole thing is differentiable (scan + ppermute + cond
  transpose cleanly), so it drops into a pjit train step.

Numerical parity with the sequential stack (outputs AND grads) is proven
on an 8-device CPU mesh in tests/test_pipeline.py, including on the real
``VoxelEncoderLayer``.  Layers must be batch-elementwise (true for the
transformer stack: attention/FFN/LN mix nothing across batch rows).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.4.35 moved shard_map out of experimental
    from jax.sharding import shard_map  # type: ignore
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def make_pp_mesh(stage: int, data: int = 1, devices=None) -> Mesh:
    """``(stage,)`` mesh — or ``(stage, data)`` when ``data > 1`` to
    compose the pipeline with data parallelism (each stage row holds
    ``data`` devices that split the microbatch rows)."""
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) >= stage * data, (len(devices), stage, data)
    if data == 1:
        return Mesh(np.asarray(devices[:stage]), axis_names=("stage",))
    arr = np.asarray(devices[: stage * data]).reshape(stage, data)
    return Mesh(arr, axis_names=("stage", "data"))


def stack_layer_params(param_trees) -> Any:
    """Stack per-layer param trees into one tree with a leading layer
    axis (the axis ``pipeline_apply`` shards over ``stage``)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *param_trees)


def pipeline_apply(mesh: Mesh, layer_fn: Callable, stacked_params,
                   x: jnp.ndarray, *batch_args, shared=(),
                   microbatches: int = 2):
    """Run ``x`` through ``L`` stacked layers pipelined over the mesh's
    ``stage`` axis.

    ``layer_fn(params_i, h, *batch_args_mb, *shared) -> h`` is one layer;
    ``stacked_params`` leaves carry a leading layer axis of size ``L``
    (``L % S == 0``).  Batch dim 0 of ``x`` and every ``batch_args`` array
    (e.g. the SCA value / reference points / masks, which are per-sample)
    splits into ``microbatches`` equal microbatches — stage ``s`` at tick
    ``t`` works on microbatch ``t - s`` and indexes its slice of each
    batch arg; ``shared`` arrays broadcast unsplit to every stage.
    """
    S = int(dict(zip(mesh.axis_names, mesh.devices.shape))["stage"])
    L = int(jax.tree.leaves(stacked_params)[0].shape[0])
    assert L % S == 0, f"{L} layers over {S} stages"
    M = int(microbatches)
    B = x.shape[0]
    assert B % M == 0, f"batch {B} into {M} microbatches"
    mb = B // M
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if "data" in axes and mb % axes["data"] != 0:
        raise ValueError(
            f"microbatch rows {mb} (batch {B} / {M} microbatches) must "
            f"be divisible by the mesh data axis size {axes['data']}")
    x_mb = x.reshape(M, mb, *x.shape[1:])
    bargs_mb = tuple(a.reshape(M, mb, *a.shape[1:]) for a in batch_args)

    def per_stage(params, x_mb, bargs_mb, *shared):
        s = lax.axis_index("stage")

        def apply_stage(h, ex):
            def body(h, p_i):
                return layer_fn(p_i, h, *ex, *shared), None
            h, _ = lax.scan(body, h, params)
            return h

        def tick(state, t):
            carry, outs = state
            # stage 0 ingests microbatch t; later stages consume the
            # previous stage's tick-(t-1) output delivered by ppermute.
            # Stage s works on microbatch t - s and slices its batch args.
            inject = x_mb[jnp.clip(t, 0, M - 1)]
            cur = jnp.where(s == 0, inject, carry)
            mb_idx = jnp.clip(t - s, 0, M - 1)
            ex = tuple(a[mb_idx] for a in bargs_mb)
            y = apply_stage(cur, ex)
            out_idx = t - (S - 1)
            valid = (s == S - 1) & (out_idx >= 0)
            outs = lax.cond(
                valid,
                lambda o: lax.dynamic_update_index_in_dim(
                    o, y, jnp.maximum(out_idx, 0), 0),
                lambda o: o, outs)
            carry = lax.ppermute(
                y, "stage", [(i, (i + 1) % S) for i in range(S)])
            return (carry, outs), None

        state0 = (jnp.zeros_like(x_mb[0]), jnp.zeros_like(x_mb))
        (c, outs), _ = lax.scan(tick, state0, jnp.arange(M + S - 1))
        # replicate the last stage's collected outputs to every stage
        return lax.psum(
            jnp.where(s == S - 1, outs, jnp.zeros_like(outs)), "stage")

    # with a (stage, data) mesh the microbatch ROWS additionally split
    # over 'data' — pure SPMD for the batch-elementwise layers, while
    # ppermute stays a stage-axis collective
    dp = "data" in mesh.axis_names
    mb_spec = P(None, "data") if dp else P()
    shared_specs = tuple(P() for _ in shared)
    fn = shard_map(per_stage, mesh=mesh,
                   in_specs=(P("stage"), mb_spec,
                             tuple(mb_spec for _ in bargs_mb))
                   + shared_specs,
                   out_specs=mb_spec, check_rep=False)
    y = fn(stacked_params, x_mb, bargs_mb, *shared)
    return y.reshape(B, *x.shape[1:])


def sequential_apply(layer_fn: Callable, stacked_params, x, *batch_args,
                     shared=()):
    """Reference semantics: the same stack applied layer by layer."""
    def body(h, p_i):
        return layer_fn(p_i, h, *batch_args, *shared), None
    h, _ = lax.scan(body, x, stacked_params)
    return h
