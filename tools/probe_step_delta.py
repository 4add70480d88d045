#!/usr/bin/env python
"""Decompose the train-step time beyond the grad phase (the ~16 ms
grad->step delta at the vocc shape, VERDICT r2 #6).

Scan-differenced on-chip timings of four nested step bodies at the real
model size, all sharing the identical value_and_grad core:

  grad       loss + grads (+ a scalar grad-norm read)         [baseline]
  grad_opt   + the optax chain (clip_by_global_norm + AdamW)
             applied functionally — no TrainState, no metrics
  step_nogn  the full make_train_step body with the redundant
             metrics["grad_norm"] recomputation removed
  step       the full make_train_step body (shipped)

(step - step_nogn) prices the metric's extra 208M-element read;
(step_nogn - grad_opt) prices TrainState bookkeeping / scan-carry
layout; (grad_opt - grad) should match the standalone optimizer floor
from tools/probe_opt.py (11.75 ms @ 208M).  Results land in
docs/performance.md.

Usage: python tools/probe_step_delta.py [--cams 6] [--batch 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cams", type=int, default=6)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--max-gt", type=int, default=16)
    p.add_argument("--modes", default="grad,grad_opt,step_nogn,step")
    args = p.parse_args()

    import jax

    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _example_inputs
    from vln_ver_tpu.models import VERConfig, VoxelFormer
    from vln_ver_tpu.train import (TrainConfig, create_train_state,
                                   make_train_step)
    from vln_ver_tpu.train.objective import compute_losses
    from vln_ver_tpu.train.step import optax_global_norm
    from vln_ver_tpu.utils.bench import scan_diff_time

    b = args.batch
    cfg = VERConfig(num_cams=args.cams, dtype=jnp.bfloat16)
    model = VoxelFormer(cfg)
    rng = np.random.default_rng(0)
    feats, w2p, shift = _example_inputs(cfg, batch=b)
    gt_boxes = np.zeros((b, args.max_gt, 9), np.float32)
    gt_boxes[:, :, 3:6] = 1.0
    gt_boxes[:, :, 0:2] = rng.uniform(-4, 4, (b, args.max_gt, 2))
    batch = {
        "features": jnp.asarray(feats),
        "world2pixel": jnp.asarray(w2p),
        "origin_shift": jnp.asarray(shift),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_labels": jnp.asarray(rng.integers(
            0, cfg.num_classes, (b, args.max_gt)).astype(np.int32)),
        "gt_valid": jnp.asarray(rng.uniform(size=(b, args.max_gt)) < 0.6),
        "occ_dense": jnp.asarray(rng.integers(
            0, cfg.occupancy_classes + 1,
            (b, cfg.voxel_num)).astype(np.int32)),
    }
    params = model.init(jax.random.PRNGKey(0), feats[:1], w2p[:1],
                        shift[:1])
    tc = TrainConfig(warmup_steps=10, total_steps=1000)
    state0 = create_train_state(model, params, tc)
    step = make_train_step(cfg, tc, donate=False)
    tx = optax.chain(optax.clip_by_global_norm(tc.grad_clip_norm),
                     optax.adamw(tc.learning_rate,
                                 weight_decay=tc.weight_decay))
    opt0 = tx.init(state0.params)

    def loss_fn(params, rng):
        outs = model.apply(params, batch["features"],
                           batch["world2pixel"], batch["origin_shift"],
                           deterministic=False, rngs={"dropout": rng})
        loss_dict = compute_losses(cfg, outs, batch, matcher=tc.matcher)
        return sum(loss_dict.values()), loss_dict

    def make(mode, n):
        if mode == "grad":
            @jax.jit
            def fn(state, opt):
                def body(carry, i):
                    (loss, _), g = jax.value_and_grad(
                        loss_fn, has_aux=True)(
                            state.params, jax.random.fold_in(
                                jax.random.PRNGKey(0), i))
                    return carry + loss + optax_global_norm(g), ()
                out, _ = jax.lax.scan(body, jnp.float32(0.0),
                                      jnp.arange(n))
                return out
        elif mode in ("grad_opt", "grad_opt_sched"):
            # grad_opt: constant-lr chain; grad_opt_sched: the EXACT
            # shipped tx (schedule + clip) applied functionally — the
            # difference between them prices the lr schedule, and
            # step_nogn - grad_opt_sched prices TrainState mechanics.
            the_tx = tx if mode == "grad_opt" else state0.tx
            the_opt = (tx.init(state0.params) if mode == "grad_opt"
                       else state0.opt_state)

            @jax.jit
            def fn(state, opt):
                def body(carry, i):
                    params, opt_state, acc = carry
                    (loss, _), g = jax.value_and_grad(
                        loss_fn, has_aux=True)(
                            params, jax.random.fold_in(
                                jax.random.PRNGKey(0), i))
                    upd, opt_state = the_tx.update(g, opt_state, params)
                    params = optax.apply_updates(params, upd)
                    return (params, opt_state, acc + loss), ()
                (pp, oo, out), _ = jax.lax.scan(
                    body, (state.params, the_opt, jnp.float32(0.0)),
                    jnp.arange(n))
                return out + optax_global_norm(pp) * 0
        elif mode == "step_tuple":
            # FULL shipped step semantics (schedule tx + step counter +
            # grad_norm metric) but with a plain-tuple scan carry instead
            # of the flax TrainState struct: isolates whether the
            # step_nogn-vs-grad_opt delta is a carry-structure artifact
            @jax.jit
            def fn(state, opt):
                def body(carry, i):
                    params, opt_state, stepc, acc = carry
                    (loss, _), g = jax.value_and_grad(
                        loss_fn, has_aux=True)(
                            params, jax.random.fold_in(
                                jax.random.PRNGKey(0), i))
                    upd, opt_state = state0.tx.update(g, opt_state,
                                                      params)
                    params = optax.apply_updates(params, upd)
                    acc = acc + loss + optax_global_norm(g)
                    return (params, opt_state, stepc + 1, acc), ()
                (pp, oo, sc, out), _ = jax.lax.scan(
                    body, (state.params, state.opt_state,
                           jnp.int32(0), jnp.float32(0.0)),
                    jnp.arange(n))
                return out
        elif mode == "step_nogn":
            @jax.jit
            def fn(state, opt):
                def body(carry, i):
                    st, _ = carry
                    (loss, _), g = jax.value_and_grad(
                        loss_fn, has_aux=True)(
                            st.params, jax.random.fold_in(
                                jax.random.PRNGKey(0), i))
                    st2 = st.apply_gradients(grads=g)
                    return (st2, loss), ()
                (st, loss), _ = jax.lax.scan(
                    body, (state, jnp.float32(0.0)), jnp.arange(n))
                return loss
        else:  # step — the shipped make_train_step body
            @jax.jit
            def fn(state, opt):
                def body(carry, i):
                    st, _ = carry
                    st2, metrics = step(st, batch,
                                        jax.random.fold_in(
                                            jax.random.PRNGKey(0), i))
                    return (st2,
                            metrics["loss"].astype(jnp.float32)), ()
                (st, loss), _ = jax.lax.scan(
                    body, (state, jnp.float32(0.0)), jnp.arange(n))
                return loss
        return fn

    out = {"cams": args.cams, "batch": b, "unit": "ms/step"}
    for mode in args.modes.split(","):
        dt = scan_diff_time(lambda n: make(mode, n), (state0, opt0),
                            args.iters, base_len=1)
        out[mode] = round(dt * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
