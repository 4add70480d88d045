#!/usr/bin/env python
"""Training-step throughput on one chip (scan-differenced, device-honest).

Scans the FULL jitted train step (forward + in-graph auction matching +
losses + backward + AdamW) over synthetic full-size inputs and reports
steps/s and samples/s — the training-side companion to bench.py
(reference recipe: 500 epochs, batch 1/GPU x 4 GPUs, vocc.py:221-284).

Usage: python tools/bench_train.py [--cams 36] [--batch 2] [--iters 4]
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
    p.add_argument("--cams", type=int, default=36)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--max-gt", type=int, default=16)
    p.add_argument("--remat", action="store_true",
                   help="rematerialize encoder layers in backward")
    p.add_argument("--qcap", type=int, default=0,
                   help="sca_query_capacity: capacity-bounded sparse "
                        "lift (0 = dense)")
    p.add_argument("--tiny", action="store_true",
                   help="shrunken model dims — CPU smoke test of the "
                        "modes, not a perf measurement")
    p.add_argument("--mode", default="step",
                   choices=["step", "grad", "fwd"],
                   help="step = forward+backward+AdamW (default); grad = "
                        "forward+backward only; fwd = losses only.  "
                        "Differencing the three isolates backward and "
                        "optimizer cost.")
    args = p.parse_args()

    import jax

    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # honor JAX_PLATFORMS (sitecustomize pins axon) + compile cache
    import jax.numpy as jnp

    from __graft_entry__ import _example_inputs
    from vln_ver_tpu.models import VERConfig, VoxelFormer
    from vln_ver_tpu.train import TrainConfig, create_train_state

    b = args.batch
    if args.tiny:
        cfg = VERConfig(num_cams=args.cams, dtype=jnp.bfloat16,
                        bev_z=2, bev_h=4, bev_w=4,
                        occupancy_size=(1.5, 1.5, 0.4375),
                        feat_h=4, feat_w=4,
                        embed_dims=32, in_channels=32, ffn_dim=64,
                        occ_dims=16, encoder_layers=1, decoder_layers=2,
                        num_query=12)
    else:
        cfg = VERConfig(num_cams=args.cams, dtype=jnp.bfloat16,
                        remat_encoder=args.remat,
                        sca_query_capacity=args.qcap)
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
        "gt_valid": jnp.asarray(
            rng.uniform(size=(b, args.max_gt)) < 0.6),
        "occ_dense": jnp.asarray(rng.integers(
            0, cfg.occupancy_classes + 1,
            (b, cfg.voxel_num)).astype(np.int32)),
    }
    params = model.init(jax.random.PRNGKey(0), feats[:1], w2p[:1],
                        shift[:1])
    tc = TrainConfig(warmup_steps=10, total_steps=1000)
    state0 = create_train_state(model, params, tc)

    from vln_ver_tpu.train.objective import compute_losses

    def loss_fn(params, batch, rng):
        outs = model.apply(params, batch["features"], batch["world2pixel"],
                           batch["origin_shift"], deterministic=False,
                           rngs={"dropout": rng})
        loss_dict = compute_losses(cfg, outs, batch, matcher=tc.matcher)
        return sum(loss_dict.values())

    def scan_steps(n):
        if args.mode == "step":
            # full step semantics (tx.update + apply_updates + step
            # counter + grad_norm metric) with a PLAIN-TUPLE scan carry:
            # carrying the flax TrainState struct makes XLA copy the
            # three 835 MB carry buffers (params, mu, nu) every
            # iteration instead of aliasing them — +10.6 ms/step of
            # phantom cost the real (donated, per-dispatch) train step
            # does not pay.  Measured in tools/probe_step_delta.py:
            # struct carry 117.5, tuple carry 107.4 ms at the vocc shape.
            import optax

            @jax.jit
            def fn(state, batch, rng):
                def body(carry, i):
                    params, opt_state, acc = carry
                    (loss, _), g = jax.value_and_grad(
                        lambda p: (loss_fn(p, batch,
                                           jax.random.fold_in(rng, i)),
                                   ()), has_aux=True)(params)
                    from vln_ver_tpu.train.step import optax_global_norm
                    gn = optax_global_norm(g)
                    upd, opt_state = state0.tx.update(g, opt_state,
                                                      params)
                    params = optax.apply_updates(params, upd)
                    return (params, opt_state,
                            acc + loss.astype(jnp.float32) + gn), ()
                (pp, oo, loss), _ = jax.lax.scan(
                    body, (state.params, state.opt_state,
                           jnp.float32(0.0)), jnp.arange(n))
                return loss
        elif args.mode == "grad":
            @jax.jit
            def fn(state, batch, rng):
                def body(carry, i):
                    loss, g = jax.value_and_grad(loss_fn)(
                        state.params, batch, jax.random.fold_in(rng, i))
                    gn = jnp.sqrt(sum(jnp.sum(jnp.square(x))
                                      for x in jax.tree.leaves(g)))
                    return carry + loss + gn, ()
                out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
                return out
        else:  # fwd
            @jax.jit
            def fn(state, batch, rng):
                def body(carry, i):
                    loss = loss_fn(state.params, batch,
                                   jax.random.fold_in(rng, i))
                    return carry + loss, ()
                out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
                return out
        return fn

    from vln_ver_tpu.utils.bench import scan_diff_time
    key = jax.random.PRNGKey(0)
    dt = scan_diff_time(scan_steps, (state0, batch, key), args.iters,
                        base_len=1)
    print(json.dumps({
        "metric": "train_step_seconds",
        "value": round(dt, 4),
        "unit": "s/step",
        "samples_per_sec": round(b / dt, 3),
        "batch": b, "cams": args.cams, "mode": args.mode,
    }))


if __name__ == "__main__":
    main()
