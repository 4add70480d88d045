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


def _run_e2e(args, cfg, model, params, tc):
    """The REAL train loop (tools/train.py's recipe) on an on-disk
    synthetic dataset, measured end to end, with attribution:

    * ``loader``      — prefetching HDF5 reads + collate only (host);
    * ``serial``      — loader + inline host->device transfer + donated
                        step, transfer on the MAIN thread (the loop shape
                        before round 5);
    * ``overlapped``  — the shipping loop: transfer staged one batch
                        ahead on a thread (train.feed.staged_batches).

    Timing is device-honest on the axon tunnel: per-step metrics are
    never fetched inside the timed window; one scalar fetch at the end
    syncs the whole dependency chain (state_k depends on every step).
    """
    import time

    import jax

    from vln_ver_tpu.data import MP3DDataset, make_synthetic_dataset
    from vln_ver_tpu.data.mp3d import iterate_batches
    from vln_ver_tpu.parallel import make_mesh, replicate, shard_batch
    from vln_ver_tpu.train import (create_train_state, make_train_step,
                                   staged_batches)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tag = (f"train_c{cfg.num_cams}_f{cfg.feat_h}x{cfg.in_channels}"
           f"_o{cfg.occ_zdim}x{cfg.occ_ydim}x{cfg.occ_xdim}"
           f"_n{args.volumes}")
    root = os.path.join(here, ".bench_data", tag)
    ann = os.path.join(root, "mp3d_trainval.pkl")
    if not os.path.exists(ann):
        os.makedirs(root, exist_ok=True)
        ann = make_synthetic_dataset(
            root, num_scans=1, viewpoints_per_scan=args.volumes,
            num_cams=cfg.num_cams, feat_hw=cfg.feat_h,
            feat_dim=cfg.in_channels,
            occ_dims=(cfg.occ_zdim, cfg.occ_ydim, cfg.occ_xdim),
            pc_range=cfg.pc_range)
    dataset = MP3DDataset(ann, root, voxel_num=cfg.voxel_num,
                          occupancy_classes=cfg.occupancy_classes,
                          num_cams=cfg.num_cams, feat_hw=cfg.feat_h,
                          max_gt=args.max_gt)

    b = args.batch
    mesh = make_mesh((1, 1))
    state = replicate(mesh, create_train_state(model, params, tc))
    step_fn = make_train_step(cfg, tc, donate=True)

    def batches(n):
        """n train batches in the loop's epoch order (wrapping)."""
        done = 0
        epoch = 0
        while done < n:
            import numpy as np
            order = np.random.default_rng(epoch).permutation(len(dataset))
            for batch in iterate_batches(dataset, b, indices=order,
                                         drop_last=True):
                if done == n:
                    return
                done += 1
                yield batch
            epoch += 1

    import jax.numpy as jnp
    import numpy as np
    upload_cast = (jnp.dtype(cfg.dtype)
                   if jnp.dtype(cfg.dtype).itemsize < 4 else None)

    def place(batch):
        # tools/train.py's exact placement: bf16 pre-cast upload
        # (bit-identical — the encoder's first touch is this cast) +
        # sharded device_put
        batch.pop("token", None)
        if upload_cast is not None:
            batch["features"] = np.asarray(
                batch["features"]).astype(upload_cast)
        return shard_batch(mesh, batch)

    def timed_loop(n, overlap):
        nonlocal state
        rng = jax.random.PRNGKey(0)
        it = (staged_batches(batches(n), place) if overlap
              else (place(x) for x in batches(n)))
        t0 = time.perf_counter()
        metrics = None
        with mesh:
            for i, sharded in enumerate(it):
                state, metrics = step_fn(state, sharded,
                                         jax.random.fold_in(rng, i))
        loss = float(metrics["loss"])   # syncs the whole chain
        return n / (time.perf_counter() - t0), loss

    # warm: compile + page-cache the dataset files (untimed)
    rate, loss = timed_loop(2, overlap=True)
    assert loss == loss, "NaN loss in e2e bench"

    t0 = time.perf_counter()
    for _ in batches(args.steps):
        pass
    loader_rate = args.steps / (time.perf_counter() - t0)

    serial_rate, _ = timed_loop(args.steps, overlap=False)
    overlap_rate, _ = timed_loop(args.steps, overlap=True)

    print(json.dumps({
        "metric": "train_e2e_steps_per_sec",
        "value": round(overlap_rate, 4),
        "unit": "steps/s",
        "samples_per_sec": round(overlap_rate * b, 3),
        "serial_steps_per_sec": round(serial_rate, 4),
        "loader_batches_per_sec": round(loader_rate, 4),
        "overlap_speedup": round(overlap_rate / serial_rate, 3),
        "batch": b, "cams": args.cams, "steps": args.steps,
        "upload": str(upload_cast) if upload_cast else "float32",
    }))


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
    p.add_argument("--e2e", action="store_true",
                   help="measure the REAL training loop instead of the "
                        "scanned step: prefetching HDF5 reads -> collate "
                        "-> host->device transfer -> donated step on an "
                        "on-disk synthetic dataset, with loader / "
                        "transfer / overlap attribution (the loop "
                        "tools/train.py runs; reference 4-worker "
                        "DataLoader recipe, datasets/builder.py:19)")
    p.add_argument("--steps", type=int, default=12,
                   help="--e2e: timed steps per measurement")
    p.add_argument("--volumes", type=int, default=16,
                   help="--e2e: on-disk dataset size (viewpoints)")
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

    if args.e2e:
        _run_e2e(args, cfg, model, params, tc)
        return

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
