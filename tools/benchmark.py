#!/usr/bin/env python
"""FPS benchmark CLI — the reference tools/analysis_tools/benchmark.py
surface (:69-94), timed the remote-backend-honest way: iterations are
scanned inside one jitted program and two scan lengths are differenced,
min-of-3 fetches each (utils/bench.scan_diff_time) — the axon backend
doesn't block in block_until_ready and a single-sample difference swings
~20% through the tunnel RTT.

Usage:
  python tools/benchmark.py [configs/verformer/vocc.py] [--num-cams N]
      [--batch-size B] [--iters N] [--bf16]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default=None)
    p.add_argument("--num-cams", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--mode", choices=["full", "bev"], default="full")
    args = p.parse_args()

    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()

    import jax
    import jax.numpy as jnp

    from vln_ver_tpu.models import VERConfig, VoxelFormer
    from __graft_entry__ import _example_inputs

    if args.config:
        from vln_ver_tpu.config import build_ver_config, load_config
        overrides = {}
        if args.num_cams:
            overrides["num_cams"] = args.num_cams
        if args.bf16:
            overrides["dtype"] = jnp.bfloat16
        cfg = build_ver_config(load_config(args.config), **overrides)
    else:
        cfg = VERConfig(
            num_cams=args.num_cams or 6,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32)

    model = VoxelFormer(cfg)
    feats, w2p, shift = _example_inputs(cfg, batch=args.batch_size)
    params = model.init(jax.random.PRNGKey(0), feats[:1], w2p[:1],
                        shift[:1])

    only_bev = args.mode == "bev"

    # device-honest timing (the remote axon backend doesn't block in
    # block_until_ready): scan iters forwards inside one jit, serialized by
    # a data dependency, and difference two scan lengths to remove RTT
    def run_n(n):
        @jax.jit
        def fn(params, feats, w2p, shift):
            def body(carry, _):
                outs = model.apply(params, feats + carry * 0, w2p, shift,
                                   deterministic=True, only_bev=only_bev)
                # reduce over EVERY output the mode produces — a bench
                # only pays for what it consumes; summing bev+occ alone
                # let XLA DCE the whole DETR decoder (the exact bug
                # bench.py documents discovering)
                s = jnp.sum(outs["bev_embed"].astype(jnp.float32))
                if not only_bev:
                    s += jnp.sum(outs["occupancy_preds"].astype(
                        jnp.float32))
                    s += jnp.sum(outs["all_cls_scores"].astype(
                        jnp.float32))
                    s += jnp.sum(outs["all_bbox_preds"].astype(
                        jnp.float32))
                return s.astype(feats.dtype), ()
            s, _ = jax.lax.scan(body, jnp.zeros((), feats.dtype), None,
                                length=n)
            return s
        return fn

    # min-of-3 scan-differenced timing (utils/bench.scan_diff_time):
    # a single-sample difference swings ~20% through the tunnel RTT
    from vln_ver_tpu.utils.bench import scan_diff_time
    sec_per_iter = scan_diff_time(run_n, (params, feats, w2p, shift),
                                  iters=args.iters, warmup=args.warmup)
    fps = args.batch_size / sec_per_iter
    print(f"device={jax.devices()[0].platform} cams={cfg.num_cams} "
          f"batch={args.batch_size} mode={args.mode} "
          f"dtype={cfg.dtype.__name__ if hasattr(cfg.dtype, '__name__') else cfg.dtype}")
    print(f"throughput: {fps:.3f} samples/s "
          f"({sec_per_iter * 1000:.1f} ms/iter)")


if __name__ == "__main__":
    main()
