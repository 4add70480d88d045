#!/usr/bin/env python
"""One-session bench sweep: dense vs sparse lift at batches 4 and 8.

VERDICT r3 weak #1: the flagship number moved 13% between sessions with
zero code change (148.0 builder-measured vs 167.4 driver-captured).
Within-session spread is <1% (bench.py now prints it), so cross-variant
comparisons are only honest when taken in ONE session — this tool runs
the whole grid in one process and prints a JSON table.

Usage: python tools/bench_sweep.py [--iters 8] [--repeats 5]
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
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--batches", default="8,4")
    p.add_argument("--qcaps", default="0,256,192",
                   help="0 = dense lift")
    args = p.parse_args()

    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from vln_ver_tpu.models import VERConfig, VoxelFormer
    from vln_ver_tpu.utils.bench import scan_diff_time_stats
    from __graft_entry__ import _example_inputs

    results = {}
    for qcap in (int(q) for q in args.qcaps.split(",")):
        cfg = VERConfig(num_cams=36, dtype=jnp.bfloat16,
                        sca_query_capacity=qcap)
        model = VoxelFormer(cfg)
        for batch in (int(b) for b in args.batches.split(",")):
            feats, w2p, shift = _example_inputs(cfg, batch=batch)
            params = model.init(jax.random.PRNGKey(0), feats[:1],
                                w2p[:1], shift[:1])

            # EXACT bench.py program (same jaxpr -> compile-cache hit)
            def run_n(n):
                @jax.jit
                def fn(params, feats, w2p, shift):
                    def body(carry, _):
                        f = feats + carry * jnp.bfloat16(0)
                        outs = model.apply(params, f, w2p, shift,
                                           deterministic=True)
                        # sum EVERY head output, matching bench.py — a
                        # bev+occ-only reduction lets XLA DCE the decoder
                        s = (jnp.sum(outs["bev_embed"].astype(jnp.float32))
                             + jnp.sum(outs["occupancy_preds"].astype(
                                 jnp.float32))
                             + jnp.sum(outs["all_cls_scores"].astype(
                                 jnp.float32))
                             + jnp.sum(outs["all_bbox_preds"].astype(
                                 jnp.float32)))
                        return s.astype(jnp.bfloat16), ()
                    s, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None,
                                        length=n)
                    return s
                return fn

            st = scan_diff_time_stats(run_n, (params, feats, w2p, shift),
                                      args.iters, warmup=3,
                                      repeats=args.repeats)
            key = f"{'dense' if qcap == 0 else f'K{qcap}'}_b{batch}"
            results[key] = {
                "volumes_per_sec": round(batch / st["sec_per_iter"], 2),
                "spread": round(st["spread"], 4),
            }
            print(json.dumps({key: results[key]}), flush=True)
    print("SUMMARY " + json.dumps(results))


if __name__ == "__main__":
    main()
