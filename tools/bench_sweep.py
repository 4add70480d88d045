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
        # EXACT bench.py program: the shared builder guarantees the same
        # jaxpr -> compile-cache hit (utils.bench.full_forward_scan)
        from vln_ver_tpu.utils.bench import full_forward_scan
        run_n = full_forward_scan(model)
        # init is batch-independent (feats[:1]) — once per qcap
        f1, w1, s1 = _example_inputs(cfg, batch=1)
        params = model.init(jax.random.PRNGKey(0), f1, w1, s1)
        for batch in (int(b) for b in args.batches.split(",")):
            feats, w2p, shift = _example_inputs(cfg, batch=batch)

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
