#!/usr/bin/env python
"""TPU perf breakdown: times the VER forward in pieces and per
deformable-sampling implementation.  Uses the persistent compile cache and
scalar-fetch timing (the axon backend doesn't block in block_until_ready).

Usage: python tools/profile_tpu.py [--cams 36] [--batch 1] [--iters 5]
       [--parts full,bev,occ] [--impls onehot,gather,pallas]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = float(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(out)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cams", type=int, default=36)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--parts", default="bev,full")
    p.add_argument("--impls", default="onehot")
    args = p.parse_args()

    # platform re-assert + persistent compile cache, from the ONE owner
    # of the recipe (utils.platform -> utils.bench)
    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from vln_ver_tpu.models import VERConfig, VoxelFormer
    from __graft_entry__ import _example_inputs

    results = {}
    for impl in args.impls.split(","):
        cfg = VERConfig(num_cams=args.cams, dtype=jnp.bfloat16,
                        deform_impl=impl)
        model = VoxelFormer(cfg)
        feats, w2p, shift = _example_inputs(cfg, batch=args.batch)
        params = model.init(jax.random.PRNGKey(0), feats[:1], w2p[:1],
                            shift[:1])

        for part in args.parts.split(","):
            only_bev = part == "bev"

            @jax.jit
            def fwd(params, feats, w2p, shift, _only_bev=only_bev):
                outs = model.apply(params, feats, w2p, shift,
                                   deterministic=True, only_bev=_only_bev)
                if _only_bev:
                    return jnp.sum(outs["bev_embed"].astype(jnp.float32))
                return (jnp.sum(outs["bev_embed"].astype(jnp.float32))
                        + jnp.sum(
                            outs["occupancy_preds"].astype(jnp.float32)))

            t = timed(fwd, params, feats, w2p, shift, iters=args.iters)
            key = f"{impl}/{part}"
            results[key] = round(t * 1000, 2)
            print(json.dumps({key: results[key]}), flush=True)

    print("SUMMARY " + json.dumps(results))


if __name__ == "__main__":
    main()
