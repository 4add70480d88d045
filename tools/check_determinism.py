#!/usr/bin/env python
"""On-chip bitwise-determinism check of the VER forward.

Runs the full 36-view forward twice on the same inputs and compares
bit-level fingerprints of the outputs (occupancy logits + VER embedding),
computed ON DEVICE (the axon tunnel only returns scalars reliably): the
fingerprint XOR-folds the raw int32 bit patterns, so ANY single-bit
difference flips it.  Complements the CPU-side tools/compare_ver.py
bitwise VER comparison (SURVEY.md §7 hard part #3: deterministic
reduction order end-to-end).

Usage: python tools/check_determinism.py [--cams 36] [--batch 2] [--runs 3]
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
    p.add_argument("--runs", type=int, default=3)
    args = p.parse_args()

    import jax

    from vln_ver_tpu.utils.bench import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from __graft_entry__ import _example_inputs
    from vln_ver_tpu.models import VERConfig, VoxelFormer

    cfg = VERConfig(num_cams=args.cams, dtype=jnp.bfloat16)
    model = VoxelFormer(cfg)
    feats, w2p, shift = _example_inputs(cfg, batch=args.batch)
    params = model.init(jax.random.PRNGKey(0), feats[:1], w2p[:1],
                        shift[:1])

    def fingerprint(x):
        """XOR-fold the raw bit pattern into one int32 scalar."""
        bits = jax.lax.bitcast_convert_type(
            x.astype(jnp.float32), jnp.int32).reshape(-1)
        # xor-reduce via iterative fold (associative, order-independent)
        return jax.lax.reduce(bits, np.int32(0),
                              jax.lax.bitwise_xor, (0,))

    @jax.jit
    def run(params, feats, w2p, shift):
        outs = model.apply(params, feats, w2p, shift, deterministic=True)
        return (fingerprint(outs["bev_embed"]),
                fingerprint(outs["occupancy_preds"]),
                fingerprint(outs["all_bbox_preds"]))

    prints = []
    for r in range(args.runs):
        fp = tuple(int(v) for v in run(params, feats, w2p, shift))
        prints.append(fp)
        print(json.dumps({"run": r, "fingerprint": fp}), flush=True)
    ok = all(p == prints[0] for p in prints)
    print(json.dumps({"bitwise_deterministic": ok, "runs": args.runs}))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
