#!/usr/bin/env python
"""Device-honest per-part timing of the VER forward via scan differencing.

Times three nested slices of the forward — encoder lift (only_bev),
encoder+decoder (only_det), and the full det+occ model — each measured as
(t[2+N] - t[2]) / N over scanned iterations inside one jit, so tunnel RTT
and dispatch overhead cancel.  Differences between slices give the decoder
and occupancy-half costs.

Usage: python tools/profile_parts.py [--cams 36] [--batch 4] [--iters 8]
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
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--qcap", type=int, default=0,
                   help="sca_query_capacity (0 = dense lift)")
    args = p.parse_args()

    import jax

    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # honor JAX_PLATFORMS (sitecustomize pins axon) + compile cache
    import jax.numpy as jnp

    from vln_ver_tpu.models import VERConfig, VoxelFormer
    from __graft_entry__ import _example_inputs

    def scan_time(model, params, feats, w2p, shift, mode, n):
        @jax.jit
        def fn(params, feats, w2p, shift):
            def body(carry, _):
                f = feats + carry * jnp.bfloat16(0)
                if mode == "bev":
                    outs = model.apply(params, f, w2p, shift,
                                       deterministic=True, only_bev=True)
                    s = jnp.sum(outs["bev_embed"].astype(jnp.float32))
                else:
                    outs = model.apply(params, f, w2p, shift,
                                       deterministic=True)
                    s = jnp.sum(outs["bev_embed"].astype(jnp.float32))
                    if outs.get("occupancy_preds") is not None:
                        s += jnp.sum(
                            outs["occupancy_preds"].astype(jnp.float32))
                    if outs.get("all_cls_scores") is not None:
                        s += jnp.sum(
                            outs["all_cls_scores"].astype(jnp.float32))
                return s.astype(jnp.bfloat16), ()
            s, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=n)
            return s

        return fn

    results = {}
    for mode, cfg_kw in (("bev", {}),
                         ("det", dict(only_det=True)),
                         ("full", {})):
        cfg = VERConfig(num_cams=args.cams, dtype=jnp.bfloat16,
                        sca_query_capacity=args.qcap, **cfg_kw)
        model = VoxelFormer(cfg)
        feats, w2p, shift = _example_inputs(cfg, batch=args.batch)
        params = model.init(jax.random.PRNGKey(0), feats[:1], w2p[:1],
                            shift[:1])
        from functools import partial

        from vln_ver_tpu.utils.bench import scan_diff_time
        dt = scan_diff_time(
            partial(scan_time, model, params, feats, w2p, shift, mode),
            (params, feats, w2p, shift), args.iters)
        ms = dt * 1000
        results[mode] = round(ms, 2)
        print(json.dumps({mode: results[mode]}), flush=True)

    results["decoder_half"] = round(results["det"] - results["bev"], 2)
    results["occ_half"] = round(results["full"] - results["det"], 2)
    results["per_volume_ms"] = round(results["full"] / args.batch, 2)
    print("SUMMARY " + json.dumps(results))


if __name__ == "__main__":
    main()
