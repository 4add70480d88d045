#!/usr/bin/env python
"""Occ-half roofline arithmetic from XLA's own cost model.

The occupancy half (bias-aware upsample + z-fused occ_proj + MLP,
models/head.py::_occupancy_refined_bias_aware) is ~60-70% of the
remaining per-volume time after the round-3 sparse lift.  This probe
closes (or re-opens) that axis with numbers instead of vibes: it lowers
the occ half ALONE — bev_embed in, flat logits out — and reads XLA's
``cost_analysis`` FLOP / bytes-accessed estimates, then converts the
measured per-volume time (pass ``--measured-ms``; 4.09 ms from
docs/performance.md's round-3 attribution) into sustained TFLOP/s and
GB/s against the chip's peaks (v5e: 197 bf16 TFLOP/s, ~819 GB/s HBM).

Whichever ratio is higher is the binding roofline; 1/ratio bounds any
further exact speedup.  Reference workload: the ConvTranspose3d stack +
occ_proj + MLP, voxelformer_occupancy_head.py:254-258, 557-580.

Usage: python tools/probe_occ_roofline.py [--batch 8] [--measured-ms 4.09]
       [--peak-tflops 197] [--peak-gbs 819]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--measured-ms", type=float, default=4.09,
                    help="measured occ-half ms PER VOLUME "
                         "(docs/performance.md attribution table)")
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--peak-gbs", type=float, default=819.0)
    args = ap.parse_args()

    # counts only — run the lowering on CPU so the probe needs no chip
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from vln_ver_tpu.models import VERConfig
    from vln_ver_tpu.models.head import VoxelFormerOccupancyHead

    cfg = VERConfig(num_cams=36, dtype=jnp.bfloat16)
    head = VoxelFormerOccupancyHead(cfg)
    b = args.batch
    bev = jnp.zeros((b, cfg.bev_num, cfg.embed_dims), jnp.bfloat16)

    def occ_half(params, bev_embed):
        return head.apply(
            params, bev_embed,
            method=lambda m, v: m._occupancy_refined_bias_aware(v))

    params = head.init(
        jax.random.PRNGKey(0), bev,
        method=lambda m, v: m._occupancy_refined_bias_aware(v))
    compiled = jax.jit(occ_half).lower(params, bev).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns [dict]
        costs = costs[0]
    flops = float(costs.get("flops", 0.0)) / b
    bytes_acc = float(costs.get("bytes accessed", 0.0)) / b

    sec = args.measured_ms / 1e3
    tflops = flops / sec / 1e12
    gbs = bytes_acc / sec / 1e9
    frac_mxu = tflops / args.peak_tflops
    frac_hbm = gbs / args.peak_gbs
    binding = "mxu" if frac_mxu >= frac_hbm else "hbm"
    print(json.dumps({
        "occ_flops_per_volume": flops,
        "occ_tflop_per_volume": round(flops / 1e12, 4),
        "occ_bytes_per_volume": bytes_acc,
        "measured_ms_per_volume": args.measured_ms,
        "sustained_tflops": round(tflops, 2),
        "sustained_gbs": round(gbs, 2),
        "frac_of_mxu_peak": round(frac_mxu, 4),
        "frac_of_hbm_peak": round(frac_hbm, 4),
        "binding_roofline": binding,
        "max_exact_speedup_remaining": round(
            1.0 / max(frac_mxu, frac_hbm), 2),
        "batch": b,
    }))


if __name__ == "__main__":
    main()
