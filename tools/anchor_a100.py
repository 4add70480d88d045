#!/usr/bin/env python
"""A100 anchor for the north-star ratio (>=5x A100 on 36-view VER lift).

No GPU exists in this environment, so the reference's A100 throughput is
bounded three ways (written up in docs/performance.md):

1. same-host software ratio — this tool: the torch oracle of the reference
   active path (tests/oracle_voxelformer.py — exact module tree, eager
   fp32, the reference's execution model) vs our jitted JAX forward, same
   CPU core, identical model dimensions and inputs;
2. an analytic FLOP count of the 36-view forward (printed here) against
   A100 peak at published MFU ranges for batch-1 eager detection stacks;
3. published BEVFormer-family GPU FPS (the reference's lineage).

Usage: python tools/anchor_a100.py [--iters 3] [--cams 36]
Prints one JSON line with both timings and the FLOP count.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

from vln_ver_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def forward_flops(cfg, num_cams: int) -> float:
    """Dense-matmul FLOPs of one 36-view VER volume (batch 1).

    Counts the MXU-relevant work (linear layers, attention matmuls, occ
    proj/MLP, upsampler convs); the reference's CUDA deform-sampling
    gathers contribute no dense FLOPs.  2 FLOPs per MAC.
    """
    C = cfg.embed_dims
    nq = cfg.bev_h * cfg.bev_w * cfg.bev_z          # encoder voxel queries
    hw = cfg.feat_h * cfg.feat_w
    f = 0.0
    # encoder: per layer — value proj per cam + output proj + offsets/attn
    # (query-only) + FFN over the voxel queries
    per_layer = (num_cams * hw * C * C * 2            # value proj
                 + nq * C * C * 2                      # output proj
                 + nq * C * (cfg.num_heads * cfg.sca_num_points * 3) * 2
                 + nq * C * cfg.ffn_dim * 2 * 2)       # FFN in+out
    f += cfg.encoder_layers * per_layer
    # decoder: 6 layers over num_query object queries (self-attn + 3D CA
    # + FFN + branches)
    dq = cfg.num_query
    f += cfg.decoder_layers * (
        dq * C * C * 2 * 4                             # self-attn qkv+out
        + dq * C * C * 2 * 2                           # CA proj in/out
        + dq * C * cfg.ffn_dim * 2 * 2)
    # refined occupancy grid (vocc.py: 120 x 120 x 35 @ 0.1 m)
    occ_h = round((cfg.pc_range[4] - cfg.pc_range[1])
                  / cfg.occupancy_size[1])
    occ_w = round((cfg.pc_range[3] - cfg.pc_range[0])
                  / cfg.occupancy_size[0])
    occ_z = round((cfg.pc_range[5] - cfg.pc_range[2])
                  / cfg.occupancy_size[2])
    # occ_proj (head:557-566): 4*C -> occ_dims*occ_z over the refined
    # (h, w) cells; then the occ MLP over all voxels
    f += (occ_h * occ_w) * (4 * C) * (cfg.occ_dims * occ_z) * 2
    f += (occ_h * occ_w * occ_z) * (
        cfg.num_occ_fcs * cfg.occ_dims * cfg.occ_dims
        + cfg.occ_dims * cfg.occupancy_classes) * 2
    # upsampler deconvs: the reference runs 3 stages of
    # ConvTranspose3d(768, 768, kernel (3,5,5), stride (1,2,2))
    # (voxelformer_occupancy_head.py:254-258) — CONSTANT embed_dims
    # channels, 75 taps, z preserved (only (h, w) double per stage).
    # Transposed-conv MACs = in_vol * Cin * Cout * taps (each input
    # element feeds every tap); this dominates the whole forward.
    vol = cfg.bev_z * cfg.bev_h * cfg.bev_w
    for _ in range(3):
        f += vol * C * C * 75 * 2
        vol *= 4                                       # (h, w) each x2
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cams", type=int, default=36)
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument("--skip-jax", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import torch

    from vln_ver_tpu import geometry
    from vln_ver_tpu.models import VERConfig

    cfg = dataclasses.replace(VERConfig(), dropout_rate=0.0,
                              num_cams=args.cams)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal(
        (1, cfg.num_cams, cfg.feat_h, cfg.feat_w,
         cfg.in_channels)).astype(np.float32)
    w2p = np.stack([geometry.make_pinhole_world2pixel(
        90.0, deg, [0.0, -0.2, 1.2])
        for deg in np.linspace(0, 350, cfg.num_cams)])[None].astype(
            np.float32)
    shift = np.zeros((1, 3), np.float32)
    out = {"cams": args.cams,
           "flops_per_volume": forward_flops(cfg, args.cams)}

    if not args.skip_torch:
        from oracle_voxelformer import OracleVoxelFormer
        torch.manual_seed(0)
        oracle = OracleVoxelFormer(cfg)
        oracle.eval()
        tf = torch.from_numpy(feats[0].reshape(
            cfg.num_cams, 1, cfg.feat_h * cfg.feat_w, cfg.in_channels))
        tw = torch.from_numpy(w2p)
        ts = torch.from_numpy(shift)
        with torch.no_grad():
            oracle(tf, tw, ts)                        # warmup
            t0 = time.perf_counter()
            for _ in range(args.iters):
                oracle(tf, tw, ts)
            out["torch_cpu_s_per_volume"] = (
                (time.perf_counter() - t0) / args.iters)

    if not args.skip_jax:
        import jax

        # This leg is defined as a SAME-HOST CPU software ratio (torch
        # eager vs jitted JAX on one core).  The deployment env pins
        # JAX_PLATFORMS=axon, and on that remote backend block_until_ready
        # returns before completion — timing there would measure dispatch
        # RTT, not compute.  Force CPU before any backend use and fail
        # loudly if the pin won.
        jax.config.update("jax_platforms", "cpu")
        if jax.devices()[0].platform != "cpu":
            raise SystemExit(
                "anchor_a100: could not force the CPU backend "
                f"(got {jax.devices()[0].platform}); the software ratio "
                "is only meaningful on CPU — run with JAX_PLATFORMS=cpu "
                "in a fresh process")
        import jax.numpy as jnp

        from vln_ver_tpu.models import VoxelFormer
        from vln_ver_tpu.utils.bench import enable_compile_cache
        enable_compile_cache()
        model = VoxelFormer(cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                            jnp.asarray(w2p), jnp.asarray(shift),
                            deterministic=True)
        fwd = jax.jit(lambda p, f, w, s: model.apply(
            p, f, w, s, deterministic=True))
        r = fwd(params, jnp.asarray(feats), jnp.asarray(w2p),
                jnp.asarray(shift))
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = fwd(params, jnp.asarray(feats), jnp.asarray(w2p),
                    jnp.asarray(shift))
            jax.block_until_ready(r)
        out["jax_cpu_s_per_volume"] = (
            (time.perf_counter() - t0) / args.iters)

    if "torch_cpu_s_per_volume" in out and "jax_cpu_s_per_volume" in out:
        out["software_ratio"] = (out["torch_cpu_s_per_volume"]
                                 / out["jax_cpu_s_per_volume"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
