#!/usr/bin/env python
"""On-chip micro-probes of the deformable-sampling A-matrix construction.

Times (scan-differenced) the current 3-operand einsum against an
elementwise-accumulation variant and the pure A@V matmul, at the full
encoder shape (bs*cams=144, nq=900, heads=8, P=8, hw=196, hd=96).

Usage: python tools/probe_deform.py [--variants einsum,elemwise,matmul]
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
    p.add_argument("--variants", default="einsum,elemwise,matmul,fused,op")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--bs", type=int, default=144)
    args = p.parse_args()

    import jax

    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # honor JAX_PLATFORMS (sitecustomize pins axon) + compile cache
    import jax.numpy as jnp

    bs, nq, H, P, h, w, hd = args.bs, 900, 8, 8, 14, 14, 96
    cdt = jnp.bfloat16
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.random((bs, nq, H, P, w)), cdt)
    Y = jnp.asarray(rng.random((bs, nq, H, P, h)), cdt)
    W = jnp.asarray(rng.random((bs, nq, H, P)), cdt)
    V = jnp.asarray(rng.random((bs, H, h * w, hd)), cdt)
    A0 = jnp.asarray(rng.random((bs, H, nq, h * w)), cdt)
    LOC = jnp.asarray(rng.random((bs, nq, H, 1, P, 2)), jnp.float32)
    VAL = jnp.asarray(rng.random((bs, h * w, H, hd)), cdt)

    def make(variant, n):
        @jax.jit
        def fn(X, Y, W, V, A0):
            def body(carry, _):
                Xc = X + carry * jnp.bfloat16(0)
                if variant == "einsum":
                    A = jnp.einsum("bqhp,bqhpy,bqhpx->bhqyx", W, Y, Xc,
                                   preferred_element_type=jnp.float32
                                   ).astype(cdt)
                    A = A.reshape(bs, H, nq, h * w)
                    out = jnp.einsum("bhqs,bhsd->bhqd", A, V,
                                     preferred_element_type=jnp.float32)
                elif variant == "elemwise":
                    wy = (W[..., None] * Y).astype(cdt)   # (b,q,H,P,y)
                    A = jnp.sum(wy[..., :, None] * Xc[..., None, :],
                                axis=3)                    # (b,q,H,y,x)
                    A = A.transpose(0, 2, 1, 3, 4).reshape(bs, H, nq,
                                                           h * w)
                    out = jnp.einsum("bhqs,bhsd->bhqd", A.astype(cdt), V,
                                     preferred_element_type=jnp.float32)
                elif variant == "fused":
                    # per-point accumulation, no P axis materialised
                    acc = 0.0
                    for pp in range(P):
                        wy = (W[..., pp, None] * Y[..., pp, :]).astype(cdt)
                        acc = acc + (wy[..., :, None]
                                     * Xc[..., pp, None, :])
                    A = acc.transpose(0, 2, 1, 3, 4).reshape(bs, H, nq,
                                                             h * w)
                    out = jnp.einsum("bhqs,bhsd->bhqd", A.astype(cdt), V,
                                     preferred_element_type=jnp.float32)
                elif variant == "fusedT":
                    # transpose-free: A stays (b,q,h,s); dot_general
                    # batches (b,h) directly; output already (b,q,h,d)
                    acc = 0.0
                    for pp in range(P):
                        wy = (W[..., pp, None] * Y[..., pp, :]).astype(cdt)
                        acc = acc + (wy[..., :, None]
                                     * Xc[..., pp, None, :])
                    A = acc.reshape(bs, nq, H, h * w)
                    out = jnp.einsum("bqhs,bhsd->bqhd", A.astype(cdt), V,
                                     preferred_element_type=jnp.float32)
                elif variant == "elemwise_s":
                    # lane-friendly: build A directly on the flattened
                    # s=196 axis (minor dim 196 -> full VPU lanes; the
                    # (y,x)->(s) reshape of a broadcast is contiguous so
                    # XLA fuses it without materialising (…,P,196))
                    wy = (W[..., None] * Y).astype(cdt)   # (b,q,H,P,y)
                    wy_s = jnp.broadcast_to(
                        wy[..., :, None],
                        wy.shape + (w,)).reshape(wy.shape[:-1] + (h * w,))
                    x_s = jnp.broadcast_to(
                        Xc[..., None, :],
                        Xc.shape[:-1] + (h, w)).reshape(
                            Xc.shape[:-1] + (h * w,))
                    A = jnp.sum(wy_s * x_s, axis=3)        # (b,q,H,196)
                    out = jnp.einsum("bqhs,bhsd->bqhd", A.astype(cdt), V,
                                     preferred_element_type=jnp.float32)
                elif variant == "fused_s":
                    # per-point unrolled accumulation in the s layout
                    acc = 0.0
                    for pp in range(P):
                        wy = (W[..., pp, None] * Y[..., pp, :]).astype(cdt)
                        wy_s = jnp.broadcast_to(
                            wy[..., :, None],
                            wy.shape + (w,)).reshape(
                                wy.shape[:-1] + (h * w,))
                        x_s = jnp.broadcast_to(
                            Xc[..., pp, None, :],
                            Xc.shape[:2] + (H, h, w)).reshape(
                                Xc.shape[:2] + (H, h * w))
                        acc = acc + wy_s * x_s
                    out = jnp.einsum("bqhs,bhsd->bqhd", acc.astype(cdt), V,
                                     preferred_element_type=jnp.float32)
                elif variant == "compare_s":
                    # build A directly in s-space with 196-lane iota
                    # compares (no (y,x) intermediate, no broadcasts of
                    # sub-lane-width arrays); XLA fuses the 8-point chain
                    # into the single write of A
                    loc = LOC + carry.astype(jnp.float32) * 0
                    px = loc[..., 0, :, 0] * w - 0.5       # (b,nq,H,P)
                    py = loc[..., 0, :, 1] * h - 0.5
                    x0 = jnp.floor(px)
                    y0 = jnp.floor(py)
                    ax = px - x0
                    ay = py - y0
                    s = jnp.arange(h * w, dtype=jnp.int32)
                    sy = (s // w)[None, None, None]
                    sx = (s - (s // w) * w)[None, None, None]
                    x0i = x0.astype(jnp.int32)[..., None]
                    y0i = y0.astype(jnp.int32)[..., None]
                    axl = ax[..., None].astype(cdt)
                    ayl = ay[..., None].astype(cdt)
                    wl = W[..., None]
                    acc = 0.0
                    for pp in range(P):
                        xs = ((sx == x0i[..., pp, :]) * (1 - axl[..., pp, :])
                              + (sx == x0i[..., pp, :] + 1) * axl[..., pp, :])
                        ys = ((sy == y0i[..., pp, :]) * (1 - ayl[..., pp, :])
                              + (sy == y0i[..., pp, :] + 1) * ayl[..., pp, :])
                        acc = acc + wl[..., pp, :] * xs * ys
                    out = jnp.einsum("bqhs,bhsd->bqhd", acc.astype(cdt), V,
                                     preferred_element_type=jnp.float32)
                elif variant == "pallas":
                    from vln_ver_tpu.ops.pallas_deform import \
                        ms_deform_attn_2d_pallas
                    loc = LOC + carry.astype(jnp.float32) * 0
                    out = ms_deform_attn_2d_pallas(
                        VAL, ((h, w),), loc,
                        W.astype(jnp.float32).reshape(bs, nq, H, 1, P))
                elif variant == "pallas2":
                    from vln_ver_tpu.ops.pallas_deform import \
                        ms_deform_attn_2d_pallas_v2
                    loc = LOC + carry.astype(jnp.float32) * 0
                    out = ms_deform_attn_2d_pallas_v2(
                        VAL, ((h, w),), loc,
                        W.astype(jnp.float32).reshape(bs, nq, H, 1, P))
                elif variant == "op":
                    # the full production op incl. X/Y construction
                    from vln_ver_tpu.ops.deform_attn import \
                        ms_deform_attn_2d_onehot
                    loc = LOC + carry.astype(jnp.float32) * 0
                    out = ms_deform_attn_2d_onehot(
                        VAL, ((h, w),), loc,
                        W.astype(jnp.float32).reshape(bs, nq, H, 1, P))
                else:  # matmul: A@V only
                    A = A0 + carry.astype(cdt)
                    out = jnp.einsum("bhqs,bhsd->bhqd", A, V,
                                     preferred_element_type=jnp.float32)
                s = jnp.sum(out.astype(jnp.float32))
                return s.astype(jnp.bfloat16), ()
            s, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=n)
            return s
        return fn

    from functools import partial

    from vln_ver_tpu.utils.bench import scan_diff_time
    for variant in args.variants.split(","):
        dt = scan_diff_time(partial(make, variant), (X, Y, W, V, A0),
                            args.iters)
        print(json.dumps({variant: round(dt * 1000, 3)}), flush=True)


if __name__ == "__main__":
    main()
