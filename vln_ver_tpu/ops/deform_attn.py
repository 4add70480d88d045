"""Multi-scale deformable attention — pure-XLA reference implementations.

These functions define the exact semantics of the reference's two native
sampling paths and serve as the correctness oracle for the Pallas kernels:

* 2D: mmcv's CUDA ``ms_deform_attn_forward`` / its pure-PyTorch fallback
  ``multi_scale_deformable_attn_pytorch`` (used by the encoder's spatial
  cross-attention, reference spatial_cross_attention.py:387-398).
* 3D: ``voxel_multi_scale_deformable_attn_pytorch``
  (voxel_temporal_self_attention.py:275-335), used by the DETR decoder's
  3D cross-attention over the voxel grid.

Both operate on static shapes; ``spatial_shapes`` is a Python tuple of
per-level shapes so levels unroll at trace time.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .sampling import bilinear_sample_2d, trilinear_sample_3d


def ms_deform_attn_2d_onehot(value: jnp.ndarray,
                             spatial_shapes: Sequence[Tuple[int, int]],
                             sampling_locations: jnp.ndarray,
                             attention_weights: jnp.ndarray) -> jnp.ndarray:
    """MXU formulation of 2D deformable attention.

    TPUs hate gathers; bilinear sampling of P points per query is instead
    expressed as a dense (num_query, H*W) interpolation matrix applied with
    a matmul: the one-hot of an out-of-range tap index is all-zeros, so
    grid_sample's zero padding emerges naturally.  Per (batch, head, level):

        A[q, y*W+x] = sum_p w[q,p] * Y_p[q,y] * X_p[q,x]
        out = A @ V                                  (MXU)

    Semantics identical to :func:`ms_deform_attn_2d` (the gather oracle).
    """
    bs, _, num_heads, head_dim = value.shape
    _, num_query = sampling_locations.shape[:2]
    num_points = sampling_locations.shape[4]
    starts = []
    s = 0
    for (h, w) in spatial_shapes:
        starts.append(s)
        s += h * w

    out = jnp.zeros((bs, num_query, num_heads, head_dim), value.dtype)
    for lvl, (h, w) in enumerate(spatial_shapes):
        vl = value[:, starts[lvl]:starts[lvl] + h * w]      # (bs, hw, H, d)
        vl = vl.transpose(0, 2, 1, 3)                        # (bs, H, hw, d)
        loc = sampling_locations[:, :, :, lvl]               # (bs,nq,H,P,2)
        px = loc[..., 0] * w - 0.5
        py = loc[..., 1] * h - 0.5
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        ax = (px - x0)[..., None]
        ay = (py - y0)[..., None]
        ix = jnp.arange(w, dtype=px.dtype)
        iy = jnp.arange(h, dtype=py.dtype)
        # one-hot tap rows; out-of-range indices give all-zero rows = padding
        X = ((ix == x0[..., None]) * (1 - ax)
             + (ix == x0[..., None] + 1) * ax)               # (bs,nq,H,P,w)
        Y = ((iy == y0[..., None]) * (1 - ay)
             + (iy == y0[..., None] + 1) * ay)               # (bs,nq,H,P,h)
        wgt = attention_weights[:, :, :, lvl]                # (bs,nq,H,P)
        # A[b,q,H,y,x] = sum_p w * Y * X  -> then contract (y,x) with V.
        # Interpolation matrices follow the value dtype (bf16 halves the
        # dominant A-matrix bandwidth; coefficient rounding ~0.4% == a
        # few-millipixel sampling perturbation).
        cdt = value.dtype
        # fp32 inputs must request HIGHEST precision — the TPU MXU's
        # default fast path multiplies fp32 operands in bf16 (~1e-2 error,
        # measured on hardware); bf16 inputs are single-pass either way
        prec = (jax.lax.Precision.HIGHEST if cdt == jnp.float32
                else jax.lax.Precision.DEFAULT)
        # Per-point fused accumulation: a 3-operand einsum over p lowers to
        # ~1M tiny (y,p)@(p,x) matmuls on TPU (24 ms at full encoder shape
        # vs 7.3 ms for this loop, tools/probe_deform.py) — the unrolled
        # outer-product sum fuses elementwise instead.  A stays in the
        # (b, q, h, s) layout end-to-end: the matmul batches (b, h)
        # directly and the output needs no transposes.  NOTE: the s-space
        # int-compare chain ('compare_s') wins standalone (6.0 vs 7.1
        # ms/call, tools/probe_deform.py) but LOSES inside the full model
        # (bench 83.3 vs 87.4 vol/s, measured twice) — in-model fusion
        # context differs; keep this formulation.
        wy = (wgt[..., None] * Y).astype(cdt)            # (bs,nq,H,P,y)
        Xc = X.astype(cdt)
        A = sum(wy[..., p, :, None] * Xc[..., p, None, :]
                for p in range(num_points))              # (bs,nq,H,y,x)
        A = A.reshape(bs, num_query, num_heads, h * w)
        # fp32 accumulation on the MXU; XLA:CPU's DotThunk rejects
        # bf16 x bf16 = f32 for this batched layout (and accumulates bf16
        # dots in fp32 internally anyway), so only request it off-CPU
        pref = (jnp.float32 if jax.default_backend() != "cpu" else None)
        out = out + jnp.einsum("bqhs,bhsd->bqhd", A, vl.astype(cdt),
                               precision=prec,
                               preferred_element_type=pref
                               ).astype(value.dtype)
    return out.reshape(bs, num_query, num_heads * head_dim)


def ms_deform_attn_2d(value: jnp.ndarray,
                      spatial_shapes: Sequence[Tuple[int, int]],
                      sampling_locations: jnp.ndarray,
                      attention_weights: jnp.ndarray) -> jnp.ndarray:
    """2D multi-scale deformable attention.

    Args:
      value: ``(bs, num_value, num_heads, head_dim)`` where ``num_value`` is
        the concatenation of all level feature maps flattened row-major
        (h, w).
      spatial_shapes: static per-level ``(h, w)``.
      sampling_locations: ``(bs, num_query, num_heads, num_levels,
        num_points, 2)`` — (x, y) in [0, 1].
      attention_weights: ``(bs, num_query, num_heads, num_levels,
        num_points)`` (already softmaxed over levels*points).

    Returns:
      ``(bs, num_query, num_heads * head_dim)``.
    """
    bs, _, num_heads, head_dim = value.shape
    _, num_query = sampling_locations.shape[:2]
    starts = []
    s = 0
    for (h, w) in spatial_shapes:
        starts.append(s)
        s += h * w
    assert s == value.shape[1], (s, value.shape)

    out = jnp.zeros((bs, num_heads, num_query, head_dim),
                    dtype=value.dtype)
    for lvl, (h, w) in enumerate(spatial_shapes):
        vl = value[:, starts[lvl]:starts[lvl] + h * w]           # (bs, hw, H, d)
        vl = vl.transpose(0, 2, 1, 3).reshape(bs, num_heads, h, w, head_dim)
        loc = sampling_locations[:, :, :, lvl]                    # (bs, nq, H, P, 2)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        # -> (bs, H, nq*P)
        x = x.transpose(0, 2, 1, 3).reshape(bs, num_heads, -1)
        y = y.transpose(0, 2, 1, 3).reshape(bs, num_heads, -1)
        sampled = bilinear_sample_2d(vl, x, y)                    # (bs, H, nq*P, d)
        sampled = sampled.reshape(bs, num_heads, num_query, -1, head_dim)
        wgt = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)  # (bs,H,nq,P)
        out = out + jnp.sum(sampled * wgt[..., None], axis=-2)
    return out.transpose(0, 2, 1, 3).reshape(bs, num_query,
                                             num_heads * head_dim)


def voxel_deform_attn_3d_onehot(value: jnp.ndarray,
                                spatial_shapes: Sequence[Tuple[int, int,
                                                               int]],
                                sampling_locations: jnp.ndarray,
                                attention_weights: jnp.ndarray
                                ) -> jnp.ndarray:
    """MXU formulation of 3D deformable attention (trilinear taps).

    Same contract as :func:`voxel_deform_attn_3d` (the gather oracle).
    The decoder's cross-attention was 97.6% of its cost at the production
    shape (tools/probe_decoder.py, b8: 10.31 of 10.56 ms) because
    take_along_axis lowers to XLA gathers — poison on TPU.  As in the 2D
    one-hot path, the trilinear taps become a dense per-(batch, head)
    interpolation matrix applied with one matmul:

        A[q, (z*H + y)*W + x] = sum_p w[q,p] * Z_p[q,z] * Y_p[q,y] * X_p[q,x]
        out = A @ V                                          (MXU)

    One-hot rows of out-of-range taps are all-zero, so grid_sample's zero
    padding emerges naturally.  The per-point accumulation is an unrolled
    fused elementwise outer product (an einsum over p lowers to tiny
    matmuls — see ms_deform_attn_2d_onehot's note).
    """
    bs, _, num_heads, head_dim = value.shape
    _, num_query = sampling_locations.shape[:2]
    num_points = sampling_locations.shape[4]
    starts = []
    s = 0
    for (d, h, w) in spatial_shapes:
        starts.append(s)
        s += d * h * w
    assert s == value.shape[1], (s, value.shape)

    out = jnp.zeros((bs, num_query, num_heads, head_dim), value.dtype)
    for lvl, (d, h, w) in enumerate(spatial_shapes):
        vl = value[:, starts[lvl]:starts[lvl] + d * h * w]
        vl = vl.transpose(0, 2, 1, 3)                   # (bs, H, dhw, hd)
        loc = sampling_locations[:, :, :, lvl]          # (bs,nq,H,P,3)
        px = loc[..., 0] * w - 0.5
        py = loc[..., 1] * h - 0.5
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        ax = (px - x0)[..., None]
        ay = (py - y0)[..., None]
        ix = jnp.arange(w, dtype=px.dtype)
        iy = jnp.arange(h, dtype=py.dtype)
        X = ((ix == x0[..., None]) * (1 - ax)
             + (ix == x0[..., None] + 1) * ax)          # (bs,nq,H,P,w)
        Y = ((iy == y0[..., None]) * (1 - ay)
             + (iy == y0[..., None] + 1) * ay)          # (bs,nq,H,P,h)
        if d == 1:
            # depth-1 level == the decoder_on_bev 2D semantics: full
            # weight on the single z plane, exactly like the gather
            # oracle's bilinear special case — a trilinear tap here
            # would attenuate by a z-dependent 0.5-1.0 factor and leak
            # z gradients through a grid with no z extent
            Z = jnp.ones(px.shape + (1,), px.dtype)     # (bs,nq,H,P,1)
        else:
            pz = loc[..., 2] * d - 0.5
            z0 = jnp.floor(pz)
            az = (pz - z0)[..., None]
            iz = jnp.arange(d, dtype=pz.dtype)
            Z = ((iz == z0[..., None]) * (1 - az)
                 + (iz == z0[..., None] + 1) * az)      # (bs,nq,H,P,d)
        wgt = attention_weights[:, :, :, lvl]           # (bs,nq,H,P)
        cdt = value.dtype
        prec = (jax.lax.Precision.HIGHEST if cdt == jnp.float32
                else jax.lax.Precision.DEFAULT)
        wz = (wgt[..., None] * Z).astype(cdt)           # (bs,nq,H,P,d)
        Yc = Y.astype(cdt)
        Xc = X.astype(cdt)
        A = sum((wz[..., p, :, None, None]
                 * Yc[..., p, None, :, None]
                 * Xc[..., p, None, None, :])
                for p in range(num_points))             # (bs,nq,H,d,h,w)
        A = A.reshape(bs, num_query, num_heads, d * h * w)
        pref = (jnp.float32 if jax.default_backend() != "cpu" else None)
        out = out + jnp.einsum("bqhs,bhsd->bqhd", A, vl.astype(cdt),
                               precision=prec,
                               preferred_element_type=pref
                               ).astype(value.dtype)
    return out.reshape(bs, num_query, num_heads * head_dim)


def voxel_deform_attn_3d(value: jnp.ndarray,
                         spatial_shapes: Sequence[Tuple[int, int, int]],
                         sampling_locations: jnp.ndarray,
                         attention_weights: jnp.ndarray) -> jnp.ndarray:
    """3D deformable attention over a voxel grid (trilinear taps).

    Args:
      value: ``(bs, num_value, num_heads, head_dim)``, levels concatenated,
        each flattened (d, h, w) row-major.
      spatial_shapes: static per-level ``(d, h, w)``.
      sampling_locations: ``(bs, num_query, num_heads, num_levels,
        num_points, 3)`` — (x, y, z) in [0, 1].
      attention_weights: ``(bs, num_query, num_heads, num_levels,
        num_points)``.

    Returns:
      ``(bs, num_query, num_heads * head_dim)``.
    """
    bs, _, num_heads, head_dim = value.shape
    _, num_query = sampling_locations.shape[:2]
    starts = []
    s = 0
    for (d, h, w) in spatial_shapes:
        starts.append(s)
        s += d * h * w
    assert s == value.shape[1], (s, value.shape)

    out = jnp.zeros((bs, num_heads, num_query, head_dim), dtype=value.dtype)
    for lvl, (d, h, w) in enumerate(spatial_shapes):
        vl = value[:, starts[lvl]:starts[lvl] + d * h * w]
        vl = vl.transpose(0, 2, 1, 3).reshape(bs, num_heads, d, h, w,
                                              head_dim)
        loc = sampling_locations[:, :, :, lvl]                    # (bs,nq,H,P,3)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x = x.transpose(0, 2, 1, 3).reshape(bs, num_heads, -1)
        y = y.transpose(0, 2, 1, 3).reshape(bs, num_heads, -1)
        if d == 1:
            # depth-1 grid == the decoder_on_bev path: the reference
            # samples this 2D (voxel_transformer.py:263-285 feeds
            # [[bev_h, bev_w]] to 2D deform attn).  Bilinear taps keep
            # exact reference semantics — a trilinear tap here would
            # attenuate by a z-dependent 0.5-1.0 factor and leak z
            # gradients through a grid with no z extent.
            sampled = bilinear_sample_2d(vl[:, :, 0], x, y)
        else:
            z = loc[..., 2] * d - 0.5
            z = z.transpose(0, 2, 1, 3).reshape(bs, num_heads, -1)
            sampled = trilinear_sample_3d(vl, x, y, z)
        sampled = sampled.reshape(bs, num_heads, num_query, -1, head_dim)
        wgt = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)
        out = out + jnp.sum(sampled * wgt[..., None], axis=-2)
    return out.transpose(0, 2, 1, 3).reshape(bs, num_query,
                                             num_heads * head_dim)
