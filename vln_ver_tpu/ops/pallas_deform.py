"""Fused Pallas TPU kernel for single-level 2D deformable attention.

This is "kernel #1" of the TPU-native design (SURVEY.md §2.8): the
replacement for mmcv's ``ms_deform_attn`` CUDA kernel on the encoder's
spatial cross-attention path.

Formulation: gathers are poison on TPU, so bilinear sampling is expressed
as a per-(batch, head) dense interpolation matrix ``A (nq, H*W)`` built with
VPU compares against index iotas (out-of-range taps give all-zero one-hots
== grid_sample zero padding), folded with the attention weights over the P
sampling points, then applied to the value tile with one MXU matmul per
head:

    A[q, y*W+x] = sum_p w[q,p] * Y_p[q,y] * X_p[q,x]
    out[:, h*d:(h+1)*d] = A @ V_h                     # (nq,HW) @ (HW,d)

Everything for one batch element (6 cams fold into the batch axis upstream)
lives in VMEM: value 196x768, A 900x196, out 900x768 — ~4 MB.

Backward: a ``jax.custom_vjp`` whose bwd differentiates the math-identical
XLA one-hot formulation (:func:`..deform_attn.ms_deform_attn_2d_onehot`),
so training works without a hand-written scatter-add kernel.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .deform_attn import ms_deform_attn_2d_onehot


def _kernel(loc_ref, w_ref, value_ref, out_ref, *, H, W, num_heads,
            num_points, head_dim):
    """One grid step == one (batch element, query tile) pair — the grid
    is 2D (bs, nq_pad // tile) and the refs carry a leading block dim of
    1 with a TILED query axis (see _TQ; the v2 kernel docstring
    describes the tiled layout in full).

    loc_ref:   (1, nq, heads*P*2) fp32 normalized (x, y) pairs
    w_ref:     (1, nq, heads*P)   fp32 attention weights
    value_ref: (1, HW, heads*head_dim)
    out_ref:   (1, nq, heads*head_dim)
    """
    hw = H * W
    # int iota (fp iota is unsupported by the Mosaic TPU compiler)
    s = jax.lax.broadcasted_iota(jnp.int32, (1, hw), 1)
    sy = s // W                    # flat-index row coordinate
    sx = s - sy * W                # flat-index col coordinate

    vdt = value_ref.dtype
    for h in range(num_heads):
        acc = None
        for p in range(num_points):
            col = (h * num_points + p) * 2
            px = loc_ref[0, :, col:col + 1] * W - 0.5     # (nq, 1)
            py = loc_ref[0, :, col + 1:col + 2] * H - 0.5
            x0 = jnp.floor(px)
            y0 = jnp.floor(py)
            ax = px - x0
            ay = py - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)
            xs = ((sx == x0i) * (1.0 - ax) + (sx == x0i + 1) * ax)
            ys = ((sy == y0i) * (1.0 - ay) + (sy == y0i + 1) * ay)
            wgt = w_ref[0, :, h * num_points + p:h * num_points + p + 1]
            contrib = wgt * xs * ys
            acc = contrib if acc is None else acc + contrib
        v_h = value_ref[0, :, h * head_dim:(h + 1) * head_dim]
        if vdt == jnp.float32:
            # HIGHEST precision: the MXU's default fast path multiplies
            # fp32 in bf16 (~1e-2 error on fp32 inputs, measured on chip)
            out = jax.lax.dot(acc, v_h,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
        else:
            # bf16 values: single MXU pass, fp32 accumulation; the
            # interpolation matrix follows the value dtype (same policy
            # as the one-hot path)
            out = jax.lax.dot(acc.astype(vdt), v_h,
                              preferred_element_type=jnp.float32)
        out_ref[0, :, h * head_dim:(h + 1) * head_dim] = out.astype(
            out_ref.dtype)


def _kernel_v2(loc_ref, w_ref, value_ref, out_ref, *, H, W, num_heads,
               num_points, head_dim):
    """Lane-expansion variant: ~4 VPU passes per (head, point) over the
    (tq, H*W) tile instead of v1's ~13.

    v1 builds each one-hot factor with compares against a full (tq, H*W)
    iota — 10+ full-width passes per (head, point).  v2 instead builds the
    two tap rows in their natural narrow spaces ((tq, W) and (tq, H) —
    padded to one 128-lane tile, so 9x cheaper per pass) and expands to the
    flat s = y*W + x axis with layout ops:

        wy_s = repeat(w * Y_row, W)   # block-broadcast over x
        x_s  = concat([X_row] * H)    # tile over y
        A   += wy_s * x_s             # the only full-width passes

    The matmul A @ V_h per head is unchanged (MXU, fp32 accumulation).
    """
    hw = H * W
    vdt = value_ref.dtype
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, H), 1)
    for h in range(num_heads):
        acc = jnp.zeros((loc_ref.shape[1], hw), jnp.float32)
        for p in range(num_points):
            col = (h * num_points + p) * 2
            px = loc_ref[0, :, col:col + 1] * W - 0.5       # (tq, 1)
            py = loc_ref[0, :, col + 1:col + 2] * H - 0.5
            x0 = jnp.floor(px)
            y0 = jnp.floor(py)
            ax = px - x0
            ay = py - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)
            # narrow tap rows: (tq, W) / (tq, H) — one lane-tile each
            xrow = ((ix == x0i) * (1.0 - ax) + (ix == x0i + 1) * ax)
            wgt = w_ref[0, :, h * num_points + p:h * num_points + p + 1]
            yrow = wgt * ((iy == y0i) * (1.0 - ay) + (iy == y0i + 1) * ay)
            # expand to the flat s = y*W + x axis.  NB: the y factor must
            # be ELEMENT-repeated (wy_s[s] = yrow[s // W]), which is a
            # block broadcast over a trailing size-1 axis — pltpu.repeat
            # on the existing axis would TILE (wy_s[s] = yrow[s % H]),
            # a different (wrong) computation.
            tq = yrow.shape[0]
            wy_s = pltpu.repeat(yrow[:, :, None], W,
                                axis=2).reshape(tq, hw)      # (tq, hw)
            x_s = jnp.concatenate([xrow] * H, axis=1)        # (tq, hw)
            acc = acc + wy_s * x_s
        v_h = value_ref[0, :, h * head_dim:(h + 1) * head_dim]
        if vdt == jnp.float32:
            out = jax.lax.dot(acc, v_h,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
        else:
            out = jax.lax.dot(acc.astype(vdt), v_h,
                              preferred_element_type=jnp.float32)
        out_ref[0, :, h * head_dim:(h + 1) * head_dim] = out.astype(
            out_ref.dtype)


def _pallas_forward(value, spatial_shapes, sampling_locations,
                    attention_weights, version=1):
    (H, W), = spatial_shapes
    bs, hw, num_heads, head_dim = value.shape
    _, nq, _, _, num_points, _ = sampling_locations.shape
    assert hw == H * W
    # v2's unrolled (head, point) loop keeps more live temporaries on the
    # Mosaic stack; a smaller query tile keeps it under the VMEM limit
    _TQ = 256 if version == 1 else 128

    loc = sampling_locations.reshape(
        bs, nq, num_heads * 1 * num_points * 2).astype(jnp.float32)
    wgt = attention_weights.reshape(
        bs, nq, num_heads * num_points).astype(jnp.float32)
    val = value.reshape(bs, hw, num_heads * head_dim)  # keeps value dtype

    # pad queries to a multiple of the tile
    nq_pad = -(-nq // _TQ) * _TQ
    if nq_pad != nq:
        pad = ((0, 0), (0, nq_pad - nq), (0, 0))
        loc = jnp.pad(loc, pad)
        wgt = jnp.pad(wgt, pad)

    kernel = functools.partial(_kernel if version == 1 else _kernel_v2,
                               H=H, W=W, num_heads=num_heads,
                               num_points=num_points, head_dim=head_dim)
    out = pl.pallas_call(
        kernel,
        grid=(bs, nq_pad // _TQ),
        in_specs=[
            pl.BlockSpec((1, _TQ, loc.shape[-1]), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TQ, wgt.shape[-1]), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, val.shape[-1]), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TQ, val.shape[-1]),
                               lambda b, q: (b, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, nq_pad, num_heads * head_dim),
                                       value.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bs * num_heads * nq_pad * hw * head_dim
            + 8 * bs * num_heads * num_points * nq_pad * hw,
            bytes_accessed=(loc.size + wgt.size + val.size) * 4
            + bs * nq_pad * num_heads * head_dim * 4,
            transcendentals=0),
    )(loc, wgt, val)
    return out[:, :nq].astype(value.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_2d_pallas(value: jnp.ndarray,
                             spatial_shapes: Sequence[Tuple[int, int]],
                             sampling_locations: jnp.ndarray,
                             attention_weights: jnp.ndarray) -> jnp.ndarray:
    """Drop-in fused replacement for :func:`ms_deform_attn_2d`
    (single level)."""
    return _pallas_forward(value, spatial_shapes, sampling_locations,
                           attention_weights)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_2d_pallas_v2(value: jnp.ndarray,
                                spatial_shapes: Sequence[Tuple[int, int]],
                                sampling_locations: jnp.ndarray,
                                attention_weights: jnp.ndarray
                                ) -> jnp.ndarray:
    """Lane-expansion kernel (see :func:`_kernel_v2`); same contract as
    :func:`ms_deform_attn_2d_pallas`."""
    return _pallas_forward(value, spatial_shapes, sampling_locations,
                           attention_weights, version=2)


def _fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = _pallas_forward(value, spatial_shapes, sampling_locations,
                          attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _fwd_v2(value, spatial_shapes, sampling_locations, attention_weights):
    out = _pallas_forward(value, spatial_shapes, sampling_locations,
                          attention_weights, version=2)
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, residuals, g):
    value, loc, wgt = residuals
    _, vjp = jax.vjp(
        lambda v, l, w: ms_deform_attn_2d_onehot(v, spatial_shapes, l, w),
        value, loc, wgt)
    return vjp(g.astype(value.dtype))


ms_deform_attn_2d_pallas.defvjp(_fwd, _bwd)
ms_deform_attn_2d_pallas_v2.defvjp(_fwd_v2, _bwd)
