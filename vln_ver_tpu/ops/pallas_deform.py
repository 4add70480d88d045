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
    """One grid step == one batch element (refs carry a leading block dim
    of 1).

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


_TQ = 256  # query-tile size: keeps per-program VMEM well under the limit


def _pallas_forward(value, spatial_shapes, sampling_locations,
                    attention_weights):
    (H, W), = spatial_shapes
    bs, hw, num_heads, head_dim = value.shape
    _, nq, _, _, num_points, _ = sampling_locations.shape
    assert hw == H * W

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

    kernel = functools.partial(_kernel, H=H, W=W, num_heads=num_heads,
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


def _fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = _pallas_forward(value, spatial_shapes, sampling_locations,
                          attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, residuals, g):
    value, loc, wgt = residuals
    _, vjp = jax.vjp(
        lambda v, l, w: ms_deform_attn_2d_onehot(v, spatial_shapes, l, w),
        value, loc, wgt)
    return vjp(g.astype(value.dtype))


ms_deform_attn_2d_pallas.defvjp(_fwd, _bwd)
