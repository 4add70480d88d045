"""Bilinear / trilinear grid sampling with torch ``grid_sample`` semantics.

These are the correctness oracles for the Pallas kernels and the direct
compute path for small grids.  Semantics match
``F.grid_sample(mode='bilinear', padding_mode='zeros', align_corners=False)``
as used by the reference's pure-PyTorch deformable-attention fallbacks
(mmcv multi_scale_deformable_attn_pytorch and
voxel_temporal_self_attention.py:275-335): a normalised location ``u`` in
[0, 1] maps to pixel coordinate ``u * size - 0.5`` and out-of-range taps
contribute zero.
"""

from __future__ import annotations

import jax.numpy as jnp


def _taps_1d(coord: jnp.ndarray, size: int):
    """Return (i0, i1, w0, w1, ok0, ok1) for linear interpolation along one
    axis with zero padding. ``coord`` is in pixel space."""
    i0 = jnp.floor(coord)
    w1 = coord - i0
    w0 = 1.0 - w1
    i0i = i0.astype(jnp.int32)
    i1i = i0i + 1
    ok0 = (i0i >= 0) & (i0i < size)
    ok1 = (i1i >= 0) & (i1i < size)
    return (jnp.clip(i0i, 0, size - 1), jnp.clip(i1i, 0, size - 1),
            w0, w1, ok0, ok1)


def bilinear_sample_2d(value: jnp.ndarray, x: jnp.ndarray,
                       y: jnp.ndarray) -> jnp.ndarray:
    """Sample ``value`` (..., H, W, C) at pixel coords ``x``/``y`` (..., S).

    Leading dims of ``value`` and ``x``/``y`` must agree; returns
    (..., S, C).  Zero padding outside the grid.
    """
    h, w, _ = value.shape[-3:]
    vflat = value.reshape(value.shape[:-3] + (h * w, value.shape[-1]))
    x0, x1, wx0, wx1, okx0, okx1 = _taps_1d(x, w)
    y0, y1, wy0, wy1, oky0, oky1 = _taps_1d(y, h)

    def gather(yi, xi):
        idx = yi * w + xi
        return jnp.take_along_axis(
            vflat, idx[..., None], axis=-2)

    out = (gather(y0, x0) * (wy0 * wx0 * (oky0 & okx0))[..., None]
           + gather(y0, x1) * (wy0 * wx1 * (oky0 & okx1))[..., None]
           + gather(y1, x0) * (wy1 * wx0 * (oky1 & okx0))[..., None]
           + gather(y1, x1) * (wy1 * wx1 * (oky1 & okx1))[..., None])
    return out


def trilinear_sample_3d(value: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                        z: jnp.ndarray) -> jnp.ndarray:
    """Sample ``value`` (..., D, H, W, C) at pixel coords (..., S).

    ``x`` indexes W, ``y`` indexes H, ``z`` indexes D (torch grid_sample 5-D
    convention with grid (x, y, z)).  Zero padding outside.
    """
    d, h, w, _ = value.shape[-4:]
    vflat = value.reshape(value.shape[:-4] + (d * h * w, value.shape[-1]))
    x0, x1, wx0, wx1, okx0, okx1 = _taps_1d(x, w)
    y0, y1, wy0, wy1, oky0, oky1 = _taps_1d(y, h)
    z0, z1, wz0, wz1, okz0, okz1 = _taps_1d(z, d)

    def gather(zi, yi, xi):
        idx = (zi * h + yi) * w + xi
        return jnp.take_along_axis(vflat, idx[..., None], axis=-2)

    out = 0.0
    for zi, wz, okz in ((z0, wz0, okz0), (z1, wz1, okz1)):
        for yi, wy, oky in ((y0, wy0, oky0), (y1, wy1, oky1)):
            for xi, wx, okx in ((x0, wx0, okx0), (x1, wx1, okx1)):
                wgt = (wz * wy * wx * (okz & oky & okx))[..., None]
                out = out + gather(zi, yi, xi) * wgt
    return out
