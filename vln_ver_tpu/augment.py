"""Input augmentation: GridMask on the ViT patch grid.

The reference wires image-space GridMask (models/utils/grid_mask.py:70-124,
use_grid_mask=True) into the (bypassed) backbone path.  Since this
framework's contract is precomputed patch features, the analog is masking
the 14x14 patch grid directly — a jittable, rng-driven structured dropout:
a random-phase stripe grid zeroes ~(1-ratio)^2 of patches with probability
``prob`` per sample (the reference uses ratio=0.5, prob=0.7 schedule).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_mask_features(rng: jax.Array, features: jnp.ndarray,
                       ratio: float = 0.5, prob: float = 0.7,
                       max_period: int = 8) -> jnp.ndarray:
    """features (B, cams, H, W, C) -> same shape with masked patches zeroed.

    Per sample: draw a stripe period d in [2, max_period], phase offsets,
    and zero patches where both (x % d) and (y % d) fall in the masked band
    of width ceil(d * (1-ratio))... matching the reference's keep-band
    construction (grid of black squares).
    """
    b, cams, h, w, c = features.shape
    k_apply, k_d, k_ox, k_oy = jax.random.split(rng, 4)
    apply = jax.random.uniform(k_apply, (b,)) < prob
    d = jax.random.randint(k_d, (b,), 2, max_period + 1)
    # band width ROUNDS like the reference (grid_mask.py:93:
    # l = min(max(int(d*ratio+0.5), 1), d-1)) — flooring made odd periods
    # zero (ceil(d/2)/d)^2 of the grid instead of (floor(d/2)/d)^2, a
    # materially stronger augmentation for ~half the sampled periods
    keep = jnp.clip(jnp.floor(d.astype(jnp.float32) * ratio
                              + 0.5).astype(jnp.int32), 1, d - 1)
    # phases uniform over [0, d) like the reference's randint(d)
    # (grid_mask.py): drawing from [0, max_period) and relying on the
    # later % d would bias the phase distribution whenever d doesn't
    # divide max_period (e.g. d=3, max_period=8 -> probs 3/8, 3/8, 2/8)
    df = d.astype(jnp.float32)
    ox = jnp.floor(jax.random.uniform(k_ox, (b,)) * df).astype(jnp.int32)
    oy = jnp.floor(jax.random.uniform(k_oy, (b,)) * df).astype(jnp.int32)

    ys = jnp.arange(h)[None, :, None]            # (1, H, 1)
    xs = jnp.arange(w)[None, None, :]            # (1, 1, W)
    dy = ((ys + oy[:, None, None]) % d[:, None, None])
    dx = ((xs + ox[:, None, None]) % d[:, None, None])
    masked = ((dy >= keep[:, None, None])
              & (dx >= keep[:, None, None]))     # (B, H, W) True = zeroed
    keep_mask = jnp.where(apply[:, None, None], ~masked, True)
    return features * keep_mask[:, None, :, :, None].astype(features.dtype)
