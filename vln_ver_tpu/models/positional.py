"""Learned 3-axis voxel positional encoding.

Reference: ``VoxelLearnedPositionalEncoding``
(voxel_positional_embedding.py:10-79) — separate learned embeddings for the
row (h), column (w) and z axes, each of the full embed width, summed.
(The reference declares num_feats=384 but indexes full-width embeddings and
sums x+y+z; we keep full-width embeddings of ``embed_dims``.)

Inert on the active MP3D path (the encoder never adds it to the
cross-attention query — see encoder.py docstring) but required by the
temporal self-attention variant.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class VoxelLearnedPositionalEncoding(nn.Module):
    embed_dims: int
    bev_z: int
    bev_h: int
    bev_w: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch_size: int) -> jnp.ndarray:
        """Returns (batch, bev_z*bev_h*bev_w, embed_dims)."""
        row = self.param("row_embed", nn.initializers.uniform(1.0),
                         (self.bev_h, self.embed_dims))
        col = self.param("col_embed", nn.initializers.uniform(1.0),
                         (self.bev_w, self.embed_dims))
        zed = self.param("z_embed", nn.initializers.uniform(1.0),
                         (self.bev_z, self.embed_dims))
        pos = (zed[:, None, None, :] + row[None, :, None, :]
               + col[None, None, :, :])  # (Z, H, W, C)
        pos = pos.reshape(1, -1, self.embed_dims).astype(self.dtype)
        # broadcast, don't materialise B copies (free for XLA)
        return jnp.broadcast_to(pos, (batch_size,) + pos.shape[1:])
