"""Voxel encoder: lifts multi-view 2D features into the 3D voxel-query grid.

TPU-native reimplementation of ``VoxelFormerEncoder`` / ``VoxelFormerLayer``
(reference voxel_encoder.py:30-464).  The active reference op order is
``('cross_attn', 'norm', 'ffn', 'norm')`` (vocc.py:136) — no temporal
self-attention on the MP3D path.  Camera projection happens once per forward
from array-valued camera parameters (see vln_ver_tpu.geometry), not from
per-forward JSON reads.

Note a subtle reference behaviour preserved here: the learned positional
encoding (``bev_pos``) is threaded to the layer but the cross-attention is
invoked with ``query_pos=None`` (voxel_encoder.py:441-455 — ``query_pos`` is
a separate forward arg that the encoder never sets), so on the active path
position information enters only through the learned voxel embedding.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .attention import SpatialCrossAttention
from .config import VERConfig


class FFN(nn.Module):
    """mmcv-style FFN: Dense -> ReLU -> Dropout -> Dense -> Dropout,
    residual add."""
    embed_dims: int
    feedforward_dim: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        y = nn.Dense(self.feedforward_dim, dtype=self.dtype, name="fc1")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        y = nn.Dense(self.embed_dims, dtype=self.dtype, name="fc2")(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        return y + residual


class VoxelEncoderLayer(nn.Module):
    """cross_attn -> norm -> ffn -> norm (VoxelFormerLayer active order)."""
    cfg: VERConfig

    @nn.compact
    def __call__(self, query, value, reference_points_cam, bev_mask,
                 spatial_shapes: Sequence[Tuple[int, int]],
                 deterministic: bool = True):
        cfg = self.cfg
        query = SpatialCrossAttention(
            embed_dims=cfg.embed_dims, num_heads=cfg.num_heads,
            num_levels=cfg.num_levels, num_points=cfg.sca_num_points,
            dropout_rate=cfg.dropout_rate, dtype=cfg.dtype,
            use_pallas=cfg.use_pallas, name="cross_attn")(
                query, value, reference_points_cam, bev_mask,
                spatial_shapes, deterministic=deterministic)
        query = nn.LayerNorm(dtype=cfg.dtype, name="norm1")(query)
        query = FFN(cfg.embed_dims, cfg.ffn_dim, cfg.dropout_rate,
                    dtype=cfg.dtype, name="ffn")(
                        query, deterministic=deterministic)
        query = nn.LayerNorm(dtype=cfg.dtype, name="norm2")(query)
        return query


class VoxelEncoder(nn.Module):
    """Stack of ``encoder_layers`` VoxelEncoderLayers."""
    cfg: VERConfig

    @nn.compact
    def __call__(self, bev_query, value, reference_points_cam, bev_mask,
                 spatial_shapes: Sequence[Tuple[int, int]],
                 deterministic: bool = True):
        for i in range(self.cfg.encoder_layers):
            bev_query = VoxelEncoderLayer(self.cfg, name=f"layer_{i}")(
                bev_query, value, reference_points_cam, bev_mask,
                spatial_shapes, deterministic=deterministic)
        return bev_query
