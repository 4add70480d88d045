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

from .. import geometry
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
    """cross_attn -> norm -> ffn -> norm (VoxelFormerLayer active order);
    with ``use_temporal_self_attn`` a TSA block + norm precedes it
    (the reference's temporal op order)."""
    cfg: VERConfig

    @nn.compact
    def __call__(self, query, value, reference_points_cam, bev_mask,
                 spatial_shapes: Sequence[Tuple[int, int]],
                 prev_bev=None, ref_2d=None, bev_pos=None,
                 frame_query=None, shift=None,
                 deterministic: bool = True):
        cfg = self.cfg
        if cfg.use_temporal_self_attn:
            from .temporal import VoxelTemporalSelfAttention
            query = VoxelTemporalSelfAttention(
                embed_dims=cfg.embed_dims, num_heads=cfg.num_heads,
                num_levels=cfg.num_levels, num_points=cfg.tsa_num_points,
                num_bev_queue=cfg.num_bev_queue,
                dropout_rate=cfg.dropout_rate, dtype=cfg.dtype,
                deform_impl=cfg.deform_impl,
                name="temporal_self_attn")(
                    query, prev_bev, ref_2d,
                    ((cfg.bev_z, cfg.bev_h, cfg.bev_w),),
                    query_pos=bev_pos, frame_query=frame_query,
                    shift=shift, deterministic=deterministic)
            query = nn.LayerNorm(dtype=cfg.dtype, name="norm0")(query)
        query = SpatialCrossAttention(
            embed_dims=cfg.embed_dims, num_heads=cfg.num_heads,
            num_levels=cfg.num_levels, num_points=cfg.sca_num_points,
            dropout_rate=cfg.dropout_rate, dtype=cfg.dtype,
            deform_impl=cfg.deform_impl,
            query_capacity=cfg.sca_query_capacity, name="cross_attn")(
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
                 prev_bev=None, bev_pos=None, shift=None,
                 deterministic: bool = True):
        cfg = self.cfg
        ref_2d = None
        frame_query = None
        if cfg.use_temporal_self_attn:
            # normalised voxel centres as the TSA reference points
            # (the '2d' branch of get_reference_points,
            # voxel_encoder.py:85-115)
            ref_2d = geometry.voxel_reference_points(
                cfg.bev_z, cfg.bev_h, cfg.bev_w)[None, :, None, :]
            ref_2d = jnp.broadcast_to(
                ref_2d, (bev_query.shape[0],) + ref_2d.shape[1:])
            # the reference stacks [prev_bev, bev_query] ONCE before the
            # layer loop (voxel_encoder.py:261-263): every layer's TSA
            # 'current' value slot is the FRAME-INITIAL grid
            frame_query = bev_query
        # nn.remat counts `self` as arg 0: spatial_shapes (5) and
        # deterministic (11) are hashable statics
        layer_cls = (nn.remat(VoxelEncoderLayer, static_argnums=(5, 11))
                     if cfg.remat_encoder else VoxelEncoderLayer)
        for i in range(cfg.encoder_layers):
            bev_query = layer_cls(cfg, name=f"layer_{i}")(
                bev_query, value, reference_points_cam, bev_mask,
                tuple(tuple(s) for s in spatial_shapes), prev_bev,
                ref_2d, bev_pos, frame_query, shift, deterministic)
        return bev_query
