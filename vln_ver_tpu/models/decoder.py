"""DETR-style 3D detection decoder with iterative reference-point refinement.

Reference: ``VoxelDetectionTransformerDecoder`` (voxel_decoder.py:53-132) —
6 layers of (self_attn, norm, cross_attn, norm, ffn, norm) where cross_attn
is 3D deformable attention over the voxel grid, and after each layer the
per-layer regression branch refines the 3D reference points in
inverse-sigmoid space with a ``stop_gradient`` between layers
(voxel_decoder.py:106-119).
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import MultiheadAttention, VoxelDeformableAttention3D
from .config import VERConfig
from .encoder import FFN


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


class DecoderLayer(nn.Module):
    """self_attn -> norm -> cross_attn -> norm -> ffn -> norm."""
    cfg: VERConfig

    @nn.compact
    def __call__(self, query, value, query_pos, reference_points,
                 spatial_shapes: Sequence[Tuple[int, int, int]],
                 deterministic: bool = True):
        cfg = self.cfg
        query = MultiheadAttention(
            embed_dims=cfg.embed_dims, num_heads=cfg.num_heads,
            dropout_rate=cfg.dropout_rate, dtype=cfg.dtype,
            name="self_attn")(query, query_pos=query_pos,
                              key_pos=query_pos,
                              deterministic=deterministic)
        query = nn.LayerNorm(dtype=cfg.dtype, name="norm1")(query)
        query = VoxelDeformableAttention3D(
            embed_dims=cfg.embed_dims, num_heads=cfg.num_heads,
            num_levels=cfg.num_levels, num_points=cfg.decoder_num_points,
            dropout_rate=cfg.dropout_rate, dtype=cfg.dtype,
            # 'pallas' is an encoder-lift impl; the decoder's two paths
            # are gather (oracle) and onehot (MXU, default)
            deform_impl=("gather" if cfg.deform_impl == "gather"
                         else "onehot"),
            name="cross_attn")(query, value, reference_points,
                               spatial_shapes, query_pos=query_pos,
                               deterministic=deterministic)
        query = nn.LayerNorm(dtype=cfg.dtype, name="norm2")(query)
        query = FFN(cfg.embed_dims, cfg.ffn_dim, cfg.dropout_rate,
                    dtype=cfg.dtype, name="ffn")(
                        query, deterministic=deterministic)
        query = nn.LayerNorm(dtype=cfg.dtype, name="norm3")(query)
        return query


class VoxelDetectionDecoder(nn.Module):
    """Stacked decoder layers with box refinement.

    ``reg_branch_fns`` is a list of callables (one per layer) mapping hidden
    states (B, nq, C) -> (B, nq, code_size); they are applied inside the
    decoder for the iterative refinement exactly as the reference passes
    ``reg_branches`` into the decoder.
    """
    cfg: VERConfig

    @nn.compact
    def __call__(self, query, value, query_pos, reference_points,
                 reg_branch_fns: Sequence[Callable],
                 spatial_shapes: Sequence[Tuple[int, int, int]],
                 deterministic: bool = True):
        """Returns ``(inter_states (L, B, nq, C), refs_before (L, B, nq, 3),
        raw_preds (L, B, nq, code_size))`` where ``refs_before[l]`` is the
        reference fed INTO layer l (init for l=0 — what the head's output
        coordinate computation consumes, head:587-606) and ``raw_preds[l]``
        is the regression branch output on layer l's hidden states."""
        cfg = self.cfg
        inter_states = []
        refs_before = []
        raw_preds = []
        for lid in range(cfg.decoder_layers):
            refs_before.append(reference_points)
            ref_input = reference_points[:, :, None, :]  # (B, nq, levels, 3)
            query = DecoderLayer(cfg, name=f"layer_{lid}")(
                query, value, query_pos, ref_input, spatial_shapes,
                deterministic=deterministic)
            tmp = reg_branch_fns[lid](query)
            raw_preds.append(tmp)
            # iterative refinement with stop_gradient between layers
            # (voxel_decoder.py:106-119)
            new_xy = tmp[..., 0:2] + inverse_sigmoid(
                reference_points[..., 0:2])
            new_z = tmp[..., 4:5] + inverse_sigmoid(
                reference_points[..., 2:3])
            reference_points = jax.lax.stop_gradient(
                jax.nn.sigmoid(jnp.concatenate([new_xy, new_z], -1)))
            inter_states.append(query)
        return (jnp.stack(inter_states), jnp.stack(refs_before),
                jnp.stack(raw_preds))
