"""VoxelPerceptionTransformer: encoder + decoder orchestration.

Reference: voxel_transformer.py:24-301.  ``get_voxel_features`` adds learned
camera/level embeddings to the flattened per-view ViT features and runs the
voxel encoder; ``__call__`` additionally runs the DETR decoder over the
resulting voxel grid.

The decoder's per-layer regression branches live here (inside
``VoxelDetectionDecoder``) so iterative box refinement happens between
layers without parameter sharing gymnastics; the raw per-layer predictions
are returned so the head never re-applies the branches.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import geometry
from .config import VERConfig
from .decoder import VoxelDetectionDecoder
from .encoder import VoxelEncoder


class RegBranch(nn.Module):
    """Dense+ReLU x num_reg_fcs, then Dense(code_size)
    (head _init_layers :191-196)."""
    embed_dims: int
    code_size: int
    num_fcs: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_fcs):
            x = nn.Dense(self.embed_dims, dtype=self.dtype,
                         name=f"fc{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.code_size, dtype=jnp.float32, name="out")(x)


class VoxelTransformer(nn.Module):
    cfg: VERConfig

    def setup(self):
        cfg = self.cfg
        self.cams_embeds = self.param(
            "cams_embeds", nn.initializers.normal(1.0),
            (cfg.num_cams, cfg.embed_dims))
        self.level_embeds = self.param(
            "level_embeds", nn.initializers.normal(1.0),
            (cfg.num_levels, cfg.embed_dims))
        self.encoder = VoxelEncoder(cfg, name="encoder")
        if not cfg.only_occ:
            self.decoder = VoxelDetectionDecoder(cfg, name="decoder")
            self.reference_points_fc = nn.Dense(
                3, dtype=jnp.float32, name="reference_points")
            if cfg.decoder_on_bev and cfg.voxel_2_bev_type == "mlp":
                # voxel->BEV MLP over z-concatenated features
                # (voxel_transformer.py:86-96)
                mid = cfg.embed_dims * cfg.bev_z
                self.voxel2bev = nn.Sequential([
                    nn.Dense(mid, dtype=cfg.dtype),
                    nn.LayerNorm(dtype=cfg.dtype),
                    nn.relu,
                    nn.Dense(cfg.embed_dims, dtype=cfg.dtype),
                    nn.LayerNorm(dtype=cfg.dtype),
                    nn.relu,
                ], name="voxel2bev")
            self.reg_branches = [
                RegBranch(cfg.embed_dims, cfg.code_size, cfg.num_reg_fcs,
                          dtype=cfg.dtype, name=f"reg_branch_{i}")
                for i in range(cfg.decoder_layers)
            ]

    def get_voxel_features(self, features, bev_queries, world2pixel,
                           origin_shift, prev_bev=None, bev_pos=None,
                           tsa_shift=None, deterministic: bool = True):
        """Lift multi-view features into the voxel grid.

        ``tsa_shift`` (B, 3) offsets the TSA slot-0 (prev-frame) reference
        points under ``use_temporal_self_attn``.  Default None == zeros ==
        the reference, whose VOXEL transformer hard-codes
        ``shift = [[0., 0., 0.]]`` (voxel_transformer.py:140) — only its
        2D BEVFormer lineage computes a live ego shift (models/bev2d.py
        here).  Pass a real ego displacement to enable the capability.

        Args:
          features: (B, num_cams, feat_h, feat_w, C) ViT patch features.
          bev_queries: (B, bev_num, C) voxel queries (+pos already merged by
            caller if desired).
          world2pixel: (B, num_cams, 4, 4) fp32.
          origin_shift: (B, 3) fp32.
        Returns:
          ((B, bev_num, C) voxel embedding, sca_overflow int32 scalar).

        ``sca_overflow`` is the in-graph guard on the capacity-bounded
        sparse lift: the number of visible queries BEYOND
        ``sca_query_capacity`` in the worst (batch, camera) slot — zero
        means the lift is exact (the reference's data-dependent rebatch
        never drops, spatial_cross_attention.py:137-154; the lift only
        matches it when K covers every camera's visibility).  Constant 0
        when the dense lift is active.  Callers fail fast on nonzero
        (tools/train.py / test.py / get_occ.py).
        """
        cfg = self.cfg
        b, num_cams, fh, fw, c = features.shape
        value = features.reshape(b, num_cams, fh * fw, c).astype(cfg.dtype)
        value = value + self.cams_embeds[None, :, None, :].astype(cfg.dtype)
        value = value + self.level_embeds[None, None, 0:1, :].astype(
            cfg.dtype)

        ref3d = geometry.voxel_reference_points(cfg.bev_z, cfg.bev_h,
                                                cfg.bev_w)
        cam_xy, mask = jax.vmap(
            lambda w2p, shift: geometry.project_reference_points(
                ref3d, w2p, shift, pc_range=cfg.pc_range))(
                    world2pixel, origin_shift)
        # single z-anchor per voxel query (the reference's D == 1 on the
        # voxel path; each query carries its own z)
        cam_xy = cam_xy[:, :, :, None, :]       # (B, cams, nq, 1, 2)
        mask = mask[:, :, :, None]              # (B, cams, nq, 1)

        cap = cfg.sca_query_capacity
        if cap and cap < mask.shape[2]:
            # worst-slot visible-query count minus K (free: one reduce
            # over the mask already in registers)
            vis = jnp.sum(jnp.any(mask, axis=-1).astype(jnp.int32),
                          axis=-1)                         # (B, cams)
            overflow = jnp.maximum(jnp.max(vis) - cap, 0)
        else:
            overflow = jnp.zeros((), jnp.int32)

        spatial_shapes = ((fh, fw),)
        embed = self.encoder(bev_queries, value, cam_xy, mask,
                             spatial_shapes, prev_bev=prev_bev,
                             bev_pos=bev_pos, shift=tsa_shift,
                             deterministic=deterministic)
        return embed, overflow

    def __call__(self, features, bev_queries, object_query_embed,
                 world2pixel, origin_shift, prev_bev=None, bev_pos=None,
                 tsa_shift=None, deterministic: bool = True):
        """Full encoder+decoder pass.

        Returns (voxel_embed (B, bev_num, C),
                 inter_states (L, B, nq, C),
                 raw_reg_preds (L, B, nq, code_size),
                 refs_before (L, B, nq, 3),
                 sca_overflow int32 scalar — see get_voxel_features)
        where refs_before[l] is the reference fed INTO layer l (init for
        l=0) — exactly what the head's output-coordinate computation
        consumes (head:587-606).
        """
        cfg = self.cfg
        voxel_embed, overflow = self.get_voxel_features(
            features, bev_queries, world2pixel, origin_shift,
            prev_bev=prev_bev, bev_pos=bev_pos, tsa_shift=tsa_shift,
            deterministic=deterministic)

        b = features.shape[0]
        query_pos, query = jnp.split(object_query_embed, 2, axis=-1)
        query_pos = jnp.broadcast_to(query_pos[None],
                                     (b,) + query_pos.shape).astype(cfg.dtype)
        query = jnp.broadcast_to(query[None],
                                 (b,) + query.shape).astype(cfg.dtype)
        init_ref = jax.nn.sigmoid(
            self.reference_points_fc(query_pos.astype(jnp.float32)))

        reg_fns = list(self.reg_branches)
        if cfg.decoder_on_bev:
            # collapse z: the decoder attends a (1, H, W) grid
            # (voxel_transformer.py:263-285)
            vol = voxel_embed.reshape(b, cfg.bev_z, cfg.bev_h, cfg.bev_w,
                                      cfg.embed_dims)
            if cfg.voxel_2_bev_type == "mlp":
                flat = vol.transpose(0, 2, 3, 1, 4).reshape(
                    b, cfg.bev_h, cfg.bev_w, cfg.bev_z * cfg.embed_dims)
                bev = self.voxel2bev(flat)
            else:  # 'pool': max over z
                bev = jnp.max(vol, axis=1)
            dec_value = bev.reshape(b, cfg.bev_h * cfg.bev_w,
                                    cfg.embed_dims)
            spatial_shapes = ((1, cfg.bev_h, cfg.bev_w),)
        else:
            dec_value = voxel_embed
            spatial_shapes = ((cfg.bev_z, cfg.bev_h, cfg.bev_w),)
        inter_states, refs_before, raw_preds = self.decoder(
            query, dec_value, query_pos, init_ref, reg_fns,
            spatial_shapes, deterministic=deterministic)
        return voxel_embed, inter_states, raw_preds, refs_before, overflow
