"""BEVFormer-2D model family — the reference's 2D-BEV lineage, TPU-native.

The reference carries the original BEVFormer 2D stack alongside the voxel
(VER) variants: ``PerceptionTransformer`` (modules/transformer.py:26-303,
can-bus conditioning + prev-BEV ego-motion alignment),
``TemporalSelfAttention`` (modules/temporal_self_attention.py:25-271, 2-slot
BEV queue), and the *missing-upstream* ``BEVFormerEncoder``/``BEVFormerLayer``
and ``DetectionTransformerDecoder``/``CustomMSDeformableAttention``
(modules/encoder.py / decoder.py shipped only as .pyc — SURVEY.md §0.3).
Their behaviour is reconstructed here from the call sites and from the voxel
generalisations that ARE present (voxel_encoder.py, voxel_decoder.py are
direct 3D liftings of them).

TPU-first notes: prev-BEV rotation is a bilinear resample (jittable, no
torchvision host op); ego-motion shift is computed in-graph from the can-bus
vector; the camera lift reuses the masked-dense SpatialCrossAttention (one
XLA program, camera axis shardable); pillar sampling is static-shaped.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import geometry
from ..ops import ms_deform_attn_2d
from ..ops.deform_attn import ms_deform_attn_2d_onehot
from ..ops.sampling import bilinear_sample_2d
from .attention import (MultiheadAttention, SpatialCrossAttention,
                        _offset_grid_init_2d)
from .decoder import inverse_sigmoid
from .encoder import FFN
from .head import ClsBranch


class LearnedPositionalEncoding2D(nn.Module):
    """mmcv ``LearnedPositionalEncoding`` (the BEVFormer-2D head's
    ``positional_encoding``): separate learned row/col embeddings of
    ``embed_dims // 2`` features each, concatenated [col(x), row(y)] per
    cell — threaded to the encoder as the TSA query_pos."""
    embed_dims: int
    bev_h: int
    bev_w: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch_size: int) -> jnp.ndarray:
        nf = self.embed_dims // 2
        row = self.param("row_embed", nn.initializers.uniform(1.0),
                         (self.bev_h, nf))
        col = self.param("col_embed", nn.initializers.uniform(1.0),
                         (self.bev_w, nf))
        pos = jnp.concatenate([
            jnp.broadcast_to(col[None, :, :], (self.bev_h, self.bev_w, nf)),
            jnp.broadcast_to(row[:, None, :], (self.bev_h, self.bev_w, nf)),
        ], axis=-1)  # (H, W, C), h-major flat order below
        pos = pos.reshape(1, -1, self.embed_dims).astype(self.dtype)
        # broadcast, don't materialise B copies (free for XLA)
        return jnp.broadcast_to(pos, (batch_size,) + pos.shape[1:])


@dataclasses.dataclass(frozen=True)
class BEV2DConfig:
    bev_h: int = 15
    bev_w: int = 15
    embed_dims: int = 256
    num_heads: int = 8
    encoder_layers: int = 3
    decoder_layers: int = 6
    ffn_dim: int = 512
    num_query: int = 100
    num_points_in_pillar: int = 4
    sca_num_points: int = 8
    tsa_num_points: int = 4
    decoder_num_points: int = 4
    num_levels: int = 1
    num_cams: int = 6
    feat_h: int = 14
    feat_w: int = 14
    in_channels: int = 768
    canbus_dims: int = 18
    pc_range: Tuple[float, ...] = geometry.PC_RANGE
    # Defaults mirror the reference AS SHIPPED: its 2D transformer hard
    # zeroes the ego shift (transformer.py:148) and comments out the
    # can-bus query add (:165-169); only prev-BEV rotation is live.
    # Upstream BEVFormer enables all three — flip the flags for that
    # lineage's behavior (both paths are implemented and tested).
    use_shift: bool = False
    use_can_bus: bool = False
    can_bus_norm: bool = True
    rotate_prev_bev: bool = True
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @property
    def bev_num(self) -> int:
        return self.bev_h * self.bev_w

    @property
    def grid_length(self) -> Tuple[float, float]:
        """(grid_length_y, grid_length_x) in metres per BEV cell."""
        pc = self.pc_range
        return ((pc[4] - pc[1]) / self.bev_h, (pc[3] - pc[0]) / self.bev_w)


def rotate_bev(bev: jnp.ndarray, angle_deg: jnp.ndarray, bev_h: int,
               bev_w: int) -> jnp.ndarray:
    """Rotate BEV feature grids about their centre (bilinear, zero-fill).

    ``bev (B, h*w, C)``, ``angle_deg (B,)`` counter-clockwise degrees —
    jittable equivalent of the reference's per-sample
    ``torchvision...rotate(tmp_prev_bev, rotation_angle)`` loop
    (transformer.py:154-164).
    """
    b, _, c = bev.shape
    grid = bev.reshape(b, bev_h, bev_w, c)
    rad = jnp.deg2rad(angle_deg.astype(jnp.float32))
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    cy, cx = (bev_h - 1) / 2.0, (bev_w - 1) / 2.0
    ys = jnp.arange(bev_h, dtype=jnp.float32) - cy
    xs = jnp.arange(bev_w, dtype=jnp.float32) - cx
    yg, xg = jnp.meshgrid(ys, xs, indexing="ij")          # (h, w)
    # inverse rotation of output coords -> source coords; positive angle
    # rotates the content counter-clockwise on screen (y-down display
    # coords), matching torchvision rotate's convention
    src_x = (cos[:, None, None] * xg - sin[:, None, None] * yg + cx)
    src_y = (sin[:, None, None] * xg + cos[:, None, None] * yg + cy)
    out = bilinear_sample_2d(grid.astype(jnp.float32),
                             src_x.reshape(b, -1), src_y.reshape(b, -1))
    return out.reshape(b, bev_h * bev_w, c).astype(bev.dtype)


def ego_motion_shift(can_bus: jnp.ndarray, cfg: BEV2DConfig) -> jnp.ndarray:
    """Normalised (x, y) BEV shift from the can-bus ego motion.

    Reconstructs the BEVFormer shift recipe (present, commented, at
    transformer.py:127-147): translation length/angle from ``can_bus[0:2]``,
    ego yaw from ``can_bus[-2]`` (radians), shift in grid fractions.
    """
    delta = can_bus[:, 0:2].astype(jnp.float32)
    length = jnp.sqrt(jnp.sum(delta * delta, axis=1))
    translation_angle = jnp.arctan2(delta[:, 1], delta[:, 0])
    bev_angle = can_bus[:, -2].astype(jnp.float32) - translation_angle
    gy, gx = cfg.grid_length
    shift_y = length * jnp.cos(bev_angle) / gy / cfg.bev_h
    shift_x = length * jnp.sin(bev_angle) / gx / cfg.bev_w
    return jnp.stack([shift_x, shift_y], axis=1)          # (B, 2)


class TemporalSelfAttention2D(nn.Module):
    """2-slot 2D deformable temporal self-attention
    (reference temporal_self_attention.py:25-271): offsets/weights predicted
    from [prev, current] concat, queue folded into batch, slot outputs
    averaged.  Identity fallback semantics: with no ``prev_bev`` the value
    is [query, query] (":96-100")."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    num_bev_queue: int = 2
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query: jnp.ndarray,
                 prev_bev: Optional[jnp.ndarray],
                 ref_current: jnp.ndarray, ref_prev: jnp.ndarray,
                 spatial_shapes: Sequence[Tuple[int, int]],
                 query_pos: Optional[jnp.ndarray] = None,
                 frame_query: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """query (B, nq, C); ref_* (B, nq, L, 2) normalised BEV coords —
        ``ref_prev`` carries the ego-motion shift for the history slot
        (the encoder's shift_ref_2d).

        Reference value semantics (same as the 3D TSA): values are built
        BEFORE the query_pos add (temporal_self_attention.py:179-186);
        with prev_bev the 'current' slot is the FRAME-INITIAL bev grid
        stacked once before the layer loop (the upstream encoder's
        ``torch.stack([prev_bev, bev_query], 1)``), passed as
        ``frame_query``; without prev_bev both slots are the layer's
        pos-less query and BOTH ref slots are unshifted (the upstream
        ``[ref_2d, ref_2d]`` else-branch)."""
        bsz, nq, c = query.shape
        queue = self.num_bev_queue
        assert queue == 2
        identity = query
        raw = query
        if query_pos is not None:
            query = query + query_pos
        if prev_bev is not None:
            prev = prev_bev
            cur = frame_query if frame_query is not None else raw
            ref0 = ref_prev
        else:
            prev = cur = raw
            ref0 = ref_current
        value = jnp.stack([prev, cur], axis=1).reshape(bsz * queue, nq, c)
        q_cat = jnp.concatenate([prev, query], axis=-1)

        hd = self.embed_dims // self.num_heads
        v = nn.Dense(self.embed_dims, name="value_proj",
                     dtype=self.dtype)(value)
        v = v.reshape(bsz * queue, nq, self.num_heads, hd)

        n_off = queue * self.num_heads * self.num_levels * self.num_points

        def _bias_init(*a):
            # per-head directional grid, repeated per queue slot WITHIN
            # each head (the offsets reshape below is heads-major:
            # (..., heads, queue, levels, points, 2))
            g = _offset_grid_init_2d(self.num_heads, self.num_levels,
                                     self.num_points).reshape(
                self.num_heads, 1, -1)
            return jnp.tile(g, (1, queue, 1)).reshape(-1)

        offsets = nn.Dense(
            n_off * 2, kernel_init=nn.initializers.zeros,
            bias_init=_bias_init,
            name="sampling_offsets", dtype=jnp.float32)(q_cat)
        offsets = offsets.reshape(bsz, nq, self.num_heads, queue,
                                  self.num_levels, self.num_points, 2)
        attn = nn.Dense(n_off, kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="attention_weights", dtype=jnp.float32)(q_cat)
        attn = attn.reshape(bsz, nq, self.num_heads, queue,
                            self.num_levels * self.num_points)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = attn.reshape(bsz, nq, self.num_heads, queue,
                            self.num_levels, self.num_points)

        # fold queue into batch (":219-222"); slot 0 = prev, slot 1 = cur
        attn = attn.transpose(0, 3, 1, 2, 4, 5).reshape(
            bsz * queue, nq, self.num_heads, self.num_levels,
            self.num_points)
        offsets = offsets.transpose(0, 3, 1, 2, 4, 5, 6).reshape(
            bsz * queue, nq, self.num_heads, self.num_levels,
            self.num_points, 2)
        normalizer = jnp.asarray([[w, h] for (h, w) in spatial_shapes],
                                 jnp.float32)
        # fold queue into batch BATCH-MAJOR (row = b*queue + slot), matching
        # the value/offset folding above — a slot-major concatenate would
        # pair sample b's value rows with sample (b*2 mod B)'s references
        ref = jnp.stack([ref0, ref_current], axis=1).reshape(
            bsz * queue, nq, -1, 2)
        locations = (ref[:, :, None, :, None, :]
                     + offsets / normalizer[None, None, None, :, None, :])

        out = ms_deform_attn_2d_onehot(v.astype(jnp.float32),
                                       spatial_shapes, locations, attn)
        out = out.reshape(bsz, queue, nq, self.embed_dims).mean(axis=1)
        out = nn.Dense(self.embed_dims, name="output_proj",
                       dtype=self.dtype)(out.astype(self.dtype))
        out = nn.Dropout(self.dropout_rate)(out,
                                            deterministic=deterministic)
        return out + identity


class BEV2DEncoderLayer(nn.Module):
    """BEVFormerLayer (missing upstream; reconstructed) op order:
    self_attn (TSA) -> norm -> cross_attn (SCA) -> norm -> ffn -> norm."""
    cfg: BEV2DConfig

    @nn.compact
    def __call__(self, query, value, reference_points_cam, bev_mask,
                 spatial_shapes, prev_bev, ref_current, ref_prev,
                 bev_pos=None, frame_query=None,
                 deterministic: bool = True):
        cfg = self.cfg
        query = TemporalSelfAttention2D(
            embed_dims=cfg.embed_dims, num_heads=cfg.num_heads,
            num_levels=cfg.num_levels, num_points=cfg.tsa_num_points,
            dropout_rate=cfg.dropout_rate, dtype=cfg.dtype,
            name="temporal_self_attn")(
                query, prev_bev, ref_current, ref_prev,
                ((cfg.bev_h, cfg.bev_w),), query_pos=bev_pos,
                frame_query=frame_query, deterministic=deterministic)
        query = nn.LayerNorm(dtype=cfg.dtype, name="norm1")(query)
        query = SpatialCrossAttention(
            embed_dims=cfg.embed_dims, num_heads=cfg.num_heads,
            num_levels=cfg.num_levels, num_points=cfg.sca_num_points,
            dropout_rate=cfg.dropout_rate, dtype=cfg.dtype,
            name="cross_attn")(
                query, value, reference_points_cam, bev_mask,
                spatial_shapes, deterministic=deterministic)
        query = nn.LayerNorm(dtype=cfg.dtype, name="norm2")(query)
        query = FFN(cfg.embed_dims, cfg.ffn_dim, cfg.dropout_rate,
                    dtype=cfg.dtype, name="ffn")(
                        query, deterministic=deterministic)
        query = nn.LayerNorm(dtype=cfg.dtype, name="norm3")(query)
        return query


class BEVFormerEncoder2D(nn.Module):
    """BEVFormerEncoder (missing upstream; reconstructed from its voxel
    lifting, voxel_encoder.py:30-296): pillar-sampled camera lift + TSA."""
    cfg: BEV2DConfig

    @nn.compact
    def __call__(self, bev_query, value, world2pixel, origin_shift,
                 prev_bev=None, shift=None, bev_pos=None,
                 deterministic: bool = True):
        cfg = self.cfg
        bsz = bev_query.shape[0]
        ref_pillar = geometry.pillar_reference_points(
            cfg.bev_h, cfg.bev_w, cfg.num_points_in_pillar,
            z_extent=cfg.pc_range[5] - cfg.pc_range[2])

        def project_one(w2p, oshift):
            flat = ref_pillar.reshape(-1, 3)
            xy, mask = geometry.project_reference_points(
                flat, w2p, oshift, pc_range=cfg.pc_range)
            a = cfg.num_points_in_pillar
            xy = xy.reshape(cfg.num_cams, cfg.bev_num, a, 2)
            mask = mask.reshape(cfg.num_cams, cfg.bev_num, a)
            return xy, mask

        ref_cam, bev_mask = jax.vmap(project_one)(world2pixel, origin_shift)

        ref_2d = geometry.bev_reference_points(cfg.bev_h, cfg.bev_w)
        ref_current = jnp.broadcast_to(ref_2d[None, :, None, :],
                                       (bsz, cfg.bev_num, cfg.num_levels, 2))
        if shift is None:
            shift = jnp.zeros((bsz, 2), jnp.float32)
        ref_prev = ref_current + shift[:, None, None, :]

        spatial_shapes = ((cfg.feat_h, cfg.feat_w),)
        # the upstream encoder stacks [prev_bev, bev_query] ONCE before
        # the layer loop: every layer's TSA 'current' value slot is the
        # frame-initial grid
        frame_query = bev_query
        for i in range(cfg.encoder_layers):
            bev_query = BEV2DEncoderLayer(cfg, name=f"layer_{i}")(
                bev_query, value, ref_cam, bev_mask, spatial_shapes,
                prev_bev, ref_current, ref_prev, bev_pos=bev_pos,
                frame_query=frame_query, deterministic=deterministic)
        return bev_query


class CustomMSDeformableAttention2D(nn.Module):
    """The missing decoder.py's ``CustomMSDeformableAttention``
    (imported at voxel_transformer.py:19 / transformer.py:21): standard 2D
    deformable-DETR cross-attention with output proj + dropout + residual."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, value, reference_points, spatial_shapes,
                 query_pos=None, deterministic: bool = True):
        """query (B, nq, C); value (B, nv, C);
        reference_points (B, nq, L, 2) in [0, 1]."""
        bsz, nq, _ = query.shape
        nv = value.shape[1]
        hd = self.embed_dims // self.num_heads
        identity = query
        if query_pos is not None:
            query = query + query_pos

        v = nn.Dense(self.embed_dims, name="value_proj",
                     dtype=self.dtype)(value)
        v = v.reshape(bsz, nv, self.num_heads, hd)
        n_off = self.num_heads * self.num_levels * self.num_points
        offsets = nn.Dense(
            n_off * 2, kernel_init=nn.initializers.zeros,
            bias_init=lambda *a: _offset_grid_init_2d(
                self.num_heads, self.num_levels, self.num_points),
            name="sampling_offsets", dtype=jnp.float32)(query)
        offsets = offsets.reshape(bsz, nq, self.num_heads, self.num_levels,
                                  self.num_points, 2)
        attn = nn.Dense(n_off, kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="attention_weights", dtype=jnp.float32)(query)
        attn = attn.reshape(bsz, nq, self.num_heads,
                            self.num_levels * self.num_points)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = attn.reshape(bsz, nq, self.num_heads, self.num_levels,
                            self.num_points)
        normalizer = jnp.asarray([[w, h] for (h, w) in spatial_shapes],
                                 jnp.float32)
        locations = (reference_points[:, :, None, :, None, :]
                     + offsets / normalizer[None, None, None, :, None, :])
        out = ms_deform_attn_2d(v.astype(jnp.float32), spatial_shapes,
                                locations, attn).astype(self.dtype)
        out = nn.Dense(self.embed_dims, name="output_proj",
                       dtype=self.dtype)(out)
        out = nn.Dropout(self.dropout_rate)(out,
                                            deterministic=deterministic)
        return out + identity


class DetectionTransformerDecoder2D(nn.Module):
    """The missing decoder.py's ``DetectionTransformerDecoder``: DETR
    decoder over the BEV grid with iterative 2D reference refinement
    (reconstructed from its 3D lifting, voxel_decoder.py:53-132)."""
    cfg: BEV2DConfig

    @nn.compact
    def __call__(self, query, value, query_pos, reference_points,
                 reg_branch_fns: Sequence[Callable],
                 deterministic: bool = True):
        """``reference_points (B, nq, 3)`` — the BEVFormer decoder carries
        3D references but samples the BEV grid with (x, y) only; z rides
        along purely for the box decode / refinement (original
        DetectionTransformerDecoder semantics, reconstructed)."""
        cfg = self.cfg
        spatial_shapes = ((cfg.bev_h, cfg.bev_w),)
        inter_states, refs_before, raw_preds = [], [], []
        for lid in range(cfg.decoder_layers):
            refs_before.append(reference_points)
            ref_input = reference_points[:, :, None, 0:2]
            q = MultiheadAttention(
                embed_dims=cfg.embed_dims, num_heads=cfg.num_heads,
                dropout_rate=cfg.dropout_rate, dtype=cfg.dtype,
                name=f"self_attn_{lid}")(query, query_pos=query_pos,
                                         key_pos=query_pos,
                                         deterministic=deterministic)
            q = nn.LayerNorm(dtype=cfg.dtype, name=f"norm1_{lid}")(q)
            q = CustomMSDeformableAttention2D(
                embed_dims=cfg.embed_dims, num_heads=cfg.num_heads,
                num_levels=cfg.num_levels,
                num_points=cfg.decoder_num_points,
                dropout_rate=cfg.dropout_rate, dtype=cfg.dtype,
                name=f"cross_attn_{lid}")(q, value, ref_input,
                                          spatial_shapes,
                                          query_pos=query_pos,
                                          deterministic=deterministic)
            q = nn.LayerNorm(dtype=cfg.dtype, name=f"norm2_{lid}")(q)
            q = FFN(cfg.embed_dims, cfg.ffn_dim, cfg.dropout_rate,
                    dtype=cfg.dtype, name=f"ffn_{lid}")(
                        q, deterministic=deterministic)
            query = nn.LayerNorm(dtype=cfg.dtype, name=f"norm3_{lid}")(q)
            tmp = reg_branch_fns[lid](query)
            raw_preds.append(tmp)
            new_xy = tmp[..., 0:2] + inverse_sigmoid(
                reference_points[..., 0:2])
            new_z = tmp[..., 4:5] + inverse_sigmoid(
                reference_points[..., 2:3])
            reference_points = jax.lax.stop_gradient(jax.nn.sigmoid(
                jnp.concatenate([new_xy, new_z], -1)))
            inter_states.append(query)
        return (jnp.stack(inter_states), jnp.stack(refs_before),
                jnp.stack(raw_preds))


class PerceptionTransformer2D(nn.Module):
    """The 2D ``PerceptionTransformer`` (transformer.py:26-303): can-bus
    conditioning, ego-motion prev-BEV alignment (shift + rotation), camera /
    level embeds, encoder lift, and the 2D DETR decoder."""
    cfg: BEV2DConfig

    def setup(self):
        cfg = self.cfg
        self.level_embeds = self.param(
            "level_embeds", nn.initializers.normal(1.0),
            (cfg.num_levels, cfg.embed_dims))
        self.cams_embeds = self.param(
            "cams_embeds", nn.initializers.normal(1.0),
            (cfg.num_cams, cfg.embed_dims))
        self.input_proj = nn.Dense(cfg.embed_dims, dtype=cfg.dtype,
                                   name="input_proj")
        # reference can_bus_mlp (transformer.py:77-85): two Dense+ReLU
        # blocks, plus a trailing LayerNorm under can_bus_norm=True (the
        # reference default) so the conditioning added to every BEV query
        # has bounded scale
        mlp = [nn.Dense(cfg.embed_dims // 2, dtype=cfg.dtype), nn.relu,
               nn.Dense(cfg.embed_dims, dtype=cfg.dtype), nn.relu]
        if cfg.can_bus_norm:
            mlp.append(nn.LayerNorm(dtype=cfg.dtype))
        self.can_bus_mlp = nn.Sequential(mlp)
        self.encoder = BEVFormerEncoder2D(cfg, name="encoder")
        self.decoder = DetectionTransformerDecoder2D(cfg, name="decoder")
        self.reference_points_fc = nn.Dense(3, dtype=jnp.float32,
                                            name="reference_points")

    def _prep_value(self, features):
        cfg = self.cfg
        bsz = features.shape[0]
        val = features.reshape(bsz, cfg.num_cams,
                               cfg.feat_h * cfg.feat_w, -1)
        val = self.input_proj(val.astype(cfg.dtype))
        val = val + self.cams_embeds[None, :, None, :].astype(cfg.dtype)
        val = val + self.level_embeds[None, None, None, 0].astype(cfg.dtype)
        return val

    def get_bev_features(self, bev_queries, features, world2pixel,
                         origin_shift, can_bus=None, prev_bev=None,
                         bev_pos=None, deterministic: bool = True):
        """bev_queries (B, h*w, C); features (B, cam, fh, fw, Cin);
        can_bus (B, 18) or None; prev_bev (B, h*w, C) or None."""
        cfg = self.cfg
        bsz = bev_queries.shape[0]
        shift = jnp.zeros((bsz, 2), jnp.float32)
        if can_bus is not None:
            if cfg.use_shift:
                shift = ego_motion_shift(can_bus, cfg)
            if prev_bev is not None and cfg.rotate_prev_bev:
                prev_bev = rotate_bev(prev_bev, can_bus[:, -1],
                                      cfg.bev_h, cfg.bev_w)
            if cfg.use_can_bus:
                bev_queries = bev_queries + self.can_bus_mlp(
                    can_bus.astype(cfg.dtype))[:, None, :]
        value = self._prep_value(features)
        return self.encoder(bev_queries, value, world2pixel, origin_shift,
                            prev_bev=prev_bev, shift=shift, bev_pos=bev_pos,
                            deterministic=deterministic)

    def __call__(self, bev_queries, features, world2pixel, origin_shift,
                 object_query_embed, reg_branch_fns,
                 can_bus=None, prev_bev=None, bev_pos=None,
                 deterministic: bool = True):
        """object_query_embed (num_query, 2C) -> split into (pos, query)
        as the reference does (transformer.py:239-247).  Returns
        (bev_embed, inter_states, refs_before, raw_preds)."""
        cfg = self.cfg
        bsz = bev_queries.shape[0]
        bev_embed = self.get_bev_features(
            bev_queries, features, world2pixel, origin_shift,
            can_bus=can_bus, prev_bev=prev_bev, bev_pos=bev_pos,
            deterministic=deterministic)
        query_pos, query = jnp.split(object_query_embed, 2, axis=-1)
        query_pos = jnp.broadcast_to(query_pos[None],
                                     (bsz,) + query_pos.shape)
        query = jnp.broadcast_to(query[None], (bsz,) + query.shape)
        ref = jax.nn.sigmoid(
            self.reference_points_fc(query_pos.astype(jnp.float32)))
        inter_states, refs_before, raw_preds = self.decoder(
            query.astype(cfg.dtype), bev_embed, query_pos.astype(cfg.dtype),
            ref, reg_branch_fns, deterministic=deterministic)
        return bev_embed, inter_states, refs_before, raw_preds


class BEVFormer2D(nn.Module):
    """End-to-end BEVFormer-2D: learned BEV queries + positional encoding,
    the 2D perception transformer, and per-decoder-layer cls/reg branches
    with coordinate decode (the BEVFormer head recipe on the 10-code box
    codec, see ``vln_ver_tpu.boxes``)."""
    cfg: BEV2DConfig
    num_classes: int = 10
    code_size: int = 10

    def setup(self):
        cfg = self.cfg
        self.bev_embedding = self.param(
            "bev_embedding", nn.initializers.normal(1.0),
            (cfg.bev_num, cfg.embed_dims))
        self.query_embedding = self.param(
            "query_embedding", nn.initializers.normal(1.0),
            (cfg.num_query, 2 * cfg.embed_dims))
        # the BEVFormer head builds a LearnedPositionalEncoding and
        # threads it to every encoder layer's TSA as query_pos
        self.positional_encoding = LearnedPositionalEncoding2D(
            cfg.embed_dims, cfg.bev_h, cfg.bev_w, dtype=cfg.dtype,
            name="positional_encoding")
        self.transformer = PerceptionTransformer2D(cfg, name="transformer")
        # the head recipe's cls branch: (Dense, LN, ReLU) x 2 + output
        # Dense with focal-prior bias (head:184-189, 274-278) — a bare
        # Dense had p=0.5 initial logits and no hidden stack
        self.cls_branches = [
            ClsBranch(cfg.embed_dims, self.num_classes,
                      name=f"cls_branch_{i}")
            for i in range(cfg.decoder_layers)]
        self.reg_branches = [
            nn.Sequential([
                nn.Dense(cfg.embed_dims, dtype=cfg.dtype), nn.relu,
                nn.Dense(cfg.embed_dims, dtype=cfg.dtype), nn.relu,
                nn.Dense(self.code_size, dtype=jnp.float32),
            ]) for _ in range(cfg.decoder_layers)]

    def __call__(self, features, world2pixel, origin_shift, can_bus=None,
                 prev_bev=None, only_bev: bool = False,
                 deterministic: bool = True):
        cfg = self.cfg
        bsz = features.shape[0]
        bev_queries = jnp.broadcast_to(
            self.bev_embedding[None],
            (bsz, cfg.bev_num, cfg.embed_dims)).astype(cfg.dtype)
        bev_pos = self.positional_encoding(bsz)
        if only_bev:  # history-BEV extraction (obtain_history_bev analog)
            return self.transformer.get_bev_features(
                bev_queries, features, world2pixel, origin_shift,
                can_bus=can_bus, prev_bev=prev_bev, bev_pos=bev_pos,
                deterministic=deterministic)
        reg_fns = [lambda x, i=i: self.reg_branches[i](x)
                   for i in range(cfg.decoder_layers)]
        bev_embed, inter, refs, raw = self.transformer(
            bev_queries, features, world2pixel, origin_shift,
            self.query_embedding, reg_fns, can_bus=can_bus,
            prev_bev=prev_bev, bev_pos=bev_pos,
            deterministic=deterministic)
        # per-layer decode: add the (pre-layer) reference back in
        # inverse-sigmoid space, as the VER head does (head:587-610)
        pc = jnp.asarray(cfg.pc_range, jnp.float32)
        cls_scores, bbox_preds = [], []
        for lid in range(cfg.decoder_layers):
            cls_scores.append(self.cls_branches[lid](
                inter[lid].astype(jnp.float32)))
            tmp = raw[lid]
            xy = jax.nn.sigmoid(tmp[..., 0:2]
                                + inverse_sigmoid(refs[lid][..., 0:2]))
            z = jax.nn.sigmoid(tmp[..., 4:5]
                               + inverse_sigmoid(refs[lid][..., 2:3]))
            cx = xy[..., 0:1] * (pc[3] - pc[0]) + pc[0]
            cy = xy[..., 1:2] * (pc[4] - pc[1]) + pc[1]
            cz = z * (pc[5] - pc[2]) + pc[2]
            bbox_preds.append(jnp.concatenate(
                [cx, cy, tmp[..., 2:4], cz, tmp[..., 5:]], axis=-1))
        return {
            "bev_embed": bev_embed,
            "all_cls_scores": jnp.stack(cls_scores),
            "all_bbox_preds": jnp.stack(bbox_preds),
        }
