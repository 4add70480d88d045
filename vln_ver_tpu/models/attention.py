"""Attention modules: per-camera 2D deformable attention, masked-dense
spatial cross-attention, and 3D voxel deformable attention.

Reference semantics:

* ``CamDeformableAttention`` == MSDeformableAttention3D
  (spatial_cross_attention.py:179-402): per-camera 2D deformable-DETR
  attention whose 8 sampling points are shared across the query's
  ``num_Z_anchors`` projected reference points (1 anchor on the MP3D voxel
  path).  No output projection (done by the caller).
* ``SpatialCrossAttention`` (spatial_cross_attention.py:31-176): the
  reference gathers, per camera, only the voxel queries visible in that view
  (data-dependent shapes) and scatter-adds results back.  Here we run the
  attention **dense** over all queries for every camera and multiply by the
  visibility mask before the sum — math-identical (invisible queries
  contribute zero and the reference already count-normalises) but
  static-shaped, so the whole encoder compiles to one XLA program and the
  camera axis can be sharded over the mesh with a single ``psum``.
* ``VoxelDeformableAttention3D`` == VoxelCustomMSDeformableAttention
  (voxel_decoder.py:135-358): 3D offsets, trilinear sampling over the
  (z, h, w) voxel grid, with output projection + dropout + residual.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import ms_deform_attn_2d, voxel_deform_attn_3d


def _offset_grid_init_2d(num_heads: int, num_levels: int, num_points: int):
    """Directional bias init of the 2D sampling offsets
    (spatial_cross_attention.py:255-269)."""
    thetas = jnp.arange(num_heads, dtype=jnp.float32) * (
        2.0 * math.pi / num_heads)
    grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], axis=-1)
    grid = grid / jnp.abs(grid).max(axis=-1, keepdims=True)
    grid = jnp.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
    scale = jnp.arange(1, num_points + 1, dtype=jnp.float32)[None, None, :,
                                                             None]
    return (grid * scale).reshape(-1)


def _offset_grid_init_3d(num_heads: int, num_levels: int, num_points: int):
    """3D variant seeds offsets with (cos, sin, cos+sin)
    (voxel_decoder.py:212-226)."""
    thetas = jnp.arange(num_heads, dtype=jnp.float32) * (
        2.0 * math.pi / num_heads)
    grid = jnp.stack(
        [jnp.cos(thetas), jnp.sin(thetas), jnp.cos(thetas) + jnp.sin(thetas)],
        axis=-1)
    grid = grid / jnp.abs(grid).max(axis=-1, keepdims=True)
    grid = jnp.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
    scale = jnp.arange(1, num_points + 1, dtype=jnp.float32)[None, None, :,
                                                             None]
    return (grid * scale).reshape(-1)


class CamDeformableAttention(nn.Module):
    """Per-camera 2D deformable attention (reference MSDeformableAttention3D).

    TPU-first restructuring: the sampling offsets and attention weights
    depend only on the query, so for the multi-camera lift they are
    computed ONCE per sample on ``(B, nq, C)`` and broadcast across the
    camera axis — the reference recomputes them per camera on the gathered
    per-view queries (spatial_cross_attention.py:163-165), which is the
    same math with ~num_cams x the Dense FLOPs and a (B*cams, nq, C) query
    materialisation in HBM.
    """
    embed_dims: int = 768
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 8
    dtype: jnp.dtype = jnp.float32
    deform_impl: str = "onehot"   # 'gather' | 'onehot' | 'pallas'

    @nn.compact
    def __call__(self, query: jnp.ndarray, value: jnp.ndarray,
                 reference_points: jnp.ndarray,
                 spatial_shapes: Sequence[Tuple[int, int]],
                 gather_idx: jnp.ndarray | None = None) -> jnp.ndarray:
        """query (B, nq, C); value (B, num_cam, nv, C);
        reference_points (B, num_cam, nq, num_Z_anchors, 2) in [0,1].
        Returns (B, num_cam, nq, C).

        With ``gather_idx`` (B, num_cam, K) int32 — the capacity-bounded
        sparse lift — the offsets/weights are still computed densely per
        query (cheapest: one Dense over nq rows), then only the K gathered
        rows per camera run the deformable sampling;
        ``reference_points``/return are (B, num_cam, K, ...) shaped.
        """
        bsz, nq, _ = query.shape
        num_cam, nv = value.shape[1], value.shape[2]
        hd = self.embed_dims // self.num_heads

        value = nn.Dense(self.embed_dims, name="value_proj",
                         dtype=self.dtype)(value)
        value = value.reshape(bsz * num_cam, nv, self.num_heads, hd)

        offsets = nn.Dense(
            self.num_heads * self.num_levels * self.num_points * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *a: _offset_grid_init_2d(
                self.num_heads, self.num_levels, self.num_points),
            name="sampling_offsets", dtype=jnp.float32)(query)

        attn = nn.Dense(self.num_heads * self.num_levels * self.num_points,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="attention_weights", dtype=jnp.float32)(query)
        attn = attn.reshape(bsz, nq, self.num_heads,
                            self.num_levels * self.num_points)
        attn = jax.nn.softmax(attn, axis=-1)

        if gather_idx is not None:
            # one-hot matmul gathers (exact: fp32 HIGHEST) keep the
            # backward MXU-shaped — take_along_axis here would autodiff
            # into an XLA scatter
            onehot = jax.nn.one_hot(gather_idx, nq, dtype=jnp.float32)
            gather = lambda x: jnp.einsum(
                "bckn,bnf->bckf", onehot, x.reshape(bsz, nq, -1),
                precision=jax.lax.Precision.HIGHEST)
            nq_eff = gather_idx.shape[-1]
            offsets = gather(offsets).reshape(
                bsz, num_cam, nq_eff, self.num_heads, self.num_levels,
                self.num_points, 2)
            attn = gather(attn).reshape(
                bsz * num_cam, nq_eff, self.num_heads, self.num_levels,
                self.num_points)
        else:
            nq_eff = nq
            offsets = offsets.reshape(bsz, 1, nq, self.num_heads,
                                      self.num_levels, self.num_points, 2)
            attn = attn.reshape(bsz, 1, nq, self.num_heads,
                                self.num_levels, self.num_points)
            attn = jnp.broadcast_to(
                attn, (bsz, num_cam) + attn.shape[2:]).reshape(
                    bsz * num_cam, nq, self.num_heads, self.num_levels,
                    self.num_points)

        # Distribute the P sampling points across the query's Z anchors
        # (spatial_cross_attention.py:352-374); offsets broadcast over the
        # camera axis (dense) or are per-camera gathered rows (sparse),
        # reference points differ per camera.
        num_anchors = reference_points.shape[3]
        pts_per_anchor = self.num_points // num_anchors
        normalizer = jnp.asarray(
            [[w, h] for (h, w) in spatial_shapes], dtype=jnp.float32)
        offsets = offsets / normalizer[None, None, None, None, :, None, :]
        offsets = offsets.reshape(bsz, offsets.shape[1], nq_eff,
                                  self.num_heads, self.num_levels,
                                  pts_per_anchor, num_anchors, 2)
        ref = reference_points[:, :, :, None, None, None, :, :]
        locations = (ref + offsets).reshape(
            bsz * num_cam, nq_eff, self.num_heads, self.num_levels,
            self.num_points, 2)

        if self.deform_impl == "pallas":
            from ..ops.pallas_deform import ms_deform_attn_2d_pallas
            # compute-dtype values: bf16 rides the MXU fast path inside
            # the kernel; fp32 keeps the HIGHEST-precision exact path
            out = ms_deform_attn_2d_pallas(
                value.astype(self.dtype), spatial_shapes, locations, attn)
        elif self.deform_impl == "onehot":
            from ..ops.deform_attn import ms_deform_attn_2d_onehot
            # bf16-capable MXU path: values/interp matrices in compute
            # dtype, fp32 accumulation inside
            out = ms_deform_attn_2d_onehot(
                value.astype(self.dtype), spatial_shapes, locations, attn)
        else:
            out = ms_deform_attn_2d(value.astype(jnp.float32),
                                    spatial_shapes, locations, attn)
        return out.reshape(bsz, num_cam, nq_eff,
                           self.embed_dims).astype(self.dtype)


class SpatialCrossAttention(nn.Module):
    """Masked-dense multi-camera spatial cross-attention.

    Math-identical to the reference's sparse per-camera rebatch + scatter-add
    + count-normalise (spatial_cross_attention.py:137-176) but static-shaped.

    ``query_capacity`` > 0 enables the capacity-bounded sparse lift: per
    camera, the top-K visible queries (static K, ``lax.top_k`` on the
    visibility mask — stable, so the K slots are the lowest-index visible
    queries followed by pad rows) are gathered, the deformable attention
    runs on (B*cams, K) instead of (B*cams, nq), and contributions
    scatter-add back through a one-hot matmul.  Exact vs the dense path
    whenever every camera sees <= K queries (at the MP3D rig: <= 176 of
    900); overflow queries beyond K are silently dropped, so capacity must
    be validated against the dataset (geometry.max_visible_queries).
    """
    embed_dims: int = 768
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 8
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    deform_impl: str = "onehot"
    query_capacity: int = 0

    @nn.compact
    def __call__(self, query: jnp.ndarray, value: jnp.ndarray,
                 reference_points_cam: jnp.ndarray, bev_mask: jnp.ndarray,
                 spatial_shapes: Sequence[Tuple[int, int]],
                 query_pos: jnp.ndarray | None = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """query (B, nq, C); value (B, num_cam, nv, C);
        reference_points_cam (B, num_cam, nq, A, 2);
        bev_mask (B, num_cam, nq, A) bool."""
        bsz, nq, _ = query.shape
        num_cam = value.shape[1]
        residual = query
        if query_pos is not None:
            query = query + query_pos

        # Zero the reference coords only for queries invisible in ALL
        # anchors of a camera (their output is masked away below anyway).
        # Partially visible queries keep their true per-anchor coords: the
        # reference samples those as-is (rebatch gathers the whole query if
        # ANY anchor is visible, spatial_cross_attention.py:139-154), and
        # out-of-image anchors fall to grid_sample zero padding naturally.
        any_vis = jnp.any(bev_mask, axis=-1, keepdims=True)
        ref = jnp.where(any_vis[..., None], reference_points_cam, 0.0)
        qmask = jnp.any(bev_mask, axis=-1)                 # (B, cam, nq)

        deform = CamDeformableAttention(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            num_levels=self.num_levels, num_points=self.num_points,
            dtype=self.dtype, deform_impl=self.deform_impl,
            name="deformable_attention")

        cap = self.query_capacity
        if cap and cap < nq:
            # top_k on the 0/1 visibility is stable (equal values keep
            # index order): slots [0..n_vis) hold the visible queries,
            # the rest are pad rows whose contribution `valid` zeroes.
            _, idx = jax.lax.top_k(qmask.astype(jnp.float32), cap)
            valid = jnp.take_along_axis(qmask, idx, axis=-1)   # (B,cam,K)
            ref_k = jnp.take_along_axis(
                ref, idx[..., None, None], axis=2)     # (B, cam, K, A, 2)
            out_k = deform(query, value, ref_k, spatial_shapes,
                           gather_idx=idx)             # (B, cam, K, C)
            contrib = out_k * valid[..., None].astype(out_k.dtype)
            # scatter-add back over (cam, K) slots as a one-hot matmul
            # (fp32 accumulation — the deform-accumulation invariant)
            onehot = jax.nn.one_hot(idx, nq, dtype=contrib.dtype)
            slots = jnp.einsum(
                "bckn,bckd->bnd", onehot, contrib,
                precision=(jax.lax.Precision.HIGHEST
                           if contrib.dtype == jnp.float32
                           else jax.lax.Precision.DEFAULT),
                preferred_element_type=jnp.float32)
        else:
            # Offsets/weights are query-only -> computed once inside and
            # broadcast over cameras; every camera attends from all
            # queries; invisible contributions are masked away.
            attn_out = deform(query, value, ref, spatial_shapes)
            # fp32 cross-camera accumulation (the deform-accumulation
            # invariant; the capacity path's einsum above enforces the
            # same via preferred_element_type — a bf16 reduction here
            # would make the two documented-exact paths diverge)
            slots = jnp.sum(
                attn_out * qmask[..., None].astype(attn_out.dtype),
                axis=1, dtype=jnp.float32)             # (B, nq, C)

        # Per-query camera hit count (any anchor visible), as in
        # spatial_cross_attention.py:170-173.
        count = jnp.maximum(jnp.sum(qmask.astype(jnp.float32), axis=1), 1.0)
        slots = (slots.astype(jnp.float32)
                 / count[..., None]).astype(self.dtype)

        slots = nn.Dense(self.embed_dims, name="output_proj",
                         dtype=self.dtype)(slots)
        slots = nn.Dropout(self.dropout_rate)(
            slots, deterministic=deterministic)
        return slots + residual


class VoxelDeformableAttention3D(nn.Module):
    """3D deformable cross-attention of object queries over the voxel grid
    (reference VoxelCustomMSDeformableAttention, voxel_decoder.py:135-358).

    ``deform_impl='onehot'`` (default) samples via MXU one-hot matmuls —
    the gather path was 97.6% of the decoder's cost on TPU
    (tools/probe_decoder.py); 'gather' keeps the take_along_axis oracle."""
    embed_dims: int = 768
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    deform_impl: str = "onehot"   # 'gather' | 'onehot'

    @nn.compact
    def __call__(self, query: jnp.ndarray, value: jnp.ndarray,
                 reference_points: jnp.ndarray,
                 spatial_shapes: Sequence[Tuple[int, int, int]],
                 query_pos: jnp.ndarray | None = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """query (B, nq, C); value (B, nv, C);
        reference_points (B, nq, num_levels, 3) normalized (x, y, z)."""
        bsz, nq, _ = query.shape
        nv = value.shape[1]
        hd = self.embed_dims // self.num_heads
        identity = query
        if query_pos is not None:
            query = query + query_pos

        value = nn.Dense(self.embed_dims, name="value_proj",
                         dtype=self.dtype)(value)
        value = value.reshape(bsz, nv, self.num_heads, hd)

        offsets = nn.Dense(
            self.num_heads * self.num_levels * self.num_points * 3,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *a: _offset_grid_init_3d(
                self.num_heads, self.num_levels, self.num_points),
            name="sampling_offsets", dtype=jnp.float32)(query)
        offsets = offsets.reshape(bsz, nq, self.num_heads, self.num_levels,
                                  self.num_points, 3)

        attn = nn.Dense(self.num_heads * self.num_levels * self.num_points,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="attention_weights", dtype=jnp.float32)(query)
        attn = attn.reshape(bsz, nq, self.num_heads,
                            self.num_levels * self.num_points)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = attn.reshape(bsz, nq, self.num_heads, self.num_levels,
                            self.num_points)

        # offset normaliser is (w, h, d) (voxel_decoder.py:313-318)
        normalizer = jnp.asarray(
            [[w, h, d] for (d, h, w) in spatial_shapes], dtype=jnp.float32)
        locations = (reference_points[:, :, None, :, None, :]
                     + offsets / normalizer[None, None, None, :, None, :])

        if all(d == 1 for (d, _, _) in spatial_shapes):
            # decoder_on_bev: a depth-1 grid means 2D sampling.  The
            # reference routes this path through its 2D
            # CustomMSDeformableAttention over [[bev_h, bev_w]]
            # (voxel_transformer.py:263-285); a trilinear tap over depth 1
            # would attenuate features by a z-dependent 0.5-1.0 factor and
            # leak z gradients.  We keep the 3D offset parameterisation
            # (z component inert on this path) and sample bilinearly.
            from ..ops import ms_deform_attn_2d, ms_deform_attn_2d_onehot
            shapes_2d = tuple((h, w) for (_, h, w) in spatial_shapes)
            if self.deform_impl == "onehot":
                out = ms_deform_attn_2d_onehot(
                    value.astype(self.dtype), shapes_2d,
                    locations[..., :2], attn).astype(self.dtype)
            else:
                out = ms_deform_attn_2d(
                    value.astype(jnp.float32), shapes_2d,
                    locations[..., :2], attn).astype(self.dtype)
        elif self.deform_impl == "onehot":
            from ..ops import voxel_deform_attn_3d_onehot
            # A-matrices follow the compute dtype; the A@V contraction
            # accumulates fp32 on the MXU (deform-accumulation invariant)
            out = voxel_deform_attn_3d_onehot(
                value.astype(self.dtype), spatial_shapes,
                locations, attn).astype(self.dtype)
        else:
            out = voxel_deform_attn_3d(
                value.astype(jnp.float32), spatial_shapes,
                locations, attn).astype(self.dtype)
        out = nn.Dense(self.embed_dims, name="output_proj",
                       dtype=self.dtype)(out)
        out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        return out + identity


class MultiheadAttention(nn.Module):
    """Standard MHA with residual, matching mmcv's wrapper semantics.

    mmcv's deprecated ``dropout=0.1`` kwarg (vocc.py:149) sets BOTH the
    attention-prob dropout and the output ``dropout_layer`` applied
    before the residual add (``identity + dropout_layer(proj_drop(out))``
    in mmcv MultiheadAttention.forward), so both are applied here;
    proj_drop stays at its 0 default."""
    embed_dims: int = 768
    num_heads: int = 8
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key=None, value=None, query_pos=None,
                 key_pos=None, deterministic: bool = True):
        identity = query
        if key is None:
            key = query
        if value is None:
            value = key
        if key_pos is None and query_pos is not None \
                and query_pos.shape == key.shape:
            # mmcv's self-attention defaulting (MultiheadAttention.
            # forward): a pos-less key against a pos'd query would make
            # the q/k logits asymmetric where the reference's are not
            key_pos = query_pos
        if query_pos is not None:
            query = query + query_pos
        if key_pos is not None:
            key = key + key_pos
        # pass inputs_v only when it differs from key: flax warns on any
        # explicit square-last-two-dims inputs_v (mask-confusion guard)
        vkw = {} if value is key else {"inputs_v": value}
        out = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.embed_dims,
            out_features=self.embed_dims, dropout_rate=self.dropout_rate,
            dtype=self.dtype, name="attn")(
                query, inputs_k=key, deterministic=deterministic, **vkw)
        out = nn.Dropout(self.dropout_rate)(out,
                                            deterministic=deterministic)
        return out + identity
