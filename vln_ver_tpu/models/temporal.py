"""Voxel temporal self-attention (TSA) — the episodic-memory substrate.

Reference: ``VoxelTemporalSelfAttention``
(voxel_temporal_self_attention.py:26-273).  The current voxel queries attend
with 3D deformable sampling into a 2-slot BEV queue (previous / current
voxel grid); offsets and weights are predicted from the concatenation of the
previous grid's features and the query (":197"), per-queue-slot weights are
softmaxed over (levels*points), and the two slots' outputs are averaged
(":262-263") before the output projection.

Inert in the reference's active MP3D config (prev_bev forced None,
voxelformer.py:294,336-345) but part of the capability surface — the
substrate for the paper's episodic memory.  Enabled here via
``VERConfig.use_temporal_self_attn``.

Note: the reference's ``init_weights`` for this module is broken (2D
directional grid of size H*(L*queue)*P*2 assigned to a bias of size
queue*H*L*P*3 — it would throw if ever constructed); we use the 3D
(cos, sin, cos+sin) directional init of the decoder's 3D attention instead.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import (voxel_deform_attn_3d,
                   voxel_deform_attn_3d_onehot)
from .attention import _offset_grid_init_3d


class VoxelTemporalSelfAttention(nn.Module):
    embed_dims: int = 768
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    num_bev_queue: int = 2
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    deform_impl: str = "onehot"   # 'gather' | 'onehot' (parity-tested)

    @nn.compact
    def __call__(self, query: jnp.ndarray,
                 prev_bev: Optional[jnp.ndarray],
                 reference_points: jnp.ndarray,
                 spatial_shapes: Sequence[Tuple[int, int, int]],
                 query_pos: Optional[jnp.ndarray] = None,
                 frame_query: Optional[jnp.ndarray] = None,
                 shift: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """query (B, nq, C); prev_bev (B, nq, C) or None;
        reference_points (B, nq, num_levels, 3) normalised voxel centres;
        frame_query: the FRAME-INITIAL voxel grid (see below);
        shift (B, 3): normalised ego-motion of the prev frame's grid.

        Value-slot semantics match the reference exactly:
        - values NEVER include query_pos — the reference builds them
          before the pos add (voxel_temporal_self_attention.py:177-187);
        - with prev_bev, the 'current' slot is the frame-initial
          bev_query stacked ONCE before the encoder's layer loop
          (voxel_encoder.py:261-263), not the per-layer evolving query —
          passed here as ``frame_query``; without prev_bev both slots
          are the layer's incoming (pos-less) query;
        - slot-0 reference points are shifted by ``shift`` only when
          prev_bev is given (voxel_encoder.py:252-269's hybird refs).
        The offset/weight conditioning concatenates [prev-slot value,
        pos-added query] PER SAMPLE — the reference's ``value[:bs]``
        (":197") interleaves (batch, slot) rows and only selects each
        sample's prev slot at bs=1, its tested regime; this is the
        correct batched generalisation of that intent."""
        bsz, nq, c = query.shape
        queue = self.num_bev_queue
        assert queue == 2
        identity = query
        raw = query  # pos-less: the value/source grid
        if query_pos is not None:
            query = query + query_pos
        if prev_bev is not None:
            prev = prev_bev
            cur = frame_query if frame_query is not None else raw
            ref_prev = (reference_points if shift is None
                        else reference_points + shift[:, None, None, :])
        else:
            prev = cur = raw
            ref_prev = reference_points
        # (B*queue, nq, C): slot 0 = prev, slot 1 = current, (b, slot) rows
        value = jnp.stack([prev, cur], axis=1).reshape(
            bsz * queue, nq, c)

        q_cat = jnp.concatenate([prev, query], axis=-1)  # (B, nq, 2C)

        hd = self.embed_dims // self.num_heads
        v = nn.Dense(self.embed_dims, name="value_proj",
                     dtype=self.dtype)(value)
        v = v.reshape(bsz * queue, nq, self.num_heads, hd)

        n_off = queue * self.num_heads * self.num_levels * self.num_points

        def _bias_init(*a):
            # per-head grid repeated per queue slot WITHIN each head — the
            # reshape below is heads-major (..., heads, queue, L, P, 3)
            g = _offset_grid_init_3d(self.num_heads, self.num_levels,
                                     self.num_points).reshape(
                self.num_heads, 1, -1)
            return jnp.tile(g, (1, queue, 1)).reshape(-1)

        offsets = nn.Dense(
            n_off * 3,
            kernel_init=nn.initializers.zeros,
            bias_init=_bias_init,
            name="sampling_offsets", dtype=jnp.float32)(q_cat)
        offsets = offsets.reshape(bsz, nq, self.num_heads, queue,
                                  self.num_levels, self.num_points, 3)
        attn = nn.Dense(n_off, kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="attention_weights", dtype=jnp.float32)(q_cat)
        attn = attn.reshape(bsz, nq, self.num_heads, queue,
                            self.num_levels * self.num_points)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = attn.reshape(bsz, nq, self.num_heads, queue,
                            self.num_levels, self.num_points)

        # fold queue into batch (":219-222")
        attn = attn.transpose(0, 3, 1, 2, 4, 5).reshape(
            bsz * queue, nq, self.num_heads, self.num_levels,
            self.num_points)
        offsets = offsets.transpose(0, 3, 1, 2, 4, 5, 6).reshape(
            bsz * queue, nq, self.num_heads, self.num_levels,
            self.num_points, 3)

        normalizer = jnp.asarray(
            [[w, h, d] for (d, h, w) in spatial_shapes], jnp.float32)
        # batch-major queue fold (row = b*queue + slot), matching the
        # value/offset folding: slot 0 samples the prev grid at the
        # ego-shifted refs, slot 1 the current grid at the plain refs
        ref = jnp.stack([ref_prev, reference_points], axis=1).reshape(
            bsz * queue, nq, reference_points.shape[2], 3)
        locations = (ref[:, :, None, :, None, :]
                     + offsets / normalizer[None, None, None, :, None, :])

        # same impl dispatch as the decoder's 3D deform: the MXU
        # one-hot default avoids the take_along_axis gathers that
        # dominated the decoder's cost (tools/probe_decoder.py);
        # 'gather' stays as the oracle
        sample = (voxel_deform_attn_3d if self.deform_impl == "gather"
                  else voxel_deform_attn_3d_onehot)
        out = sample(v.astype(jnp.float32), spatial_shapes,
                     locations, attn)
        # average prev/current slots (":262-263")
        out = out.reshape(bsz, queue, nq, self.embed_dims).mean(axis=1)
        out = nn.Dense(self.embed_dims, name="output_proj",
                       dtype=self.dtype)(out.astype(self.dtype))
        out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        return out + identity
