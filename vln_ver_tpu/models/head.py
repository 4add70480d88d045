"""VoxelFormerOccupancyHead — multi-task head: 3D occupancy, 3D boxes,
room layout.

Reference: voxelformer_occupancy_head.py:31-640.  Forward modes map 1:1 to
the reference's branches (selected statically by config flags):

* ``only_bev``   — encoder only; returns the voxel embedding (head:310-321).
* ``only_occ``   — encoder + occupancy branch (head:323-370).
* ``only_det``   — encoder + decoder + det branches (head:372-434).
* ``add_layout`` — det + occ + layout branches (head:436-532).
* default        — det + occ (optionally coarse-to-fine refined occupancy,
  head:534-625).

Documented divergence from the reference: with ``refine_occ`` the reference
reinterprets the (bev_num, C) voxel embedding as a (C, Z, H, W) volume via a
raw ``.view`` (head:558,564), silently scrambling the channel/voxel axes
(the network trains through the fixed permutation).  We use the semantically
correct (Z, H, W, C) layout — same parameter count and FLOPs, sane geometry.

Occupancy flat ordering everywhere: ``z * (ydim * xdim) + y * xdim + x``.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from .config import VERConfig
from .positional import VoxelLearnedPositionalEncoding
from .transformer import VoxelTransformer


def _bias_init_with_prob(prob: float) -> float:
    return float(-math.log((1 - prob) / prob))


class ClsBranch(nn.Module):
    """(Dense, LN, ReLU) x num_fcs, Dense(out) with focal-prior bias
    (head:183-189, 269-279)."""
    embed_dims: int
    out_channels: int
    num_fcs: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_fcs):
            x = nn.Dense(self.embed_dims, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(x)
            x = nn.relu(x)
        return nn.Dense(
            self.out_channels, dtype=jnp.float32,
            bias_init=nn.initializers.constant(_bias_init_with_prob(0.01)),
            name="out")(x)


class LayoutBranch(nn.Module):
    """Dense+ReLU x num_fcs, Dense(code_size) (head:198-203)."""
    embed_dims: int
    code_size: int
    num_fcs: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_fcs):
            x = nn.Dense(self.embed_dims, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.code_size, dtype=jnp.float32, name="out")(x)


class OccBranch(nn.Module):
    """(Dense, LN, ReLU) x num_fcs, Dense(classes) (head:242-248)."""
    occ_dims: int
    out_channels: int
    num_fcs: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_fcs):
            x = nn.Dense(self.occ_dims, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(x)
            x = nn.relu(x)
        return nn.Dense(
            self.out_channels, dtype=jnp.float32,
            bias_init=nn.initializers.constant(_bias_init_with_prob(0.01)),
            name="out")(x)


class _UpStage(nn.Module):
    """One upsampler stage of the even-grid factorisation.

    The reference stage is ConvTranspose3d(C, C, k=(3,5,5), stride=(1,2,2),
    pad=(2,4,4), dilation=(2,2,2), output_padding=(0,1,1)) (head:254-258).
    With stride 2 and kernel dilation 2 every tap offset is even, so ALL
    kernel contributions land on even output rows/columns — odd positions
    receive only the bias (a deconv artifact the reference trains through).
    The identical function is a stride-1 correlation on the even grid

        even[j_y, j_x] = sum_k x[j + k - 2] * W[k]      (z: dilation 2)

    interleaved with constant bias planes.  For stages >= 2 the input
    itself has the odd-is-bias structure, so ``phase_conv`` further splits
    the correlation into 4 parity-phase convs over the informative subgrid
    (kernel slices W[:, py::2, px::2]) plus a batch-free bias profile —
    ~4x fewer MXU FLOPs again, and no interleaved intermediates in HBM.
    All paths are exact reformulations (parity test:
    tests/test_model_forward.py::test_upsampler_matches_conv_transpose).
    Param tree/init match nn.ConvTranspose ({kernel (3,5,5,C,C), bias}).
    """
    channels: int = 768
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # in/out channels are equal on this path (head:254-258)
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (3, 5, 5, self.channels, self.channels))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.channels,))

    def _conv(self, x, kernel, pad_y, pad_x):
        # fp32 mode must force HIGHEST: the default conv path multiplies
        # fp32 operands in bf16 passes (same trap as the MXU einsum,
        # STATUS.md) — ~1e-3 error that breaks reference-fidelity claims.
        prec = (jax.lax.Precision.HIGHEST
                if self.dtype == jnp.float32 else None)
        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)

        def zslab(xs, kz):
            # one z-size-1 kernel tap over a z-slab; no z padding
            return jax.lax.conv_general_dilated(
                xs, kz,
                window_strides=(1, 1, 1),
                padding=((0, 0), pad_y, pad_x),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                precision=prec)

        # The reference z-axis is kernel 3, dilation 2, pad (2, 2):
        # out[zo] = sum_k x[zo + 2k - 2] * W[k].  On the bev_z=4 grid
        # exactly one of the three taps per output plane lands in the
        # zero padding, so the naive 3D conv wastes 1/3 of its MXU work
        # multiplying zeros.  Decompose over the kernel z-index and
        # compute only the in-range (out_z, in_z) pairs: the k=1 (offset
        # 0) tap covers every plane; k=0 feeds out[2:] from x[:-2]; k=2
        # feeds out[:-2] from x[2:].  Exact reformulation (same parity
        # test vs flax ConvTranspose); at bev_z=4 it is 8 plane-convs
        # instead of 12.  Assembled with slice+add+concat — an earlier
        # .at[].add() form lowered to dynamic-update-slice copies that
        # cost ~16% throughput at batch 4 (bench 2026-08-19).
        z = xd.shape[1]
        mid = zslab(xd, kd[1:2])
        if z <= 2:
            return mid
        lo = zslab(xd[:, : z - 2], kd[0:1])   # feeds out[2:]
        hi = zslab(xd[:, 2:], kd[2:3])        # feeds out[:z-2]
        zeros2 = jnp.zeros_like(mid[:, :2])
        return (mid + jnp.concatenate([zeros2, lo], axis=1)
                    + jnp.concatenate([hi, zeros2], axis=1))

    def even_conv(self, x):
        """Dense input (stage 1): the full even-grid correlation."""
        return self._conv(x, self.kernel, (2, 2), (2, 2))

    def phase_conv(self, e, prev_bias):
        """Input with odd-is-bias structure (stages >= 2): ``e`` is the
        previous stage's even grid WITHOUT its bias, ``prev_bias`` that
        bias.  Returns this stage's even grid (without own bias)."""
        b, z, m_y, m_x, c = e.shape
        w = self.kernel
        phases = []
        for py, pad_y in ((0, (1, 1)), (1, (0, 1))):
            row = []
            for px, pad_x in ((0, (1, 1)), (1, (0, 1))):
                row.append(self._conv(e, w[:, py::2, px::2], pad_y, pad_x))
            phases.append(row)
        # even[2t+p] interleave per axis: x then y
        rows = [jnp.stack(r, axis=4).reshape(b, z, m_y, 2 * m_x, c)
                for r in phases]
        even = jnp.stack(rows, axis=3).reshape(b, z, 2 * m_y, 2 * m_x, c)

        # bias-input contribution: prev_bias at EVERY in-range lattice
        # position, zero-padded outside -> a batch-free spatial profile
        # conv(range-mask, sum_cin W * prev_bias)
        wb = jnp.einsum("zyxio,i->zyxo", w.astype(jnp.float32),
                        prev_bias.astype(jnp.float32))
        mask = jnp.ones((1, z, 2 * m_y, 2 * m_x, 1), self.dtype)
        prof = self._conv(mask, wb[:, :, :, None, :], (2, 2), (2, 2))
        return even + prof.astype(even.dtype)

    def interleave(self, even):
        """even grid + own bias at (2j_y, 2j_x); bias everywhere else."""
        b, z, h, w, c = even.shape
        bias = self.bias.astype(even.dtype)
        ev = even + bias
        fill = jnp.broadcast_to(bias, ev.shape)
        row = jnp.stack([ev, fill], axis=4).reshape(b, z, h, 2 * w, c)
        fill_row = jnp.broadcast_to(bias, row.shape)
        return jnp.stack([row, fill_row], axis=3).reshape(
            b, z, 2 * h, 2 * w, c)

    def __call__(self, x):  # standalone dense stage (tests/fallback)
        return self.interleave(self.even_conv(x))


class OccUpsampler(nn.Module):
    """Coarse-to-fine 15->120 (h, w) stack (head:254-258): three stages,
    each doubling (h, w) and preserving z.  Stages communicate in the
    compact (informative-subgrid, bias) representation — see _UpStage —
    and only the final stage interleaves to the full lattice."""
    channels: int = 768
    num_stages: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.stages = [_UpStage(self.channels, dtype=self.dtype,
                                name=f"up{i}")
                       for i in range(self.num_stages)]

    def informative(self, x):
        """Returns (e, last_bias): the final informative even grid WITHOUT
        its own bias (B, Z, H*2^{n-1}, W*2^{n-1}, C) and that bias (C,).
        The full output is ``interleave(e)`` = e+bias at even (y, x)
        positions and pure bias elsewhere — the bias-aware occupancy path
        exploits that structure instead of materialising the volume."""
        e = self.stages[0].even_conv(x)
        for i in range(1, self.num_stages):
            e = self.stages[i].phase_conv(e, self.stages[i - 1].bias)
        return e, self.stages[-1].bias

    def __call__(self, x):
        # x: (B, Z, H, W, C) dense
        e, _ = self.informative(x)
        return self.stages[-1].interleave(e)


class VoxelFormerOccupancyHead(nn.Module):
    cfg: VERConfig

    def setup(self):
        cfg = self.cfg
        self.voxel_embedding = self.param(
            "voxel_embedding", nn.initializers.normal(1.0),
            (cfg.bev_num, cfg.embed_dims))
        self.positional_encoding = VoxelLearnedPositionalEncoding(
            cfg.embed_dims, cfg.bev_z, cfg.bev_h, cfg.bev_w,
            dtype=cfg.dtype, name="positional_encoding")
        self.transformer = VoxelTransformer(cfg, name="transformer")
        if not cfg.only_occ:
            self.query_embedding = self.param(
                "query_embedding", nn.initializers.normal(1.0),
                (cfg.num_query, cfg.embed_dims * 2))
            self.query_layout_embedding = self.param(
                "query_layout_embedding", nn.initializers.normal(1.0),
                (cfg.num_layout_query, cfg.embed_dims * 2))
            self.cls_branches = [
                ClsBranch(cfg.embed_dims, cfg.num_classes, cfg.num_reg_fcs,
                          dtype=cfg.dtype, name=f"cls_branch_{i}")
                for i in range(cfg.decoder_layers)
            ]
            if cfg.add_layout:
                self.layout_branches = [
                    LayoutBranch(cfg.embed_dims, cfg.code_size,
                                 cfg.num_reg_fcs, dtype=cfg.dtype,
                                 name=f"layout_branch_{i}")
                    for i in range(cfg.decoder_layers)
                ]
        if not cfg.only_det:
            if cfg.bev_z == cfg.occ_zdim:
                self.occ_proj = nn.Dense(cfg.occ_dims, dtype=cfg.dtype,
                                         name="occ_proj")
            else:
                self.occ_proj = nn.Dense(cfg.occ_dims * cfg.occ_zdim,
                                         dtype=cfg.dtype, name="occ_proj")
            self.occ_branches = OccBranch(
                cfg.occ_dims, cfg.occupancy_classes, cfg.num_occ_fcs,
                dtype=cfg.dtype, name="occ_branches")
            if cfg.refine_occ:
                # each stage doubles (h, w); the reference's 15 -> 120 is 3
                # stages (head:254-258) — derive from the grids so tiny test
                # configs work too
                ratio = cfg.occ_xdim // cfg.bev_w
                stages = (max(int(round(math.log2(ratio))), 0)
                          if ratio >= 1 else 0)
                if (stages == 0
                        or cfg.bev_w * 2 ** stages != cfg.occ_xdim
                        or cfg.bev_h * 2 ** stages != cfg.occ_ydim):
                    # stages == 0 covers both occ <= bev (would otherwise
                    # die in math.log2) and occ == bev (an empty upsampler
                    # the reference cannot express — its up_sample is a
                    # fixed 3-stage stack)
                    raise ValueError(
                        "refine_occ requires occ_(x|y)dim = bev_(w|h) * "
                        "2^k with k >= 1"
                        f" (got bev {cfg.bev_h}x{cfg.bev_w}, occ "
                        f"{cfg.occ_ydim}x{cfg.occ_xdim})")
                self.up_sample = OccUpsampler(
                    cfg.embed_dims, num_stages=stages, dtype=cfg.dtype,
                    name="up_sample")

    # ------------------------------------------------------------------
    def _occ_logits_grid(self, x):
        """x (B, Z, h, w, C) voxel features -> occupancy logits
        (B, occ_z, h, w, n_out); occ_proj + MLP are pointwise over (h, w)
        cells so the grid size is free (the bias-aware path runs this on
        the informative subgrid + a single bias cell)."""
        cfg = self.cfg
        b, z, h, w, c = x.shape
        if cfg.bev_z == cfg.occ_zdim:
            occ = self.occ_proj(x)  # (B, Z, h, w, occ_dims)
            return self.occ_branches(occ)
        # fuse the z axis: (B, h, w, Z*C) -> (B, h, w, occ_z*occ_dims)
        x = x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, z * c)
        occ = self.occ_proj(x)
        occ = occ.reshape(b, h, w, cfg.occ_zdim, cfg.occ_dims)
        logits = self.occ_branches(occ)     # (B, h, w, occ_z, n)
        return logits.transpose(0, 3, 1, 2, 4)

    def _occupancy_from_voxels(self, voxel_embed, refined: bool,
                               spatial_hw=None):
        """voxel_embed (B, bev_num, C) or refined (B, Z, H', W', C) ->
        occupancy logits (B, n_vox_out, occupancy_classes) flattened
        z-major, y, x."""
        cfg = self.cfg
        if refined:
            x = voxel_embed  # (B, Z, H', W', C)
        else:
            x = voxel_embed.reshape(-1, cfg.bev_z, cfg.bev_h, cfg.bev_w,
                                    cfg.embed_dims)
        logits = self._occ_logits_grid(x)
        return logits.reshape(logits.shape[0], -1, logits.shape[-1])

    def _occupancy_dispatch(self, bev_embed, b):
        """The one owner of the refine_occ / occ_layout resolution
        dispatch — shared by the full forward and the only_occ branch so
        both emit the SAME voxel count for a given config."""
        cfg = self.cfg
        if not cfg.refine_occ:
            return self._occupancy_from_voxels(bev_embed, refined=False)
        if cfg.occ_layout == "ref":
            return self._occupancy_ref_layout(bev_embed)
        if cfg.occ_layout == "zhwc_dense":
            # naive upsample-then-project — the oracle for the
            # bias-aware path (tests/test_occ_bias_aware.py)
            vol = bev_embed.reshape(b, cfg.bev_z, cfg.bev_h,
                                    cfg.bev_w, cfg.embed_dims)
            vol = self.up_sample(vol)  # (B, Z, occ_y, occ_x, C)
            return self._occupancy_from_voxels(vol, refined=True)
        return self._occupancy_refined_bias_aware(bev_embed)

    def _occupancy_refined_bias_aware(self, bev_embed):
        """Bias-aware refine_occ (exact reformulation of
        upsample-then-project, tests/test_occ_bias_aware.py).

        The upsampler's final interleave places informative features only
        at even (y, x) positions — every odd-coordinate cell is the pure
        stage bias (a deconv artifact the reference trains through, see
        _UpStage).  So occ_proj (the single biggest occ-half matmul:
        3072->4480 over 120x120 cells = 1.6 TFLOP at vocc.py shape) and
        the occupancy MLP run on the 60x60 informative grid plus ONE bias
        cell, and the results interleave at the LOGITS level — ~4x less
        projection work and the (B, Z, 120, 120, 768) dense volume
        (339 MB bf16 at batch 4) never exists in HBM.
        """
        cfg = self.cfg
        b = bev_embed.shape[0]
        vol = bev_embed.reshape(b, cfg.bev_z, cfg.bev_h, cfg.bev_w,
                                cfg.embed_dims)
        e, last_bias = self.up_sample.informative(vol)
        bias = last_bias.astype(e.dtype)
        even_logits = self._occ_logits_grid(e + bias)
        bias_vol = jnp.broadcast_to(
            bias, (1, cfg.bev_z, 1, 1, cfg.embed_dims))
        bias_logits = self._occ_logits_grid(bias_vol)  # (1, occ_z, 1, 1, n)
        _, oz, h2, w2, n = even_logits.shape
        fill = jnp.broadcast_to(bias_logits, (b, oz, h2, w2, n))
        row = jnp.stack([even_logits, fill], axis=4).reshape(
            b, oz, h2, 2 * w2, n)
        fill_row = jnp.broadcast_to(bias_logits, row.shape)
        full = jnp.stack([row, fill_row], axis=3).reshape(
            b, oz, 2 * h2, 2 * w2, n)
        return full.reshape(b, -1, n)

    def _occupancy_ref_layout(self, bev_embed):
        """Reference-compatible refine_occ pipeline (cfg.occ_layout='ref').

        Reproduces the reference's raw ``.view`` reinterpretations exactly,
        per sample (head:558 ``view(bs, C, Z, H, W)`` over a (bev_num, C)
        buffer — a channel/voxel scramble the reference network trains
        through; head:564 ``view(bs, Z, occ_x, occ_y, C)`` over the conv
        output — a second reinterpretation; head:570-577 the z-fused
        occ_proj with the refine-path x/y axis order).  Needed so weights
        converted from a reference checkpoint produce the reference's
        occupancy volumes.
        """
        cfg = self.cfg
        b = bev_embed.shape[0]
        c, z = cfg.embed_dims, cfg.bev_z
        # scramble 1: flat (bev_num*C) buffer reinterpreted as (C, Z, H, W)
        t = bev_embed.reshape(b, c, z, cfg.bev_h, cfg.bev_w)
        u = self.up_sample(t.transpose(0, 2, 3, 4, 1))  # NDHWC in/out
        u = u.transpose(0, 4, 1, 2, 3)  # back to the reference's NCDHW
        # scramble 2: flat conv output reinterpreted as (Z, occ_x, occ_y, C)
        v = u.reshape(b, z, cfg.occ_xdim, cfg.occ_ydim, c)
        if cfg.bev_z == cfg.occ_zdim:
            # the reference's equal-z refine path projects the 5D volume
            # directly (head:567-568) — no z-fusing; flat order is then
            # z-major over the (occ_x, occ_y) scramble (head:578-580)
            occ = self.occ_proj(v)  # (B, Z, occ_x, occ_y, occ_dims)
            occ = occ.reshape(b, -1, cfg.occ_dims)
        else:
            v = v.transpose(0, 2, 3, 1, 4).reshape(
                b, cfg.occ_xdim, cfg.occ_ydim, z * c)
            occ = self.occ_proj(v)
            occ = occ.reshape(b, cfg.occ_xdim, cfg.occ_ydim, cfg.occ_zdim,
                              cfg.occ_dims)
            occ = occ.transpose(0, 3, 1, 2, 4).reshape(b, -1, cfg.occ_dims)
        return self.occ_branches(occ)

    def _decode_coords(self, raw_preds, refs_before, value_range):
        """Per-layer box decode (head:587-606): xy/z offsets added to
        inverse-sigmoid refs, sigmoided, scaled to ``value_range``; the
        remaining code dims stay raw."""
        from .decoder import inverse_sigmoid

        lo = jnp.asarray(value_range[:3], dtype=jnp.float32)
        hi = jnp.asarray(value_range[3:], dtype=jnp.float32)
        xy = jax.nn.sigmoid(raw_preds[..., 0:2]
                            + inverse_sigmoid(refs_before[..., 0:2]))
        z = jax.nn.sigmoid(raw_preds[..., 4:5]
                           + inverse_sigmoid(refs_before[..., 2:3]))
        cx = xy[..., 0:1] * (hi[0] - lo[0]) + lo[0]
        cy = xy[..., 1:2] * (hi[1] - lo[1]) + lo[1]
        cz = z * (hi[2] - lo[2]) + lo[2]
        return jnp.concatenate(
            [cx, cy, raw_preds[..., 2:4], cz, raw_preds[..., 5:]], axis=-1)

    # ------------------------------------------------------------------
    def __call__(self, features, world2pixel, origin_shift,
                 prev_bev=None, tsa_shift=None,
                 deterministic: bool = True, only_bev: bool = False):
        """features (B, num_cams, feat_h, feat_w, C); world2pixel
        (B, num_cams, 4, 4); origin_shift (B, 3); prev_bev optional
        (B, bev_num, C) voxel grid of the previous frame (TSA queue).

        Returns a dict mirroring the reference's ``outs`` (head:615-625).
        """
        cfg = self.cfg
        b = features.shape[0]
        voxel_queries = jnp.broadcast_to(
            self.voxel_embedding[None], (b,) + self.voxel_embedding.shape
        ).astype(cfg.dtype)
        # positional encoding is the TSA query_pos; inert on the active
        # (non-temporal) path — see encoder.py docstring.
        bev_pos = (self.positional_encoding(b)
                   if cfg.use_temporal_self_attn else None)

        if only_bev or cfg.only_occ:
            bev_embed, sca_overflow = self.transformer.get_voxel_features(
                features, voxel_queries, world2pixel, origin_shift,
                prev_bev=prev_bev, bev_pos=bev_pos, tsa_shift=tsa_shift,
                deterministic=deterministic)
            if only_bev:
                return {"bev_embed": bev_embed,
                        "sca_overflow": sca_overflow}
            # SAME resolution dispatch as the full forward below —
            # only_occ with refine_occ=True (the default) must emit
            # voxel_num rows, not the coarse grid, or the occ loss /
            # eval reshape against occ_dense crashes
            occupancy_preds = self._occupancy_dispatch(bev_embed, b)
            return {
                "bev_embed": bev_embed,
                "all_cls_scores": None,
                "all_bbox_preds": None,
                "all_layout_preds": None,
                "occupancy_preds": occupancy_preds,
                "flow_preds": None,
                "sca_overflow": sca_overflow,
            }

        bev_embed, hs, raw_preds, refs_before, sca_overflow = \
            self.transformer(
            features, voxel_queries, self.query_embedding,
            world2pixel, origin_shift, prev_bev=prev_bev, bev_pos=bev_pos,
            tsa_shift=tsa_shift, deterministic=deterministic)

        all_cls_scores = jnp.stack([
            self.cls_branches[l](hs[l]) for l in range(cfg.decoder_layers)
        ])
        all_bbox_preds = self._decode_coords(raw_preds, refs_before,
                                             cfg.pc_range)

        all_layout_preds = None
        # the reference's `elif self.only_det:` branch takes precedence
        # over add_layout and returns all_layout_preds=None (head:372-434)
        if cfg.add_layout and not cfg.only_det:
            raw_layout = jnp.stack([
                self.layout_branches[l](hs[l])
                for l in range(cfg.decoder_layers)
            ])
            all_layout_preds = self._decode_coords(raw_layout, refs_before,
                                                   cfg.layout_range)

        occupancy_preds = None
        if not cfg.only_det:
            occupancy_preds = self._occupancy_dispatch(bev_embed, b)

        return {
            "bev_embed": bev_embed,
            "all_cls_scores": all_cls_scores,
            "all_bbox_preds": all_bbox_preds,
            "all_layout_preds": all_layout_preds,
            "occupancy_preds": occupancy_preds,
            "flow_preds": None,
            "sca_overflow": sca_overflow,
        }
