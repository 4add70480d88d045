"""Static model configuration for the VER stack.

One frozen dataclass drives every module; defaults reproduce the active
reference config (projects/configs/verformer/vocc.py).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

# MP3D's focal-mode REAL semantic class count (vocc.py:44-46: 16 classes
# + empty handled as an extra sigmoid threshold, not a channel).  A
# ce_loss config carrying exactly this count is near-certainly a copied
# focal config that forgot ce mode needs empty INCLUDED as the last
# channel (17 for MP3D) — the guard in VERConfig.__post_init__ and the
# file-config affirmation in config/api.py both key off this constant.
MP3D_FOCAL_REAL_CLASSES = 16


@dataclasses.dataclass(frozen=True)
class VERConfig:
    # -- grid geometry (vocc.py:9-14) --
    pc_range: Tuple[float, ...] = (-6.0, -6.0, -1.5, 6.0, 6.0, 2.0)
    bev_z: int = 4
    bev_h: int = 15
    bev_w: int = 15
    occupancy_size: Tuple[float, float, float] = (0.1, 0.1, 0.1)

    # -- inputs (voxelformer.py:282-289; ViT-B/16 patch features) --
    num_cams: int = 6
    feat_h: int = 14
    feat_w: int = 14
    in_channels: int = 768

    # -- transformer (vocc.py:107-166) --
    embed_dims: int = 768
    num_heads: int = 8
    encoder_layers: int = 3
    sca_num_points: int = 8       # per-query sampling points in SCA
    decoder_layers: int = 6
    decoder_num_points: int = 4   # VoxelCustomMSDeformableAttention default
    num_levels: int = 1
    ffn_dim: int = 1536           # _ffn_dim_ = 2 * embed
    dropout_rate: float = 0.1

    # -- queries / classes (vocc.py:19,38-46,94-104) --
    num_query: int = 100
    num_layout_query: int = 10
    num_classes: int = 17
    occupancy_classes: int = 16
    code_size: int = 10
    num_reg_fcs: int = 2
    num_occ_fcs: int = 2
    occ_dims: int = 128
    # NMSFreeCoder decode params (vocc.py bbox_coder dict)
    bbox_max_num: int = 50
    post_center_range: Tuple[float, ...] = (-10.0, -10.0, -5.0,
                                            10.0, 10.0, 5.0)
    # loss weights (vocc.py loss_cls/loss_bbox/loss_occupancy dicts)
    loss_cls_weight: float = 2.0
    loss_bbox_weight: float = 0.25
    loss_occ_weight: float = 1.0
    loss_layout_weight: float = 0.25

    # -- mode flags (vocc.py:15-17, head kwargs) --
    only_occ: bool = False
    only_det: bool = False
    add_layout: bool = False
    refine_occ: bool = True
    # Occupancy-volume memory layout on the refine_occ path:
    #   'zhwc' (default) — semantically correct (Z, H, W, C) volume,
    #     computed bias-aware: occ_proj/MLP on the informative subgrid
    #     only (head._occupancy_refined_bias_aware).
    #   'zhwc_dense'     — same semantics via the naive dense volume
    #     (test oracle for the bias-aware path).
    #   'ref'            — bit-exact reproduction of the reference's raw
    #     ``.view`` reinterpretations (head:558,564,573), which scramble the
    #     channel/voxel axes.  Required to run checkpoints trained with the
    #     reference (the convs there learned the scrambled layout); applied
    #     per-sample (the reference always runs bs=1 on MP3D — its view
    #     would additionally mix batch elements at bs>1).
    occ_layout: str = "zhwc"
    with_box_refine: bool = True
    occ_loss_type: str = "focal_loss"
    # ce-mode convention affirmation (see __post_init__): set True only
    # when a ce_loss config's occupancy_classes == 16 genuinely already
    # counts the empty class as its last channel
    occ_ce_includes_empty: bool = False
    # temporal self-attention over a 2-slot BEV queue (the reference's
    # VoxelTemporalSelfAttention path, op order self_attn->norm->cross_attn
    # ->norm->ffn->norm; inert in the active MP3D config)
    use_temporal_self_attn: bool = False
    tsa_num_points: int = 4
    num_bev_queue: int = 2
    # collapse the voxel grid to BEV before the decoder
    # (voxel_transformer.py:263-285; off in the active config)
    decoder_on_bev: bool = False
    voxel_2_bev_type: str = "mlp"   # 'mlp' | 'pool'
    layout_range: Tuple[float, ...] = (-50.0, -50.0, -5.0, 50.0, 50.0, 5.0)

    # -- TPU execution --
    # compute dtype for the transformer stack; projections/losses stay fp32
    dtype: jnp.dtype = jnp.float32
    # deformable sampling implementation for the encoder's SCA:
    #   'gather' — take_along_axis oracle; 'onehot' — MXU one-hot matmul;
    #   'pallas' — fused Pallas kernel
    deform_impl: str = "onehot"
    # rematerialize each encoder layer in the backward pass
    # (jax.checkpoint): trades ~1 extra forward of the encoder for not
    # storing its activations — enables larger train batches at the
    # 36-view shape.  Numerically identical (tests/test_train_step.py).
    remat_encoder: bool = False
    # capacity-bounded sparse lift: per camera, gather only the top-K
    # visible voxel queries (static K) before the deformable attention and
    # scatter-add the results back — the static-shape TPU analog of the
    # reference's data-dependent per-camera rebatch
    # (spatial_cross_attention.py:137-154).  Math-identical to the
    # masked-dense path whenever every camera sees <= K queries
    # (tests/test_sparse_lift.py); EXCEEDING K silently drops the
    # lowest-index overflow queries, so validate against the dataset with
    # geometry.max_visible_queries / tools/check_query_capacity.py first.
    # 0 = dense (default).  At the MP3D rig a camera sees <= 176 of the
    # 900 queries, so K=256 cuts the per-camera deform work 3.5x.
    sca_query_capacity: int = 0

    def __post_init__(self):
        # CE-mode occupancy labeling trap (train/objective.py folds the
        # empty label into the LAST channel): in ce_loss mode the channel
        # set must INCLUDE empty as its last channel (reference
        # voxelformer_occupancy_head.py:1527-1533 keeps argmax <
        # occupancy_classes-1), but the dataclass default
        # occupancy_classes=16 is the focal-mode REAL-class count for
        # MP3D — combining the two silently aliases real class 15 with
        # empty.
        if self.occ_loss_type == "ce_loss" and not self.occ_ce_includes_empty:
            if self.occupancy_classes == MP3D_FOCAL_REAL_CLASSES:
                # 16 is the focal-mode MP3D REAL-class default: combining
                # it with ce_loss is near-certainly the aliasing trap
                raise ValueError(
                    "occ_loss_type='ce_loss' with occupancy_classes=16: "
                    "ce mode needs occupancy_classes to include the empty "
                    "class as its last channel (MP3D: 17 = 16 semantic + "
                    "empty). If 16 really is your including-empty count, "
                    "set occ_ce_includes_empty=True.")
            # any other count: the convention can't be verified from the
            # number alone — surface it instead of trusting silently
            # (reference-style ce configs already follow it, see
            # occupancy.py::occupancy_num_classes)
            import warnings
            warnings.warn(
                f"occ_loss_type='ce_loss' with occupancy_classes="
                f"{self.occupancy_classes}: ce mode treats the LAST "
                "channel as the empty class — make sure this count "
                "INCLUDES empty (real classes + 1), or real class "
                f"{self.occupancy_classes - 1} silently aliases empty. "
                "Set occ_ce_includes_empty=True to affirm and silence "
                "this warning.", stacklevel=2)

    @property
    def use_pallas(self) -> bool:
        return self.deform_impl == "pallas"

    @property
    def bev_num(self) -> int:
        return self.bev_z * self.bev_h * self.bev_w

    @property
    def occ_zdim(self) -> int:
        return round((self.pc_range[5] - self.pc_range[2])
                     / self.occupancy_size[2])

    @property
    def occ_ydim(self) -> int:
        return round((self.pc_range[4] - self.pc_range[1])
                     / self.occupancy_size[1])

    @property
    def occ_xdim(self) -> int:
        return round((self.pc_range[3] - self.pc_range[0])
                     / self.occupancy_size[0])

    @property
    def voxel_num(self) -> int:
        return self.occ_zdim * self.occ_ydim * self.occ_xdim

    @property
    def head_dim(self) -> int:
        return self.embed_dims // self.num_heads
