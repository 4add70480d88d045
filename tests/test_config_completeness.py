"""Config front-end completeness: every key the reference ``vocc.py`` sets
in the model dict must be either CONSUMED by ``build_ver_config`` (verified
by instrumenting dict access) or EXPLICITLY listed as ignored with a
reason — silent default-fallback on a reference key is the config-bug class
the north star's "run unchanged" clause exists to prevent (round-1 verdict
weak #7).
"""

import os

from vln_ver_tpu.config import build_ver_config, load_config

VOCC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs", "verformer", "vocc.py")

# dotted paths under model.* that the front-end deliberately does not read.
# prefix match; every entry carries its justification.
IGNORED = {
    "model.type": "single detector family; selected statically",
    "model.use_grid_mask": "backbone-image augmentation; dead with "
                           "precomputed ViT features (SURVEY §0.2)",
    "model.video_test_mode": "temporal queue is driven by "
                             "obtain_history_bev args, not a flag",
    "model.use_occ_gts": "occ GT presence is a dataset property here",
    "model.only_occ": "duplicated on the head; head key is consumed",
    "model.only_det": "duplicated on the head; head key is consumed",
    "model.pretrained": "torchvision resnet50 init for the dead backbone",
    "model.img_backbone": "dead: dataset supplies precomputed ViT features"
                          " (voxelformer.py:282-289)",
    "model.img_neck": "dead: same",
    "model.train_cfg": "assigner costs fixed to the reference formulas in "
                       "losses.py/matching.py (tested vs mmdet)",
    "model.pts_bbox_head.type": "single head family",
    "model.pts_bbox_head.sync_cls_avg_factor": "global sums under pjit "
        "replace explicit all-reduce mean (losses.py docstring)",
    "model.pts_bbox_head.as_two_stage": "always False in every reference "
        "config; two-stage is unimplemented upstream too",
    "model.pts_bbox_head.getbev": "consumed by tools/get_occ.py (savename)",
    "model.pts_bbox_head.positional_encoding": "our encoding derives dims "
        "from bev_z/h/w + embed_dims; inert on the active path "
        "(encoder.py docstring)",
    "model.pts_bbox_head.loss_cls.type": "focal loss fixed (use_sigmoid "
        "gamma/alpha read below)",
    "model.pts_bbox_head.loss_cls.use_sigmoid": "always sigmoid focal",
    "model.pts_bbox_head.loss_cls.gamma": "reference default 2.0 fixed in "
        "losses.py (tested vs mmdet formula)",
    "model.pts_bbox_head.loss_cls.alpha": "reference default 0.25 fixed",
    "model.pts_bbox_head.loss_bbox.type": "L1 fixed",
    "model.pts_bbox_head.loss_iou": "weight 0.0 in every reference config "
        "— a fake cost for DETRHead compat",
    "model.pts_bbox_head.loss_occupancy.type": "focal fixed; "
        "occ_loss_type selects the ce variant",
    "model.pts_bbox_head.loss_occupancy.use_sigmoid": "see loss_cls",
    "model.pts_bbox_head.loss_occupancy.gamma": "fixed 2.0",
    "model.pts_bbox_head.loss_occupancy.alpha": "fixed 0.25",
    "model.pts_bbox_head.bbox_coder.type": "NMSFreeCoder fixed",
    "model.pts_bbox_head.bbox_coder.pc_range": "same value as "
        "point_cloud_range (consumed there)",
    "model.pts_bbox_head.bbox_coder.voxel_size": "unused by NMSFreeCoder "
        "decode (reference nms_free_coder.py ignores it too)",
    "model.pts_bbox_head.bbox_coder.num_classes": "duplicate of head "
        "num_classes",
    "model.pts_bbox_head.transformer.type": "single transformer family",
    "model.pts_bbox_head.transformer.rotate_prev_bev": "2D BEVFormer "
        "temporal feature; implemented in bev2d.py, inert on MP3D",
    "model.pts_bbox_head.transformer.use_shift": "same",
    "model.pts_bbox_head.transformer.use_can_bus": "same",
    "model.pts_bbox_head.transformer.encoder.type": "single encoder family",
    "model.pts_bbox_head.transformer.encoder.pc_range": "same value as "
        "head point_cloud_range (consumed there)",
    "model.pts_bbox_head.transformer.encoder.num_points_in_voxel": "dead "
        "upstream: the '3d' get_reference_points branch ignores it "
        "(voxel_encoder.py:68-83; D=1 per voxel query)",
    "model.pts_bbox_head.transformer.encoder.return_intermediate": "False "
        "in every reference config; encoder returns the last layer",
    "model.pts_bbox_head.transformer.encoder.transformerlayers.type":
        "layer family fixed",
    "model.pts_bbox_head.transformer.encoder.transformerlayers."
    "operation_order": "the active order (cross_attn/norm/ffn/norm) is "
        "built statically; TSA order via use_temporal_self_attn",
    "model.pts_bbox_head.transformer.encoder.transformerlayers.attn_cfgs."
    "type": "SCA fixed",
    "model.pts_bbox_head.transformer.encoder.transformerlayers.attn_cfgs."
    "pc_range": "duplicate",
    "model.pts_bbox_head.transformer.encoder.transformerlayers.attn_cfgs."
    "embed_dims": "duplicate of transformer embed_dims",
    "model.pts_bbox_head.transformer.encoder.transformerlayers.attn_cfgs."
    "deformable_attention.type": "fixed",
    "model.pts_bbox_head.transformer.encoder.transformerlayers.attn_cfgs."
    "deformable_attention.embed_dims": "duplicate",
    "model.pts_bbox_head.transformer.decoder.type": "single decoder family",
    "model.pts_bbox_head.transformer.decoder.return_intermediate": "True "
        "in every reference config; decoder returns all layers",
    "model.pts_bbox_head.transformer.decoder.transformerlayers.type":
        "fixed",
    "model.pts_bbox_head.transformer.decoder.transformerlayers."
    "operation_order": "self_attn/norm/cross_attn/norm/ffn/norm built "
        "statically (decoder.py)",
    "model.pts_bbox_head.transformer.decoder.transformerlayers.attn_cfgs."
    "type": "fixed",
    "model.pts_bbox_head.transformer.decoder.transformerlayers.attn_cfgs."
    "embed_dims": "duplicate",
    "model.pts_bbox_head.transformer.decoder.transformerlayers.attn_cfgs."
    "dropout": "mmcv MHA attn dropout == our dropout_rate (consumed from "
        "ffn_dropout; both 0.1 in every reference config)",
    "model.pts_bbox_head.transformer.decoder.transformerlayers.attn_cfgs."
    "num_levels": "single-level voxel grid (num_levels consumed from the "
        "encoder side)",
    "model.pts_bbox_head.transformer.decoder.transformerlayers.ffn_cfgs":
        "overridden by the deprecated feedforward_channels kwarg in mmcv "
        "(BaseTransformerLayer deprecated_args) — the reference's "
        "effective decoder FFN width is feedforward_channels (consumed)",
    "model.pts_bbox_head.transformer.decoder.transformerlayers."
    "feedforward_channels": "decoder FFN width == encoder ffn_dim "
        "(consumed from the encoder layer; identical in every reference "
        "config)",
    "model.pts_bbox_head.transformer.decoder.transformerlayers."
    "ffn_dropout": "duplicate of encoder ffn_dropout (consumed)",
}


class SpyDict(dict):
    """dict wrapper recording every accessed dotted path."""

    def __init__(self, data, prefix, seen):
        super().__init__(data)
        self._prefix = prefix
        self._seen = seen

    def _wrap(self, k, v):
        path = f"{self._prefix}.{k}" if self._prefix else str(k)
        self._seen.add(path)
        if isinstance(v, dict):
            return SpyDict(v, path, self._seen)
        if isinstance(v, list) and v and isinstance(v[0], dict):
            return [SpyDict(x, f"{path}.{i}", self._seen) if
                    isinstance(x, dict) else x for i, x in enumerate(v)]
        return v

    def __getitem__(self, k):
        return self._wrap(k, super().__getitem__(k))

    def get(self, k, default=None):
        if k not in self:
            return default
        return self[k]


def _leaf_paths(d, prefix=""):
    for k, v in d.items():
        path = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            if not v:
                yield path
            else:
                yield from _leaf_paths(v, path)
        elif isinstance(v, list) and v and isinstance(v[0], dict):
            for i, x in enumerate(v):
                yield from _leaf_paths(x, f"{path}.{i}")
        else:
            yield path


def _normalise(path):
    """drop list indices so attn_cfgs.0.foo matches attn_cfgs.foo specs"""
    return ".".join(p for p in path.split(".") if not p.isdigit())


def test_every_vocc_model_key_consumed_or_explicitly_ignored():
    cfg = load_config(VOCC)
    seen = set()
    spied = dict(cfg)
    spied["model"] = SpyDict(cfg["model"], "model", seen)
    build_ver_config(spied)
    seen_norm = {_normalise(p) for p in seen}

    problems = []
    for leaf in _leaf_paths(cfg["model"], "model"):
        norm = _normalise(leaf)
        if norm in seen_norm:
            continue
        if any(norm == ig or norm.startswith(ig + ".")
               for ig in IGNORED):
            continue
        problems.append(leaf)
    assert not problems, (
        "reference config keys silently dropped (consume them in "
        f"build_ver_config or document in IGNORED): {problems}")


def test_consumed_values_reach_verconfig():
    cfg = load_config(VOCC)
    ver = build_ver_config(cfg)
    model = cfg["model"]["pts_bbox_head"]
    assert ver.occ_loss_type == model.get("occ_loss_type", "focal_loss")
    assert ver.bbox_max_num == model["bbox_coder"]["max_num"]
    assert tuple(ver.post_center_range) == tuple(
        model["bbox_coder"]["post_center_range"])
    assert ver.loss_cls_weight == model["loss_cls"]["loss_weight"]
    assert ver.loss_bbox_weight == model["loss_bbox"]["loss_weight"]
    assert ver.loss_occ_weight == model["loss_occupancy"]["loss_weight"]
    assert ver.num_heads == 8 and ver.ffn_dim == 1536
