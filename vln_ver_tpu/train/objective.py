"""Multi-task training objective: per-decoder-layer DETR losses + occupancy.

Mirrors VoxelFormerOccupancyHead.loss / loss_addlayout / loss_only_occupancy
/ loss_only_detection (head:1105-1444, 1618-1719):

* per decoder layer: Hungarian match -> focal cls loss (weight 2.0, avg by
  synced num_pos) + weighted L1 box loss (weight 0.25, code_weights
  [1]*8+[0,0], avg by synced num_pos);
* occupancy focal loss (weight 1.0) on the LAST layer only, averaged by the
  number of occupied voxels;
* optional layout L1 on the LAST decoder layer only (reg-cost-only
  matching) — see the reference-quirk note at the layout block below.

Batch contract (all padded static shapes):
  features (B, cams, fh, fw, C); world2pixel (B, cams, 4, 4);
  origin_shift (B, 3); gt_boxes (B, MAX_GT, 9) gravity boxes;
  gt_labels (B, MAX_GT) int32; gt_valid (B, MAX_GT) bool;
  occ_dense (B, voxel_num) int32 class labels (empty = occupancy_classes);
  optional gt_layout (B, 1, 9) + layout_valid (B, 1).

Under pjit, ``jnp.sum`` over sharded batch axes is already a global
reduction — the GSPMD analog of the reference's ``reduce_mean``+DDP-mean
normalisation (see SURVEY.md §2.7).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import losses as L
from ..boxes import normalize_bbox
from ..matching import (BIG_COST, build_detr_targets, hungarian_auction,
                        hungarian_host)
from ..models.config import VERConfig

# numpy on purpose: a module-level jnp array would initialise the JAX
# backend at import time, before callers can force the CPU platform
# (CLAUDE.md: config must be updated before first device use)
CODE_WEIGHTS = np.asarray([1.0] * 8 + [0.0, 0.0], np.float32)


def _match_layer(cls_scores, bbox_preds, gt_norm, gt_labels, gt_valid,
                 use_host: bool, layout: bool = False):
    """Single-sample, single-layer Hungarian match.
    cls_scores (nq, C); bbox_preds (nq, 10); gt_norm (MAX_GT, 10)."""
    reg_cost = L.bbox_l1_cost(bbox_preds[:, :8], gt_norm[:, :8],
                              weight=0.25)
    if layout:
        cost = reg_cost
    else:
        cls_cost = L.focal_loss_cost(cls_scores, gt_labels, weight=2.0)
        cost = cls_cost + reg_cost
    cost = jnp.nan_to_num(cost, nan=BIG_COST, posinf=BIG_COST,
                          neginf=-BIG_COST)
    # Pad invalid GT columns JUST above the worst real cost, not with
    # BIG_COST: a padded column costs the same in every row, so any pad
    # value >= the real maximum yields the identical real assignment
    # under an exact solver — but the auction's eps scales with the
    # GLOBAL cost spread (matching.py:58), and a 1e8 pad inflated eps by
    # ~1e5x, making the in-graph matcher grossly eps-suboptimal on the
    # real columns (misassignments whenever GTs competed for a query).
    real_max = jnp.max(jnp.where(gt_valid[None, :], cost, -jnp.inf))
    pad = jnp.where(jnp.isfinite(real_max), real_max + 1.0, 1.0)
    cost = jnp.where(gt_valid[None, :], cost, pad)
    # the reference detaches the cost before matching
    # (hungarian_assigner_3d.py:125); also keeps reverse-mode out of the
    # matcher's while_loop
    cost = jax.lax.stop_gradient(cost)
    if use_host:
        return hungarian_host(cost)
    return hungarian_auction(cost)


def _layer_det_loss(cfg: VERConfig, cls_scores, bbox_preds, gt_boxes,
                    gt_labels, gt_valid, use_host: bool):
    """One decoder layer's cls+bbox loss over the batch
    (head loss_single :903-990)."""
    gt_norm = normalize_bbox(gt_boxes)  # (B, MAX_GT, 10)

    matched = jax.vmap(
        lambda c, b, gn, gl, gv: _match_layer(c, b, gn, gl, gv, use_host)
    )(cls_scores, bbox_preds, gt_norm, gt_labels, gt_valid)

    labels, bbox_targets, bbox_w = jax.vmap(
        lambda m, gv, gl, gb: build_detr_targets(
            m, gv, gl, gb, cfg.num_query, cfg.num_classes)
    )(matched, gt_valid, gt_labels, gt_boxes)

    num_pos = jnp.sum(gt_valid.astype(jnp.float32))
    cls_avg = jnp.maximum(num_pos, 1.0)

    loss_cls = L.sigmoid_focal_loss(
        cls_scores.reshape(-1, cfg.num_classes), labels.reshape(-1),
        avg_factor=cls_avg, loss_weight=cfg.loss_cls_weight)

    tgt_norm = normalize_bbox(bbox_targets)
    weights = bbox_w[..., None] * CODE_WEIGHTS
    loss_bbox = L.weighted_l1_loss(
        bbox_preds.reshape(-1, cfg.code_size),
        tgt_norm.reshape(-1, cfg.code_size),
        weights.reshape(-1, cfg.code_size),
        avg_factor=jnp.maximum(num_pos, 1.0),
        loss_weight=cfg.loss_bbox_weight)
    return jnp.nan_to_num(loss_cls), jnp.nan_to_num(loss_bbox)


def compute_losses(cfg: VERConfig, outs: Dict, batch: Dict,
                   matcher: str = "auction") -> Dict[str, jnp.ndarray]:
    """Full loss dict with reference-compatible keys
    (loss_cls/loss_bbox/loss_occupancy/loss_flow + d{i}.loss_*)."""
    use_host = matcher == "host"
    loss_dict: Dict[str, jnp.ndarray] = {}

    if not cfg.only_occ:
        all_cls = outs["all_cls_scores"]
        all_bbox = outs["all_bbox_preds"]
        num_layers = all_cls.shape[0]
        for lyr in range(num_layers):
            lc, lb = _layer_det_loss(
                cfg, all_cls[lyr], all_bbox[lyr], batch["gt_boxes"],
                batch["gt_labels"], batch["gt_valid"], use_host)
            if lyr == num_layers - 1:
                loss_dict["loss_cls"] = lc
                loss_dict["loss_bbox"] = lb
            else:
                loss_dict[f"d{lyr}.loss_cls"] = lc
                loss_dict[f"d{lyr}.loss_bbox"] = lb

        if cfg.add_layout and outs.get("all_layout_preds") is not None:
            # reg-cost-only matching vs the (single) gt layout box
            # (head:802-803, loss weight shared with bbox L1).
            # REFERENCE QUIRK — last layer ONLY, on purpose: the reference
            # computes per-layer layout losses but keys only the last one
            # into loss_dict (voxelformer_occupancy_head.py:1232-1243), so
            # intermediate layers get no layout gradient.  Matching that
            # behavior exactly; do not "fix" this into a per-layer loss.
            gt_layout = batch["gt_layout"]           # (B, 1, 9)
            layout_valid = batch["layout_valid"]     # (B, 1)
            lay_norm = normalize_bbox(gt_layout)
            last = outs["all_layout_preds"][-1]
            matched = jax.vmap(
                lambda p, gn, gv: _match_layer(
                    None, p, gn, jnp.zeros(gn.shape[0], jnp.int32), gv,
                    use_host, layout=True)
            )(last, lay_norm, layout_valid)
            _, lay_targets, lay_w = jax.vmap(
                lambda m, gv, gb: build_detr_targets(
                    m, gv, jnp.zeros(gv.shape, jnp.int32), gb,
                    cfg.num_query, 1)
            )(matched, layout_valid, gt_layout)
            n_lay = jnp.maximum(jnp.sum(layout_valid.astype(jnp.float32)),
                                1.0)
            weights = lay_w[..., None] * CODE_WEIGHTS
            loss_dict["loss_layout"] = jnp.nan_to_num(L.weighted_l1_loss(
                last.reshape(-1, cfg.code_size),
                normalize_bbox(lay_targets).reshape(-1, cfg.code_size),
                weights.reshape(-1, cfg.code_size),
                avg_factor=n_lay, loss_weight=cfg.loss_layout_weight))

    if not cfg.only_det and outs.get("occupancy_preds") is not None:
        occ_preds = outs["occupancy_preds"]  # (B, n_vox, C_occ)
        gt_occ = batch["occ_dense"].reshape(-1)
        num_occupied = jnp.sum(
            (gt_occ < cfg.occupancy_classes).astype(jnp.float32))
        if cfg.occ_loss_type == "ce_loss":
            # softmax CE with the last channel as empty; labels already use
            # occupancy_classes for empty == last channel index
            occ_logits = occ_preds.reshape(-1, occ_preds.shape[-1])
            loss_occ = L.softmax_ce_loss(
                occ_logits, jnp.minimum(gt_occ, occ_logits.shape[-1] - 1),
                avg_factor=num_occupied, loss_weight=cfg.loss_occ_weight)
        else:
            occ_logits = occ_preds.reshape(-1, cfg.occupancy_classes)
            loss_occ = L.sigmoid_focal_loss(
                occ_logits, gt_occ, avg_factor=num_occupied,
                loss_weight=cfg.loss_occ_weight)
        loss_dict["loss_occupancy"] = jnp.nan_to_num(loss_occ)
        loss_dict["loss_flow"] = jnp.zeros(())

    return loss_dict
