"""Shared evaluation loop: occupancy SSC metrics + indoor detection mAP.

Used by tools/test.py and as the in-training eval hook (the reference's
CustomDistEvalHook + custom_multi_gpu_test, eval every 20 epochs —
vocc.py:282).  Multi-process eval shards the dataset in contiguous blocks
and allgathers results (parallel/multihost.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..coders import decode_boxes
from ..data.mp3d import MP3DDataset, iterate_batches
from ..models import VoxelFormer
from ..occupancy import decode_occupancy_focal
from .indoor_eval import indoor_eval
from .ssc_metrics import SSCMetrics


def evaluate_model(model: VoxelFormer, params, dataset: MP3DDataset,
                   occ_thresholds: Sequence[float] = (0.25,),
                   limit: Optional[int] = None,
                   batch_size: int = 1,
                   classes: Sequence[str] = ()) -> Dict[str, float]:
    cfg = model.cfg

    @jax.jit
    def forward(params, feats, w2p, shift):
        outs = model.apply(params, feats, w2p, shift, deterministic=True)
        occ = outs.get("occupancy_preds")
        dec = None
        if outs.get("all_cls_scores") is not None:
            dec = jax.vmap(lambda c, b: decode_boxes(
                c, b, max_num=50, num_classes=cfg.num_classes))(
                    outs["all_cls_scores"][-1], outs["all_bbox_preds"][-1])
        layouts = outs.get("all_layout_preds")
        layouts = layouts[-1] if layouts is not None else None
        return occ, dec, layouts

    n = min(len(dataset), limit or len(dataset))
    occ_logits, occ_gts, occ_vis, pred_annos, gt_annos = [], [], [], [], []
    layout_ious = []
    for batch in iterate_batches(dataset, batch_size, indices=range(n),
                                 drop_last=False):
        occ, dec, layout_preds = forward(params, batch["features"],
                                         batch["world2pixel"],
                                         batch["origin_shift"])
        bsz = batch["features"].shape[0]
        if layout_preds is not None and "gt_layout" in batch:
            from ..coders import decode_layouts
            from .indoor_eval import box3d_iou
            for i in range(bsz):
                if not bool(np.asarray(batch["layout_valid"][i]).any()):
                    continue
                ldec = decode_layouts(jnp.asarray(layout_preds[i]))
                gtl = np.asarray(batch["gt_layout"][i][0][:7])
                ious = [box3d_iou(np.asarray(b)[:7], gtl)
                        for b, v in zip(ldec.bboxes, np.asarray(ldec.valid))
                        if v]
                layout_ious.append(max(ious) if ious else 0.0)
        for i in range(bsz):
            if occ is not None and "occ_dense" in batch:
                occ_logits.append(np.asarray(occ[i]))
                occ_gts.append(np.asarray(batch["occ_dense"][i]))
                occ_vis.append(np.asarray(batch["occ_visible"][i])
                               if "occ_visible" in batch else None)
            if dec is not None and "gt_boxes" in batch:
                gtv = np.asarray(batch["gt_valid"][i])
                gt_annos.append({
                    "boxes": np.asarray(batch["gt_boxes"][i])[gtv][:, :7],
                    "labels": np.asarray(batch["gt_labels"][i])[gtv]})
                valid = np.asarray(dec.valid[i])
                pred_annos.append({
                    "boxes": np.asarray(dec.bboxes[i])[valid][:, :7],
                    "labels": np.asarray(dec.labels[i])[valid],
                    "scores": np.asarray(dec.scores[i])[valid]})

    metrics: Dict[str, float] = {}
    if gt_annos:
        metrics.update(indoor_eval(gt_annos, pred_annos,
                                   classes=tuple(classes)))
    if layout_ious:
        metrics["layout_iou"] = float(np.mean(layout_ious))
    for thr in occ_thresholds:
        m = SSCMetrics(cfg.occupancy_classes + 1)
        for logits, gt, vis in zip(occ_logits, occ_gts, occ_vis):
            pred = np.asarray(decode_occupancy_focal(jnp.asarray(logits),
                                                     thr))
            m.add_batch(pred, gt, visible_mask=vis)
        stats = m.get_stats()
        suffix = f"@{thr:.2f}" if len(occ_thresholds) > 1 else ""
        metrics[f"miou{suffix}"] = stats["miou"]
        metrics[f"iou{suffix}"] = float(stats["iou"])
        metrics[f"occ_precision{suffix}"] = float(stats["precision"])
        metrics[f"occ_recall{suffix}"] = float(stats["recall"])
    return metrics
