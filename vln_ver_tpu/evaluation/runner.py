"""Shared evaluation loop: occupancy SSC metrics + indoor detection mAP.

Used by tools/test.py and as the in-training eval hook (the reference's
CustomDistEvalHook + custom_multi_gpu_test, eval every 20 epochs —
vocc.py:282).

Multi-process: the dataset is sharded in contiguous blocks per process
(parallel/multihost.shard_indices — the reference's
samplers/distributed_sampler.py:36-39 semantics), occupancy confusion
histograms are sum-reduced, and the (static-shape, validity-masked)
detection/layout results are allgathered (the reference's
apis/test.py:202-246 result collection), so every process computes the
same final metrics as a single-process run over the full split.

Memory: occupancy logits are decoded and folded into per-threshold
confusion histograms inside the batch loop — raw logits
(504k x 17 fp32 = 34 MB/sample) are never retained, so eval RAM is flat in
the number of viewpoints.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..coders import decode_boxes
from ..data.mp3d import MP3DDataset, iterate_batches
from ..models import VoxelFormer
from ..occupancy import decode_occupancy, occupancy_num_classes
from ..parallel import multihost
from .indoor_eval import indoor_eval
from .ssc_metrics import SSCMetrics, confusion_hist_device


# Jitted eval functions cached ACROSS evaluate_model calls: the
# in-training eval hook calls evaluate_model every tick, and a
# per-call closure would re-trace (and, through the axon tunnel,
# re-COMPILE — minutes) the full eval forward each time.  Keyed on the
# model object + everything the closures capture; the model is pinned in
# the value so ids cannot be recycled.
_EVAL_FN_CACHE: dict = {}


def _eval_fns(model: VoxelFormer, occ_thresholds):
    cfg = model.cfg
    key = (id(model), occ_thresholds, cfg.occ_loss_type)
    hit = _EVAL_FN_CACHE.get(key)
    if hit is not None and hit[0] is model:
        return hit[1], hit[2]
    if len(_EVAL_FN_CACHE) >= 8:   # bound pinned models/executables
        _EVAL_FN_CACHE.pop(next(iter(_EVAL_FN_CACHE)))

    n_occ_cls = occupancy_num_classes(cfg.occupancy_classes,
                                      cfg.occ_loss_type)

    @jax.jit
    def forward(params, feats, w2p, shift):
        outs = model.apply(params, feats, w2p, shift, deterministic=True)
        occ = outs.get("occupancy_preds")
        dec = None
        if outs.get("all_cls_scores") is not None:
            dec = jax.vmap(lambda c, b: decode_boxes(
                c, b, max_num=cfg.bbox_max_num,
                num_classes=cfg.num_classes,
                post_center_range=cfg.post_center_range))(
                    outs["all_cls_scores"][-1], outs["all_bbox_preds"][-1])
        layouts = outs.get("all_layout_preds")
        ldec = None
        if layouts is not None:
            # decode IN-GRAPH: an eager per-sample decode_layouts costs
            # ~15 dispatches/sample + a per-row fetch — tens of ms of
            # tunnel RTT each — where one vmapped decode in the jitted
            # forward costs nothing extra
            from ..coders import decode_layouts
            ldec = jax.vmap(decode_layouts)(layouts[-1])
        return occ, dec, ldec, outs["sca_overflow"]

    @jax.jit
    def occ_hists(occ_logits, gt, weight):
        """(B, V, C') logits + (B, V) gt / 0-1 weights -> (T, n, n) int32
        confusion histograms, one per threshold (thresholds static)."""
        hs = []
        for thr in occ_thresholds:
            pred = jax.vmap(lambda lg: decode_occupancy(
                lg, thr, loss_type=cfg.occ_loss_type))(occ_logits)
            hs.append(confusion_hist_device(pred, gt, weight, n_occ_cls))
        return jnp.stack(hs)

    _EVAL_FN_CACHE[key] = (model, forward, occ_hists)
    return forward, occ_hists


def evaluate_model(model: VoxelFormer, params, dataset: MP3DDataset,
                   occ_thresholds: Sequence[float] = (0.25,),
                   limit: Optional[int] = None,
                   batch_size: int = 1,
                   classes: Sequence[str] = (),
                   shard: bool = True,
                   mesh=None,
                   device_hist: bool = True) -> Dict[str, float]:
    """``mesh``: optional (data, view) jax.sharding.Mesh — single-PROCESS
    multi-chip eval shards each batch over the ``data`` axis (and cameras
    over ``view``) so all local chips work; short final batches are padded
    by repeating the last sample and the pad rows dropped.  Orthogonal to
    the multi-PROCESS sharding (``shard=True``), which splits the dataset
    across hosts.

    ``device_hist``: fold occupancy predictions into the SSC confusion
    histogram ON DEVICE (exact same accumulation — see
    confusion_hist_device; parity-tested in tests/test_evaluation.py).
    Per batch only the (T, n, n) int32 histograms cross to the host
    instead of 504k decoded labels per sample — through the axon tunnel
    that is the difference between one small fetch per batch and an RTT
    + 2 MB per (sample, threshold); under a mesh the histogram psums
    across shards on ICI.  ``False`` keeps the per-sample host decode
    (the oracle path)."""
    cfg = model.cfg
    if mesh is not None:
        from ..parallel import (data_axis_size, pad_and_shard,
                                params_on_mesh,
                                replicate as _replicate)
        dsize = data_axis_size(mesh)
        if batch_size % dsize != 0:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"mesh data size {dsize}")
        # live TP/train params are already laid out on the mesh —
        # replicating them would defeat the sharding (OOM for TP models)
        if not params_on_mesh(mesh, params):
            params = _replicate(mesh, params)

    forward, occ_hists = _eval_fns(model, tuple(occ_thresholds))

    n = min(len(dataset), limit or len(dataset))
    indices = multihost.shard_indices(n) if shard else range(n)
    per = multihost.shard_size(n) if shard else n

    n_occ_cls = occupancy_num_classes(cfg.occupancy_classes,
                                      cfg.occ_loss_type)
    ssc = {thr: SSCMetrics(n_occ_cls) for thr in occ_thresholds}

    # static-shape per-sample result rows (gatherable across processes)
    pred_rows, gt_rows, layout_rows = [], [], []
    # sparse-lift overflow guard: max over batches, accumulated ON DEVICE
    # (async dispatch — no per-batch fetch RTT), fetched once at the end
    overflow_dev = jnp.zeros((), jnp.int32)

    for batch in iterate_batches(dataset, batch_size, indices=indices,
                                 drop_last=False):
        bsz = batch["features"].shape[0]
        feats, w2p, shift = (batch["features"], batch["world2pixel"],
                             batch["origin_shift"])
        if mesh is not None:
            # pad short batches to the one compiled batch_size shape
            s, _ = pad_and_shard(
                mesh, {"features": feats, "world2pixel": w2p,
                       "origin_shift": shift}, batch_size)
            feats, w2p, shift = (s["features"], s["world2pixel"],
                                 s["origin_shift"])
        elif bsz < batch_size:
            # pad the short FINAL batch on the plain path too: an odd
            # trailing shape re-traces `forward` — through the axon
            # tunnel a second full-size compile costs minutes.  Pad rows
            # are dropped below (the per-sample loops run over bsz; the
            # histogram path zero-weights them).
            def _rep(a):
                a = np.asarray(a)
                return np.concatenate(
                    [a, np.repeat(a[-1:], batch_size - bsz, 0)])
            feats, w2p, shift = _rep(feats), _rep(w2p), _rep(shift)
        occ, dec, layout_dec, ovf = forward(params, feats, w2p, shift)
        overflow_dev = jnp.maximum(overflow_dev, ovf)
        if layout_dec is not None and "gt_layout" in batch:
            from .indoor_eval import box3d_iou
            # one fetch per batch (the decode ran in-graph in `forward`)
            lb = np.asarray(layout_dec.bboxes, np.float32)
            lv = np.asarray(layout_dec.valid, bool)
            for i in range(bsz):
                if not bool(np.asarray(batch["layout_valid"][i]).any()):
                    layout_rows.append(np.float32(np.nan))
                    continue
                gtl = np.asarray(batch["gt_layout"][i][0][:7])
                ious = [box3d_iou(b[:7], gtl)
                        for b, v in zip(lb[i], lv[i]) if v]
                layout_rows.append(np.float32(max(ious) if ious else 0.0))
        if occ is not None and "occ_dense" in batch and device_hist:
            # decode + histogram ON DEVICE; only (T, n, n) crosses to host
            # empty-id remap, mirroring the loss (train/objective.py): the
            # dense GT encodes empty as ``occupancy_classes`` (the dataset
            # convention) while ce-mode decode emits empty as the LAST
            # channel (n_occ_cls - 1) — without this every empty GT voxel
            # fell out of the histogram's bounds check and completion
            # precision was pinned.  A no-op in focal mode
            # (n_occ_cls - 1 == occupancy_classes == the empty id).
            gt = np.minimum(np.asarray(batch["occ_dense"]), n_occ_cls - 1)
            w = ((np.asarray(batch["occ_visible"]) == 1).astype(np.int32)
                 if "occ_visible" in batch
                 else np.ones_like(gt, np.int32))
            if gt.shape[0] < int(occ.shape[0]):  # zero-weight pad rows
                padn = int(occ.shape[0]) - gt.shape[0]
                gt = np.concatenate([gt, np.repeat(gt[-1:], padn, 0)])
                w = np.concatenate(
                    [w, np.zeros((padn,) + w.shape[1:], np.int32)])
            if mesh is not None:
                from ..parallel import shard_batch as _shard_batch
                sb = _shard_batch(mesh, {"gt": gt, "w": w})
                gt, w = sb["gt"], sb["w"]
            h = np.asarray(occ_hists(occ, gt, w)).astype(np.float64)
            for t, thr in enumerate(occ_thresholds):
                ssc[thr].hist += h[t]
        for i in range(bsz):
            if occ is not None and "occ_dense" in batch and not device_hist:
                # oracle path: decode + histogram per sample on host
                # (same empty-id remap as the device path above)
                logits = jnp.asarray(occ[i])
                gt = np.minimum(np.asarray(batch["occ_dense"][i]),
                                n_occ_cls - 1)
                vis = (np.asarray(batch["occ_visible"][i])
                       if "occ_visible" in batch else None)
                for thr in occ_thresholds:
                    pred = np.asarray(decode_occupancy(
                        logits, thr, loss_type=cfg.occ_loss_type))
                    ssc[thr].add_batch(pred, gt, visible_mask=vis)
            if dec is not None and "gt_boxes" in batch:
                gt_rows.append((
                    np.asarray(batch["gt_boxes"][i], np.float32),
                    np.asarray(batch["gt_labels"][i], np.int32),
                    np.asarray(batch["gt_valid"][i], bool)))
                pred_rows.append((
                    np.asarray(dec.bboxes[i], np.float32),
                    np.asarray(dec.labels[i], np.int32),
                    np.asarray(dec.scores[i], np.float32),
                    np.asarray(dec.valid[i], bool)))

    # -- cross-process merge --------------------------------------------
    def _gather_tuplelist(rows, n_fields):
        if multihost.process_count() == 1:
            return rows
        # Empty shards are legitimate and must still participate in every
        # collective below (raising on one process while peers enter
        # process_allgather deadlocks the eval):
        #   - a model without the detection branch (only_occ: dec is
        #     None) appends rows on NO process -> gather to [];
        #   - ceil-division contiguous shards leave TRAILING processes
        #     empty whenever n < per * processes (e.g. 9 samples on 8
        #     processes) -> those contribute typed (0, ...) arrays, with
        #     the field dtype/shape handshaken from a non-empty process
        #     (process 0 always has rows when any process does).
        from jax.experimental import multihost_utils
        total = int(multihost.allreduce_sum(
            np.asarray([len(rows)], np.int64))[0])
        if total == 0:
            return []
        dtype_by_num = {np.dtype(t).num: np.dtype(t)
                        for t in ("float32", "float64", "int32", "int64",
                                  "bool", "uint8", "float16")}
        gathered = []
        for f in range(n_fields):
            arr = np.stack([r[f] for r in rows]) if rows else None
            meta = np.full(10, -1, np.int64)
            if arr is not None:
                meta[0] = arr.dtype.num
                meta[1] = arr.ndim - 1
                meta[2:1 + arr.ndim] = arr.shape[1:]
            metas = np.asarray(multihost_utils.process_allgather(meta))
            if arr is None:
                m = metas[metas[:, 1] >= 0][0]
                shape = tuple(int(x) for x in m[2:2 + int(m[1])])
                arr = np.zeros((0,) + shape, dtype_by_num[int(m[0])])
            gathered.append(multihost.allgather_results(arr, per))
        return list(zip(*gathered))

    overflow = float(jax.device_get(overflow_dev))
    if multihost.process_count() > 1:
        from jax.experimental import multihost_utils
        overflow = float(np.max(multihost_utils.process_allgather(
            np.float32(overflow))))
        for thr in occ_thresholds:
            ssc[thr].hist = multihost.allreduce_sum(ssc[thr].hist)
        pred_rows = _gather_tuplelist(pred_rows, 4)
        gt_rows = _gather_tuplelist(gt_rows, 3)
        layout_arr = np.asarray(layout_rows, np.float32)
        layout_rows = multihost.allgather_results(layout_arr, per)

    metrics: Dict[str, float] = {}
    metrics["sca_overflow"] = overflow
    if gt_rows:
        gt_annos = [{"boxes": b[v][:, :7], "labels": l[v]}
                    for (b, l, v) in gt_rows]
        pred_annos = [{"boxes": b[v][:, :7], "labels": l[v],
                       "scores": s[v]}
                      for (b, l, s, v) in pred_rows]
        metrics.update(indoor_eval(gt_annos, pred_annos,
                                   classes=tuple(classes)))
    layout_vals = [float(x) for x in layout_rows
                   if np.isfinite(np.float32(x))]
    if layout_vals:
        metrics["layout_iou"] = float(np.mean(layout_vals))
    for thr in occ_thresholds:
        stats = ssc[thr].get_stats()
        suffix = f"@{thr:.2f}" if len(occ_thresholds) > 1 else ""
        metrics[f"miou{suffix}"] = stats["miou"]
        metrics[f"iou{suffix}"] = float(stats["iou"])
        metrics[f"occ_precision{suffix}"] = float(stats["precision"])
        metrics[f"occ_recall{suffix}"] = float(stats["recall"])
    return metrics
