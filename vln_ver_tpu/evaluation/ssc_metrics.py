"""Semantic scene completion metrics (per-class IoU, mIoU, completion
IoU/precision/recall).

Numpy port of the reference's SSCMetrics (datasets/occupancy_metrics.py:3-105)
with identical accumulation semantics: an (n+1)x(n+1) confusion histogram
over class ids where the last class is empty; completion stats treat
"any non-empty" as positive.
"""

from __future__ import annotations

import numpy as np


class SSCMetrics:
    def __init__(self, n_classes: int = 17):
        """``n_classes`` INCLUDES the empty class (17 = 16 + empty)."""
        self.n_classes = n_classes
        self.hist = np.zeros((n_classes, n_classes), dtype=np.float64)

    def add_batch(self, y_pred: np.ndarray, y_true: np.ndarray,
                  visible_mask: np.ndarray | None = None) -> None:
        y_pred = np.asarray(y_pred).reshape(-1)
        y_true = np.asarray(y_true).reshape(-1)
        if visible_mask is not None:
            visible_mask = np.asarray(visible_mask).reshape(-1)
            y_pred = y_pred[visible_mask == 1]
            y_true = y_true[visible_mask == 1]
        from .. import native
        self.hist += native.confusion_hist(
            y_pred.astype(np.int32), y_true.astype(np.int32),
            self.n_classes)

    def get_stats(self) -> dict:
        hist = self.hist
        iou_per_class = np.diag(hist) / (
            hist.sum(1) + hist.sum(0) - np.diag(hist) + 1e-6) * 100.0
        completion_tp = np.sum(hist[:-1, :-1])
        completion_fp = np.sum(hist[-1, :-1])
        completion_fn = np.sum(hist[:-1, -1])
        if completion_tp != 0:
            precision = completion_tp / (completion_tp + completion_fp)
            recall = completion_tp / (completion_tp + completion_fn)
            iou = completion_tp / (
                completion_tp + completion_fp + completion_fn) * 100.0
        else:
            precision, recall, iou = 0.0, 0.0, 0.0
        iou_ssc = iou_per_class[: self.n_classes - 1]
        return {
            "iou": iou,
            "precision": precision,
            "recall": recall,
            "iou_ssc": iou_ssc,
            "miou": float(np.mean(iou_ssc)),
        }
