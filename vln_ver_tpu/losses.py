"""Losses with mmdet semantics: sigmoid focal loss and weighted L1.

Reduction convention (mmdet ``weight_reduce_loss``): elementwise loss *
weight, summed, divided by ``avg_factor``.  Under pjit/GSPMD the plain
``jnp.sum`` already produces globally-reduced values on sharded inputs, so
the reference's explicit ``reduce_mean`` NCCL all-reduces
(voxelformer_occupancy_head.py:953-964) have no analog here — the compiler
inserts the collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jnp.ndarray,
                       labels: jnp.ndarray,
                       weight: Optional[jnp.ndarray] = None,
                       alpha: float = 0.25,
                       gamma: float = 2.0,
                       avg_factor: Optional[jnp.ndarray] = None,
                       loss_weight: float = 1.0) -> jnp.ndarray:
    """mmdet ``py_sigmoid_focal_loss`` with one-hot targets.

    Args:
      logits: (N, C) raw scores.
      labels: (N,) int; ``label == C`` means background (all-zero target).
      weight: optional (N,) per-sample weights.
      avg_factor: denominator (defaults to N).
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    target = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    p = jax.nn.sigmoid(logits)
    pt = (1.0 - p) * target + p * (1.0 - target)
    focal_weight = (alpha * target
                    + (1.0 - alpha) * (1.0 - target)) * pt ** gamma
    bce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    loss = bce * focal_weight
    if weight is not None:
        loss = loss * weight[..., None].astype(jnp.float32)
    total = jnp.sum(loss)
    if avg_factor is None:
        avg_factor = jnp.asarray(labels.shape[0], jnp.float32)
    return loss_weight * total / jnp.maximum(avg_factor, 1.0)


def weighted_l1_loss(pred: jnp.ndarray,
                     target: jnp.ndarray,
                     weight: jnp.ndarray,
                     avg_factor: jnp.ndarray,
                     loss_weight: float = 1.0) -> jnp.ndarray:
    """mmdet L1Loss: |pred - target| * weight, summed / avg_factor.

    Non-finite targets are zero-masked (the reference filters rows with
    ``isnotnan`` — head:969-975; here weights for such rows are zeroed,
    which is equivalent because reduction is a weighted sum).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    finite = jnp.all(jnp.isfinite(target), axis=-1, keepdims=True)
    target = jnp.where(finite, target, 0.0)
    weight = weight * finite.astype(jnp.float32)
    loss = jnp.abs(pred - target) * weight
    return loss_weight * jnp.sum(loss) / jnp.maximum(avg_factor, 1.0)


def softmax_ce_loss(logits: jnp.ndarray,
                    labels: jnp.ndarray,
                    weight: Optional[jnp.ndarray] = None,
                    avg_factor: Optional[jnp.ndarray] = None,
                    loss_weight: float = 1.0) -> jnp.ndarray:
    """Softmax cross-entropy over C classes (labels in [0, C)); the
    reference's ``occ_loss_type='ce_loss'`` variant where the last class is
    empty (head:1527-1536)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if weight is not None:
        nll = nll * weight.astype(jnp.float32)
    total = jnp.sum(nll)
    if avg_factor is None:
        avg_factor = jnp.asarray(labels.size, jnp.float32)
    return loss_weight * total / jnp.maximum(avg_factor, 1.0)


def focal_loss_cost(cls_logits: jnp.ndarray,
                    gt_labels: jnp.ndarray,
                    alpha: float = 0.25,
                    gamma: float = 2.0,
                    weight: float = 1.0,
                    eps: float = 1e-12) -> jnp.ndarray:
    """mmdet ``FocalLossCost``: (num_query, num_gt) classification cost."""
    p = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    neg = -jnp.log(1.0 - p + eps) * (1.0 - alpha) * p ** gamma
    pos = -jnp.log(p + eps) * alpha * (1.0 - p) ** gamma
    cost = pos[:, gt_labels] - neg[:, gt_labels]
    return cost * weight


def bbox_l1_cost(bbox_pred: jnp.ndarray,
                 gt_norm_boxes: jnp.ndarray,
                 weight: float = 1.0) -> jnp.ndarray:
    """mmdet ``BBox3DL1Cost``: pairwise L1 (cdist p=1) on normalized codes."""
    diff = jnp.abs(bbox_pred[:, None, :] - gt_norm_boxes[None, :, :])
    return jnp.sum(diff, axis=-1) * weight
