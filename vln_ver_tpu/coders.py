"""NMS-free box decoding and layout decoding.

Reference: core/bbox/coders/nms_free_coder.py (top-k over flattened sigmoid
scores of the last decoder layer, denormalise, post-center-range filter) and
layout_coder.py (same, scoreless, for layout queries).

Jittable static-shape decode: returns fixed ``max_num`` rows plus a validity
mask instead of ragged arrays; host tooling applies the mask.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from .boxes import denormalize_bbox


class DecodedBoxes(NamedTuple):
    bboxes: jnp.ndarray   # (max_num, 9) gravity boxes (cx cy cz w l h yaw vx vy)
    scores: jnp.ndarray   # (max_num,)
    labels: jnp.ndarray   # (max_num,) int32
    valid: jnp.ndarray    # (max_num,) bool — post-center-range filter


def decode_boxes(cls_scores: jnp.ndarray,
                 bbox_preds: jnp.ndarray,
                 max_num: int = 50,
                 num_classes: int = 17,
                 post_center_range: Sequence[float] = (
                     -10, -10, -5.0, 10, 10, 5.0),
                 score_threshold: float | None = None) -> DecodedBoxes:
    """Single-sample decode (nms_free_coder.py:40-100).

    Args:
      cls_scores: (num_query, num_classes) logits from the LAST decoder layer.
      bbox_preds: (num_query, 10) normalized codes from the last layer.
    """
    scores = jax.nn.sigmoid(cls_scores.astype(jnp.float32)).reshape(-1)
    top_scores, idx = jax.lax.top_k(scores, max_num)
    labels = (idx % num_classes).astype(jnp.int32)
    bbox_idx = idx // num_classes
    box_codes = bbox_preds[bbox_idx]
    boxes = denormalize_bbox(box_codes)

    rng = jnp.asarray(post_center_range, jnp.float32)
    valid = (jnp.all(boxes[:, :3] >= rng[:3], axis=1)
             & jnp.all(boxes[:, :3] <= rng[3:], axis=1))
    if score_threshold is not None:
        # Reference fallback (nms_free_coder.py:64-74): if nothing clears
        # the threshold, lower it by 0.9x until something passes
        # (mask becomes >= tmp), and below 0.01 keep everything — an
        # eval frame must never return zero candidates.  Closed form of
        # that loop (jittable; the loop checks the 0.01 escape BEFORE
        # the mask each iteration, so escape wins ties).
        thr = jnp.float32(score_threshold)
        max_s = jnp.max(top_scores)
        ln09 = jnp.log(jnp.float32(0.9))
        # smallest j >= 1 with max_s >= thr * 0.9^j
        k_pass = jnp.maximum(
            jnp.ceil(jnp.log(jnp.maximum(max_s, 1e-30) / thr) / ln09), 1.0)
        # smallest j >= 1 with thr * 0.9^j < 0.01 (strict)
        k_esc = jnp.maximum(
            jnp.floor(jnp.log(jnp.float32(0.01) / thr) / ln09) + 1.0, 1.0)
        strict = top_scores > thr
        eff = thr * jnp.power(jnp.float32(0.9), k_pass)
        fallback = jnp.where(k_esc <= k_pass,
                             jnp.ones_like(strict),
                             top_scores >= eff)
        valid = valid & jnp.where(jnp.any(strict), strict, fallback)
    return DecodedBoxes(boxes, top_scores, labels, valid)


def decode_layouts(layout_preds: jnp.ndarray,
                   post_center_range: Sequence[float] = (
                       -50, -50, -5.0, 50, 50, 5.0)) -> DecodedBoxes:
    """Scoreless layout decode (layout_coder.py:40-74): ALL layout
    queries of the last layer, denormalised + range filtered.  The
    reference's ``max_num`` attribute is dead code — decode_single never
    slices — so no truncation happens here either."""
    boxes = denormalize_bbox(layout_preds.astype(jnp.float32))
    rng = jnp.asarray(post_center_range, jnp.float32)
    valid = (jnp.all(boxes[:, :3] >= rng[:3], axis=1)
             & jnp.all(boxes[:, :3] <= rng[3:], axis=1))
    scores = jnp.zeros((boxes.shape[0],), jnp.float32)
    labels = jnp.zeros((boxes.shape[0],), jnp.int32)
    return DecodedBoxes(boxes, scores, labels, valid)


def boxes_to_bottom_origin(boxes: jnp.ndarray) -> jnp.ndarray:
    """Gravity-centre -> bottom-origin z (head get_bboxes :1467)."""
    cz = boxes[..., 2:3] - boxes[..., 5:6] * 0.5
    return jnp.concatenate([boxes[..., :2], cz, boxes[..., 3:]], axis=-1)
