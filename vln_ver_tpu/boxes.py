"""3D box codec: the 10-code (cx, cy, w, l, cz, h, sin, cos, vx, vy) format.

JAX re-implementation of the reference codec
(projects/mmdet3d_plugin/core/bbox/util.py:4-53).  Works on both jnp and
np arrays (pure jnp ops).

Box conventions used throughout the framework:

* "raw" GT boxes (from annotations): ``(cx, cy, z_bottom, w, l, h, yaw)``
  — the LiDARInstance3DBoxes layout with origin (0.5, 0.5, 0)
  (reference mp3docc_dataset.py:180-184).
* "gravity" boxes (what losses/matching see): ``(cx, cy, cz, w, l, h, yaw,
  vx, vy)`` with cz at the box centre — the reference builds these via
  ``cat([gravity_center, tensor[:, 3:]], 1)`` plus zero-velocity padding
  (voxelformer_occupancy_head.py:1311-1317).
* "normalized" boxes (regression space): the 10-code above with log sizes.
"""

from __future__ import annotations

import jax.numpy as jnp


def gravity_boxes_from_raw(raw_boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, 7) raw (cx, cy, z_bottom, w, l, h, yaw) -> (N, 9) gravity boxes
    with zero velocity, matching voxelformer_occupancy_head.py:1311-1317."""
    cz = raw_boxes[..., 2:3] + raw_boxes[..., 5:6] * 0.5
    zeros = jnp.zeros_like(raw_boxes[..., :2])
    return jnp.concatenate(
        [raw_boxes[..., 0:2], cz, raw_boxes[..., 3:7], zeros], axis=-1)


def normalize_bbox(bboxes: jnp.ndarray, pc_range=None) -> jnp.ndarray:
    """(…, 7|9) gravity boxes -> (…, 8|10) normalized regression targets.

    Mirrors core/bbox/util.py:4-24: (cx, cy, log w, log l, cz, log h,
    sin(yaw), cos(yaw)[, vx, vy]).  ``pc_range`` is accepted for signature
    parity but unused (as in the reference).
    """
    cx = bboxes[..., 0:1]
    cy = bboxes[..., 1:2]
    cz = bboxes[..., 2:3]
    w = jnp.log(bboxes[..., 3:4])
    l = jnp.log(bboxes[..., 4:5])
    h = jnp.log(bboxes[..., 5:6])
    rot = bboxes[..., 6:7]
    parts = [cx, cy, w, l, cz, h, jnp.sin(rot), jnp.cos(rot)]
    if bboxes.shape[-1] > 7:
        parts += [bboxes[..., 7:8], bboxes[..., 8:9]]
    return jnp.concatenate(parts, axis=-1)


def denormalize_bbox(normalized: jnp.ndarray, pc_range=None) -> jnp.ndarray:
    """(…, 8|10) normalized codes -> (…, 7|9) gravity boxes.

    Mirrors core/bbox/util.py:26-53: yaw = atan2(sin, cos), sizes exp'd.
    """
    rot = jnp.arctan2(normalized[..., 6:7], normalized[..., 7:8])
    cx = normalized[..., 0:1]
    cy = normalized[..., 1:2]
    cz = normalized[..., 4:5]
    w = jnp.exp(normalized[..., 2:3])
    l = jnp.exp(normalized[..., 3:4])
    h = jnp.exp(normalized[..., 5:6])
    parts = [cx, cy, cz, w, l, h, rot]
    if normalized.shape[-1] > 8:
        parts += [normalized[..., 8:9], normalized[..., 9:10]]
    return jnp.concatenate(parts, axis=-1)
