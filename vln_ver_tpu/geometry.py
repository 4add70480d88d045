"""Voxel-grid reference points and multi-camera projection.

Pure fp32 functions of static shapes — the TPU-native replacement for the
reference's ``VoxelFormerEncoder.get_reference_points`` / ``point_sampling``
(reference: projects/mmdet3d_plugin/bevformer/modules/voxel_encoder.py:53-195).

Key design change vs the reference: the reference re-reads the per-scan
``world2pixel/{scan}.json`` and ``scanvp2cord.pkl`` from disk *inside every
forward* (voxel_encoder.py:121-135).  Here the camera matrices and the origin
shift are plain array arguments supplied once per sample by the input
pipeline, so projection is a jittable pure function and the whole encoder
compiles to one XLA program.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# MP3D panorama image plane used to normalise pixel coordinates
# (reference voxel_encoder.py:179-180).
IMAGE_WH = (1280.0, 1024.0)

# Default VER scene range [x_min, y_min, z_min, x_max, y_max, z_max] in metres
# (reference projects/configs/verformer/vocc.py:9).
PC_RANGE = (-6.0, -6.0, -1.5, 6.0, 6.0, 2.0)


def voxel_reference_points(bev_z: int, bev_h: int, bev_w: int,
                           dtype=jnp.float32) -> jnp.ndarray:
    """Normalised 3D centres of the coarse voxel-query grid.

    Returns ``(bev_z*bev_h*bev_w, 3)`` with columns (x, y, z) in [0, 1], voxel
    centres at ``(i + 0.5) / dim``.  Flat ordering is z-major, then h (y),
    then w (x) — matching the reference voxel embedding layout
    (voxel_encoder.py:67-83; the '3d' branch flattens (z, h, w)).
    """
    zs = (jnp.arange(bev_z, dtype=dtype) + 0.5) / bev_z
    ys = (jnp.arange(bev_h, dtype=dtype) + 0.5) / bev_h
    xs = (jnp.arange(bev_w, dtype=dtype) + 0.5) / bev_w
    z, y, x = jnp.meshgrid(zs, ys, xs, indexing="ij")
    return jnp.stack([x, y, z], axis=-1).reshape(-1, 3)


def pillar_reference_points(bev_h: int, bev_w: int,
                            num_points_in_pillar: int = 4,
                            z_extent: float | None = None,
                            dtype=jnp.float32) -> jnp.ndarray:
    """Normalised pillar sampling points of a 2D BEV grid.

    The BEVFormer-2D encoder samples each BEV cell at
    ``num_points_in_pillar`` heights: upstream BEVFormer's
    ``get_reference_points('3d')`` anchors are
    ``linspace(0.5, Z - 0.5, P) / Z`` with ``Z`` the METRIC pillar
    height (pc-range z extent) — a 0.5 m margin at both ends, NOT a
    half-cell of the anchor count.  ``z_extent`` supplies that Z;
    omitted, it falls back to ``Z == P`` (the voxel generalisation at
    voxel_encoder.py:53-83, where count and divisor coincide).  Returns
    ``(bev_h*bev_w, P, 3)`` (x, y, z) in [0, 1]; flat order is h-major
    then w, anchors along the last-but-one axis bottom-up.
    """
    Z = float(z_extent) if z_extent is not None else float(
        num_points_in_pillar)
    zs = jnp.linspace(0.5, Z - 0.5, num_points_in_pillar,
                      dtype=dtype) / Z
    ys = (jnp.arange(bev_h, dtype=dtype) + 0.5) / bev_h
    xs = (jnp.arange(bev_w, dtype=dtype) + 0.5) / bev_w
    y, x = jnp.meshgrid(ys, xs, indexing="ij")
    xy = jnp.stack([x, y], axis=-1).reshape(-1, 2)           # (hw, 2)
    xy = jnp.broadcast_to(xy[:, None, :],
                          (xy.shape[0], num_points_in_pillar, 2))
    z = jnp.broadcast_to(zs[None, :, None],
                         (xy.shape[0], num_points_in_pillar, 1))
    return jnp.concatenate([xy, z], axis=-1)


def bev_reference_points(bev_h: int, bev_w: int,
                         dtype=jnp.float32) -> jnp.ndarray:
    """Normalised 2D BEV cell centres, ``(bev_h*bev_w, 2)`` (x, y) in
    [0, 1], h-major flat order — TSA-2D reference points (the missing
    encoder.py 'get_reference_points' 2d branch)."""
    ys = (jnp.arange(bev_h, dtype=dtype) + 0.5) / bev_h
    xs = (jnp.arange(bev_w, dtype=dtype) + 0.5) / bev_w
    y, x = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([x, y], axis=-1).reshape(-1, 2)


def project_reference_points(ref_xyz: jnp.ndarray,
                             world2pixel: jnp.ndarray,
                             origin_shift: jnp.ndarray,
                             pc_range=PC_RANGE,
                             image_wh=IMAGE_WH,
                             eps: float = 1e-5):
    """Project normalised voxel centres into every camera.

    The TPU-native equivalent of ``point_sampling``
    (voxel_encoder.py:117-195), with all host I/O hoisted out.

    Args:
      ref_xyz: ``(num_query, 3)`` normalised (x, y, z) in [0, 1].
      world2pixel: ``(num_cam, 4, 4)`` fp32 world->pixel projection matrices
        (the reference loads these per scan/viewpoint from
        ``world2pixel/{scan}.json``, one per heading ``{vp}_i1_{deg}``).
      origin_shift: ``(3,)`` world-frame translation of the viewpoint
        (the reference's ``scanvp2cord[scan_vp]``).
      pc_range: scene bounds used to denormalise ``ref_xyz``.
      image_wh: image plane size for pixel-coordinate normalisation.
      eps: depth clamp (reference uses 1e-5).

    Returns:
      ``(cam_xy, mask)`` where ``cam_xy`` is ``(num_cam, num_query, 2)``
      normalised image coordinates in [0, 1] (clamped to a safe range for
      masked-out queries) and ``mask`` is ``(num_cam, num_query)`` bool —
      True where the point lies in front of the camera and inside the image.
    """
    ref_xyz = ref_xyz.astype(jnp.float32)
    world2pixel = world2pixel.astype(jnp.float32)
    origin_shift = origin_shift.astype(jnp.float32)
    pc = jnp.asarray(pc_range, dtype=jnp.float32)

    world = ref_xyz * (pc[3:6] - pc[0:3]) + pc[0:3] + origin_shift
    homo = jnp.concatenate([world, jnp.ones_like(world[..., :1])], axis=-1)
    # (num_cam, num_query, 4) = (num_cam, 4, 4) @ (num_query, 4)
    cam = jnp.einsum("cij,qj->cqi", world2pixel, homo)

    depth = cam[..., 2:3]
    in_front = depth[..., 0] > eps
    xy = cam[..., 0:2] / jnp.maximum(depth, eps)
    wh = jnp.asarray(image_wh, dtype=jnp.float32)
    xy = xy / wh

    mask = (in_front
            & (xy[..., 0] > 0.0) & (xy[..., 0] < 1.0)
            & (xy[..., 1] > 0.0) & (xy[..., 1] < 1.0))
    # Keep masked-out coordinates finite and tame so downstream bilinear
    # sampling can run dense (masked) without inf/NaN poisoning gradients.
    xy = jnp.clip(jnp.nan_to_num(xy), -1.0, 2.0)
    return xy, mask


def max_visible_queries(world2pixel: np.ndarray,
                        origin_shift: np.ndarray,
                        bev_z: int = 4, bev_h: int = 15, bev_w: int = 15,
                        pc_range=PC_RANGE,
                        image_wh=IMAGE_WH) -> int:
    """Largest per-camera visible voxel-query count over a batch — the
    lower bound a safe ``VERConfig.sca_query_capacity`` must meet.

    Pure numpy (host-side: meant for dataset validation before enabling
    the capacity-bounded sparse lift).  ``world2pixel`` is (..., cam, 4, 4)
    and ``origin_shift`` (..., 3) with matching leading dims; replicates
    ``project_reference_points``'s visibility test with the bounds
    DILATED by a small tolerance, so a projection that lands within fp
    rounding of an image edge (where the on-device XLA fused arithmetic
    may round the other way and count the query visible) is counted here
    too — the returned bound is conservative, never an under-count.
    """
    w2p = np.asarray(world2pixel, np.float32)
    shift = np.asarray(origin_shift, np.float32)
    ref = np.asarray(voxel_reference_points(bev_z, bev_h, bev_w))
    pc = np.asarray(pc_range, np.float32)
    world = ref * (pc[3:6] - pc[0:3]) + pc[0:3]        # (nq, 3)
    world = world[None] + shift.reshape(-1, 1, 3)      # (B, nq, 3)
    homo = np.concatenate([world, np.ones_like(world[..., :1])], -1)
    cam = np.einsum("xcij,xqj->xcqi",
                    w2p.reshape(-1, *w2p.shape[-3:]).astype(np.float64),
                    homo.astype(np.float64))
    depth = cam[..., 2]
    eps = 1e-5
    tol = 1e-4  # fp32-rounding dilation of the visibility boundary
    xy = cam[..., 0:2] / np.maximum(depth, eps)[..., None]
    xy = xy / np.asarray(image_wh, np.float64)
    vis = ((depth > eps * (1.0 - tol))
           & (xy[..., 0] > -tol) & (xy[..., 0] < 1.0 + tol)
           & (xy[..., 1] > -tol) & (xy[..., 1] < 1.0 + tol))
    return int(vis.sum(-1).max())


def make_pinhole_world2pixel(fov_deg: float,
                             yaw_deg: float,
                             position,
                             image_wh=IMAGE_WH) -> np.ndarray:
    """Build a 4x4 world->pixel matrix for a y-forward pinhole camera.

    Utility for synthetic data and tests (the real matrices come from the
    MP3D ``world2pixel`` JSON files).  The camera sits at ``position`` with
    heading ``yaw_deg`` about +z (0 deg looks along +y), horizontal/vertical
    FoV ``fov_deg``.
    """
    w, h = image_wh
    f = 0.5 * w / np.tan(np.radians(fov_deg) / 2)
    fy = 0.5 * h / np.tan(np.radians(fov_deg) / 2)
    intr = np.array([[f, 0, w / 2], [0, fy, h / 2], [0, 0, 1.0]])
    cy, sy = np.cos(np.radians(yaw_deg)), np.sin(np.radians(yaw_deg))
    # world axes -> camera axes: camera x = right, y = down, z = forward
    rot_world = np.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]])
    forward = rot_world @ np.array([0.0, 1.0, 0.0])
    right = rot_world @ np.array([1.0, 0.0, 0.0])
    down = np.array([0.0, 0.0, -1.0])
    r_cam = np.stack([right, down, forward], axis=0)  # world->cam rotation
    t = -r_cam @ np.asarray(position, dtype=np.float64)
    ext = np.eye(4)
    ext[:3, :3] = r_cam
    ext[:3, 3] = t
    proj = np.eye(4)
    proj[:3, :3] = intr
    return (proj @ ext).astype(np.float32)
