"""Synthetic MP3D-format dataset generator.

Matterport3D is licence-gated (reference README.md:21) and its pkl/occ-npy
generation scripts are not in the reference repo (SURVEY.md §2.6), so tests,
benchmarks and end-to-end runs use procedurally generated scenes written in
the exact on-disk format the real data uses: annotation pkl + feature HDF5 +
world2pixel JSON + scanvp2cord pkl + sparse occupancy npy.

Scene model: a rectangular room with floor/ceiling/walls plus a few
axis-ish boxes; occupancy is rasterised analytically, ViT features are
random (the framework consumes precomputed features — their content only
matters for learning tests, where overfitting random features is fine).
"""

from __future__ import annotations

import json
import os
import pickle
import zlib
from typing import Sequence

import numpy as np

from ..geometry import make_pinhole_world2pixel


def _key_rng(seed: int, split: str, *idx: int) -> np.random.Generator:
    """Generator keyed on (seed, split, indices) — every random artifact
    draws from its OWN stream, so regenerating over a partially
    populated root (e.g. get_occ backfilling images next to existing
    features) reproduces the identical bytes for everything else:
    which keys already exist on disk can never shift another
    artifact's draws."""
    return np.random.default_rng(
        [seed, zlib.crc32(split.encode("utf-8")), *idx])

# occupancy class ids from vocc.py occupancy_name
FLOOR, WALL, CEILING = 2, 1, 14


def _rasterise_scene(rng: np.random.Generator,
                     pc_range=(-6.0, -6.0, -1.5, 6.0, 6.0, 2.0),
                     occ_dims=(35, 120, 120),
                     num_boxes: int = 4):
    zd, yd, xd = occ_dims
    lo = np.asarray(pc_range[:3])
    hi = np.asarray(pc_range[3:])
    dense = np.full(zd * yd * xd, 16, dtype=np.int32)
    zz, yy, xx = np.meshgrid(np.arange(zd), np.arange(yd), np.arange(xd),
                             indexing="ij")
    cx = (xx + 0.5) / xd * (hi[0] - lo[0]) + lo[0]
    cy = (yy + 0.5) / yd * (hi[1] - lo[1]) + lo[1]
    cz = (zz + 0.5) / zd * (hi[2] - lo[2]) + lo[2]
    flat = lambda m: m.reshape(-1)

    room_half = rng.uniform(3.0, 5.5)
    # floor/ceiling bands at least one voxel layer thick so coarse test
    # grids still rasterise structure
    z_vox = (hi[2] - lo[2]) / zd
    floor_z = lo[2] + max(0.15, 1.01 * z_vox)
    ceil_z = hi[2] - max(0.15, 1.01 * z_vox)
    xy_vox = max((hi[0] - lo[0]) / xd, (hi[1] - lo[1]) / yd)
    wall_band = max(0.2, 1.01 * xy_vox)
    inside = (np.abs(cx) < room_half) & (np.abs(cy) < room_half)
    dense[flat(inside & (cz < floor_z))] = FLOOR
    dense[flat(inside & (cz > ceil_z))] = CEILING
    wall = inside & (np.maximum(np.abs(cx), np.abs(cy))
                     > room_half - wall_band)
    dense[flat(wall & (cz >= floor_z) & (cz <= ceil_z))] = WALL

    boxes = []
    labels = []
    for _ in range(num_boxes):
        w, l, h = rng.uniform(0.4, 1.5, 3)
        bx = rng.uniform(-room_half + 1, room_half - 1)
        by = rng.uniform(-room_half + 1, room_half - 1)
        bz = floor_z  # bottom on the floor
        yaw = rng.uniform(-np.pi, np.pi)
        label = int(rng.integers(0, 17))
        boxes.append([bx, by, bz, w, l, h, yaw])
        labels.append(label)
        occ_cls = int(rng.integers(3, 16))
        in_box = ((np.abs(cx - bx) < w / 2) & (np.abs(cy - by) < l / 2)
                  & (cz >= bz) & (cz <= bz + h))
        dense[flat(in_box)] = occ_cls

    idx = np.nonzero(dense != 16)[0]
    sparse = np.stack([idx, dense[idx]], axis=-1).astype(np.int64)
    layout = [0.0, 0.0, floor_z, 2 * room_half, 2 * room_half,
              ceil_z - floor_z, 0.0]
    # invisible voxels (reference occ_invalid npy, mp3docc_dataset.py:
    # 512-517): everything beyond the room walls is unobserved
    invalid = np.nonzero(flat(~inside))[0].astype(np.int64)
    return sparse, invalid, np.asarray(boxes, np.float32), np.asarray(
        labels, np.int64), np.asarray(layout, np.float32)


def make_synthetic_dataset(root: str,
                           num_scans: int = 2,
                           viewpoints_per_scan: int = 2,
                           num_cams: int = 6,
                           feat_hw: int = 14,
                           feat_dim: int = 768,
                           occ_dims=(35, 120, 120),
                           pc_range=(-6.0, -6.0, -1.5, 6.0, 6.0, 2.0),
                           seed: int = 0,
                           split: str = "trainval",
                           image_hw=None,
                           write_features: bool = True) -> str:
    """Write a synthetic dataset under ``root``; returns the ann pkl path.

    ``image_hw``: when set (H, W), ALSO writes raw uint8 panorama views to
    ``panorama_images.hdf5`` under the same ``{scan}_{vp}_i1_{deg}`` keys
    (the fused image->VER path's input; data/mp3d.py ``from_images``).
    The images are random and independent of the random features — exact
    image->feature correspondence tests build their features by running
    the ViT (tests/test_from_images.py).

    Regeneration over a populated root is BYTE-STABLE: every artifact
    draws from its own (seed, split, indices)-keyed stream
    (:func:`_key_rng`), so re-calling with the same arguments rewrites
    ann/w2p/occ with identical bytes and only fills in whatever HDF5
    keys were missing."""
    import h5py

    os.makedirs(os.path.join(root, "world2pixel"), exist_ok=True)
    os.makedirs(os.path.join(root, "occ"), exist_ok=True)

    img_h5 = None
    if image_hw is not None:
        img_path = os.path.join(root, "panorama_images.hdf5")
        img_h5 = h5py.File(img_path,
                           "a" if os.path.exists(img_path) else "w")

    infos = []
    cords = {}
    feat_path = os.path.join(root,
                             "new_vit_base_patch16_197_imagenet.hdf5")
    mode = "a" if os.path.exists(feat_path) else "w"
    with h5py.File(feat_path, mode) as h5:
        for s in range(num_scans):
            # namespace scans by split: synthetic splits share the root
            # (features h5, world2pixel/, occ/), so identical scan names
            # across splits would collide on the per-token occ .npy files
            scan = (f"scan{s:03d}" if split == "trainval"
                    else f"{split}scan{s:03d}")
            cam_json = {}
            for v in range(viewpoints_per_scan):
                vp = f"vp{v:03d}"
                token = f"{scan}_{vp}"
                vrng = _key_rng(seed, split, s, v)
                pos = vrng.uniform(-1.0, 1.0, 3) * np.array([1, 1, 0.3])
                cords[token] = pos.astype(np.float32)
                for deg in range(num_cams):
                    key = f"{vp}_i1_{deg}"
                    w2p = make_pinhole_world2pixel(
                        70.0, deg * (360.0 / num_cams), pos)
                    cam_json[key] = w2p.tolist()
                    fkey = f"{scan}_{vp}_i1_{deg}"
                    if write_features and fkey not in h5:
                        feat = _key_rng(
                            seed, split, s, v, deg, 0).standard_normal(
                            (1, feat_hw * feat_hw + 1, feat_dim)
                        ).astype(np.float32)
                        h5.create_dataset(fkey, data=feat)
                    if img_h5 is not None and fkey not in img_h5:
                        img_h5.create_dataset(
                            fkey, data=_key_rng(
                                seed, split, s, v, deg, 1).integers(
                                0, 256, (*image_hw, 3)).astype(np.uint8))
                sparse, invalid, boxes, labels, layout = _rasterise_scene(
                    vrng, pc_range=pc_range, occ_dims=occ_dims)
                occ_path = os.path.join(root, "occ", f"{token}.npy")
                np.save(occ_path, sparse)
                invalid_path = os.path.join(root, "occ",
                                            f"{token}_invalid.npy")
                np.save(invalid_path, invalid)
                infos.append({
                    "token": token,
                    "scene_name": scan,
                    "gt_boxes": boxes,
                    "names": ["chair"] * len(labels),
                    "labels": labels,
                    "layout": layout,
                    "occ_gt_path": occ_path,
                    "occ_invalid_path": invalid_path,
                })
            # merge with any existing per-scan camera file: splits share the
            # root (like the reference's per-scan world2pixel JSONs), and a
            # later split generation with fewer viewpoints must not clobber
            # an earlier split's cameras
            cam_path = os.path.join(root, "world2pixel", scan + ".json")
            if os.path.exists(cam_path):
                with open(cam_path) as f:
                    merged = json.load(f)
                merged.update(cam_json)
                cam_json = merged
            with open(cam_path, "w") as f:
                json.dump(cam_json, f)

    if img_h5 is not None:
        img_h5.close()
    cord_path = os.path.join(root, "scanvp2cord.pkl")
    if os.path.exists(cord_path):
        with open(cord_path, "rb") as f:
            prev = pickle.load(f)
        prev.update(cords)
        cords = prev
    with open(cord_path, "wb") as f:
        pickle.dump(cords, f)
    ann_path = os.path.join(root, f"mp3d_{split}.pkl")
    with open(ann_path, "wb") as f:
        pickle.dump(infos, f)
    return ann_path
