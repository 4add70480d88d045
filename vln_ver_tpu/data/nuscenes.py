"""nuScenes-format adapter for the BEVFormer-2D family.

The reference keeps its BEVFormer 2D lineage alongside the VER stack and
still imports its nuScenes dataset on the active path
(datasets/__init__.py:1, nuscenes_dataset.py).  This adapter serves the
same *contract* TPU-first: an info pkl per sample with camera projection
matrices, can-bus vector and 3D boxes, plus precomputed per-view features
from an HDF5 (feature extraction is offline, as on the MP3D path) — so
``models/bev2d.BEVFormer2D`` trains/evaluates on nuScenes-style data with
no host I/O inside the step.

Info record schema (one dict per sample):
  token          str
  lidar2img      (num_cams, 4, 4) float32 — world->pixel per camera
  can_bus        (18,) float32
  gt_boxes       (N, 9) float32 raw (cx, cy, z_bottom, w, l, h, yaw, vx, vy)
                 (converted to gravity-centre cz on output — the training
                 objective's batch contract)
  gt_labels      (N,) int
  prev / next    str tokens ('' at sequence ends) — the temporal queue
  scene_name     str
"""

from __future__ import annotations

import os
import pickle
import threading
from typing import Dict, List, Optional, Sequence

import numpy as np


class NuScenesAdapter:
    def __init__(self, ann_file: str, data_root: str,
                 feature_file: Optional[str] = None,
                 num_cams: int = 6, feat_hw: int = 14, max_gt: int = 32,
                 image_wh=(1600.0, 900.0), test_mode: bool = False):
        with open(ann_file, "rb") as f:
            self.infos: List[Dict] = pickle.load(f)
        self.by_token = {i["token"]: k for k, i in enumerate(self.infos)}
        self.data_root = data_root
        self.feature_file = feature_file or os.path.join(
            data_root, "nusc_features.hdf5")
        self.num_cams = num_cams
        self.feat_hw = feat_hw
        self.max_gt = max_gt
        self.image_wh = image_wh
        self.test_mode = test_mode
        self._h5 = None
        self._lock = threading.Lock()

    def __len__(self):
        return len(self.infos)

    def _features(self, token: str) -> np.ndarray:
        import h5py
        with self._lock:
            if self._h5 is None:
                self._h5 = h5py.File(self.feature_file, "r")
            feat = self._h5[token][:]
        # (num_cams, fh*fw(+cls), C) -> (num_cams, fh, fw, C)
        if feat.shape[1] == self.feat_hw * self.feat_hw + 1:
            feat = feat[:, 1:]
        return feat.reshape(self.num_cams, self.feat_hw, self.feat_hw,
                            -1).astype(np.float32)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        info = self.infos[index]
        n = min(len(info.get("gt_boxes", ())), self.max_gt)
        boxes = np.zeros((self.max_gt, 9), np.float32)
        labels = np.zeros((self.max_gt,), np.int32)
        valid = np.zeros((self.max_gt,), bool)
        if n:
            raw = np.asarray(info["gt_boxes"], np.float32)[:n]
            # z_bottom -> gravity centre: the training objective's batch
            # contract (train/objective.py) and the reference's loss
            # (head:1167-1179, cat(gravity_center, dims)) expect cz at
            # the box centre; _gravity_np owns the rule (velocity
            # columns pass through)
            from .mp3d import _gravity_np
            boxes[:n] = _gravity_np(raw)
            labels[:n] = np.asarray(info["gt_labels"], np.int32)[:n]
            valid[:n] = True
        return dict(
            token=info["token"],
            features=self._features(info["token"]),
            world2pixel=np.asarray(info["lidar2img"], np.float32),
            origin_shift=np.zeros((3,), np.float32),
            can_bus=np.asarray(info["can_bus"], np.float32),
            gt_boxes=boxes, gt_labels=labels, gt_valid=valid,
            prev=info.get("prev", ""),
        )

    def prev_index(self, index: int) -> Optional[int]:
        """Index of the previous frame in the same scene (temporal queue),
        None at sequence starts — the obtain_history_bev contract."""
        prev = self.infos[index].get("prev", "")
        return self.by_token.get(prev) if prev else None


def make_synthetic_nuscenes(root: str, num_scenes: int = 2,
                            samples_per_scene: int = 3, num_cams: int = 6,
                            feat_hw: int = 4, feat_dim: int = 32,
                            image_wh=(1600.0, 900.0), seed: int = 0) -> str:
    """Synthetic nuScenes-style info pkl + feature HDF5 (temporal chains
    included).  Returns the ann pkl path."""
    import h5py

    from ..geometry import make_pinhole_world2pixel

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    infos = []
    feat_path = os.path.join(root, "nusc_features.hdf5")
    with h5py.File(feat_path, "w") as h5:
        for s in range(num_scenes):
            scene = f"scene{s:03d}"
            prev = ""
            for t in range(samples_per_scene):
                token = f"{scene}_t{t:02d}"
                pos = np.array([t * 2.0, 0.0, 0.0], np.float32)
                l2i = np.stack([
                    make_pinhole_world2pixel(
                        70.0, c * (360.0 / num_cams), pos,
                        image_wh=image_wh)
                    for c in range(num_cams)])
                can_bus = np.zeros((18,), np.float32)
                can_bus[0:2] = (2.0, 0.0) if t else (0.0, 0.0)
                can_bus[-2] = 0.0          # ego yaw (rad)
                can_bus[-1] = 0.0          # yaw delta (deg)
                n = int(rng.integers(1, 5))
                boxes = np.zeros((n, 9), np.float32)
                boxes[:, 0:2] = rng.uniform(-4, 4, (n, 2))
                boxes[:, 2] = -1.0
                boxes[:, 3:6] = rng.uniform(0.5, 2.0, (n, 3))
                boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
                infos.append(dict(
                    token=token, scene_name=scene, lidar2img=l2i,
                    can_bus=can_bus, gt_boxes=boxes,
                    gt_labels=rng.integers(0, 10, n).astype(np.int64),
                    prev=prev,
                ))
                h5.create_dataset(token, data=rng.standard_normal(
                    (num_cams, feat_hw * feat_hw, feat_dim)
                ).astype(np.float32))
                prev = token
    ann = os.path.join(root, "nusc_infos.pkl")
    with open(ann, "wb") as f:
        pickle.dump(infos, f)
    return ann


def collate(samples: Sequence[Dict]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k in samples[0]:
        if k in ("token", "prev"):
            out[k] = [s[k] for s in samples]
        else:
            out[k] = np.stack([s[k] for s in samples])
    return out
