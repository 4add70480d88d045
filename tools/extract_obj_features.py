#!/usr/bin/env python
"""REVERIE object-feature extraction: bbox annotations + ViT view features
-> candidate-object feature pkl for the VLN agent.

The REVERIE task grounds a *remote object* at the stop viewpoint; agents of
the DUET/HAMT lineage consume pre-extracted per-object features.  This is
the offline builder for our env's contract
(``R2REnv(objects=...)``: ``{scan}_{vp} -> {"ids": [objId...],
"feats": (N, C) float32}``), computed TPU-input-side from the same ViT
patch-feature HDF5 the VER trunk reads (reference contract
``{scan}_{vp}_i{cam}_{deg} -> (1, 197, 768)``, CLS row dropped,
detectors/voxelformer.py:317-325): each object's bbox (from REVERIE's
``BBoxes.json``) is projected onto the 14x14 patch grid of the view(s) it
is visible in and the covered patch tokens are mean-pooled.

BBox JSON schema (REVERIE v1):
  {"{scan}_{vp}": {objId: {"name": ..., "visible_pos": [view_ix...],
                           "bbox2d": [[x, y, w, h], ...]}, ...}, ...}

View-index -> HDF5 key mapping (--view-mapping):
  index (default): key suffix IS the raw view index
    ({scan}_{vp}_i{cam}_{ix}) — the convention of the reference's own
    loader (voxel_encoder.py:124-126 keys vp+'_i1_'+str(deg) for deg in
    range(6), i.e. an index, not degrees) and of this repo's data layer
    (data/mp3d.py, data/synthetic.py).
  mattersim: REVERIE's visible_pos enumerate the MatterSim 36-view
    panorama (3 elevation rings x 12 headings); map to the reference's
    dormant per-ring layout _i{ring}_{heading}
    (voxel_encoder.py:127-130, commented out upstream).

Usage:
  python tools/extract_obj_features.py --bbox BBoxes.json \
      --features new_vit_base_patch16_197_imagenet.hdf5 --out objects.pkl
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def patch_pool(feat: np.ndarray, bbox, img_w: int, img_h: int,
               grid: int = 14) -> np.ndarray:
    """Mean-pool the patch tokens covered by ``bbox`` (x, y, w, h in image
    pixels).  ``feat`` is (grid*grid, C) — the CLS-dropped token grid,
    row-major (y, x).  Clamps to the image; empty boxes fall back to the
    full-view mean."""
    x, y, w, h = [float(v) for v in bbox]
    sx, sy = grid / img_w, grid / img_h
    x0 = max(0, min(grid - 1, int(np.floor(x * sx))))
    y0 = max(0, min(grid - 1, int(np.floor(y * sy))))
    x1 = max(x0 + 1, min(grid, int(np.ceil((x + w) * sx))))
    y1 = max(y0 + 1, min(grid, int(np.ceil((y + h) * sy))))
    g = feat.reshape(grid, grid, -1)
    sel = g[y0:y1, x0:x1].reshape(-1, g.shape[-1])
    if sel.size == 0:
        sel = feat
    return sel.mean(axis=0).astype(np.float32)


def view_key(scan: str, vp: str, ix: int, cam: int = 1,
             mapping: str = "index") -> str:
    """HDF5 key for panorama view ``ix`` (see module docstring)."""
    if mapping == "mattersim":
        return f"{scan}_{vp}_i{ix // 12}_{ix % 12}"
    return f"{scan}_{vp}_i{cam}_{int(ix)}"


def extract(bbox_path: str, feature_path: str,
            cam: int = 1, img_w: int = 640, img_h: int = 480,
            max_objects: int | None = None, mapping: str = "index"):
    import h5py
    with open(bbox_path) as f:
        anno = json.load(f)
    out = {}
    missing = 0
    with h5py.File(feature_path, "r") as h5:
        for token, objs in anno.items():
            scan, vp = token.split("_", 1)
            ids, feats = [], []
            for obj_id, entry in sorted(objs.items()):
                pooled = []
                boxes = entry.get("bbox2d", [])
                for k, ix in enumerate(entry.get("visible_pos", [])):
                    key = view_key(scan, vp, int(ix), cam, mapping)
                    if key not in h5 or k >= len(boxes):
                        missing += key not in h5
                        continue
                    ft = np.asarray(h5[key])[0, 1:, :]  # drop CLS row
                    pooled.append(patch_pool(ft, boxes[k], img_w, img_h))
                if pooled:
                    ids.append(obj_id)
                    feats.append(np.mean(pooled, axis=0))
                if max_objects and len(ids) >= max_objects:
                    break
            if ids:
                out[token] = {"ids": ids,
                              "feats": np.stack(feats).astype(np.float32)}
    if missing:
        # silent drops would let a wrong --view-mapping masquerade as a
        # sparse feature file — say what was skipped
        print(f"extract_obj_features: {missing} visible_pos views had no "
              f"HDF5 key under mapping={mapping!r} and were skipped",
              file=sys.stderr)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bbox", required=True, help="REVERIE BBoxes.json")
    p.add_argument("--features", required=True,
                   help="ViT patch-feature HDF5 (reference contract)")
    p.add_argument("--out", required=True, help="output pkl")
    p.add_argument("--cam", type=int, default=1,
                   help="elevation index in the key (index mapping only; "
                        "mattersim derives it from visible_pos//12)")
    p.add_argument("--view-mapping", choices=["index", "mattersim"],
                   default="index",
                   help="visible_pos -> HDF5 key (module docstring)")
    p.add_argument("--img-w", type=int, default=640)
    p.add_argument("--img-h", type=int, default=480)
    p.add_argument("--max-objects", type=int, default=None)
    args = p.parse_args()

    out = extract(args.bbox, args.features, args.cam,
                  args.img_w, args.img_h, args.max_objects,
                  mapping=args.view_mapping)
    with open(args.out, "wb") as f:
        pickle.dump(out, f)
    n_obj = sum(len(v["ids"]) for v in out.values())
    print(f"extracted {n_obj} objects over {len(out)} viewpoints "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
