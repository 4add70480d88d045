#!/usr/bin/env python
"""Inspect dataset samples as the model will see them.

Analog of the reference's ``tools/misc/browse_dataset.py``: iterates the
configured (or synthetic) dataset and prints per-sample summaries — token,
feature tensor stats, GT box/label counts, occupancy fill — with optional
occupancy-slice PNG dumps via tools/vis_occ machinery.

Usage:
  python tools/browse_dataset.py configs/verformer/vocc_tiny.py --synthetic \
      --limit 4 [--save-occ out_dir]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="+", default=None)
    p.add_argument("--split", default="train")
    p.add_argument("--limit", type=int, default=8)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--save-occ", default=None,
                   help="directory for occupancy slice PNGs")
    args = p.parse_args()

    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    from vln_ver_tpu.config import build_ver_config
    from vln_ver_tpu.config.api import (apply_cfg_options, dataset_kwargs,
                                        load_config)
    from vln_ver_tpu.data import MP3DDataset, make_synthetic_dataset

    cfg = apply_cfg_options(load_config(args.config), args.cfg_options)
    ver = build_ver_config(cfg)
    ds_kw = dataset_kwargs(cfg, args.split) or dataset_kwargs(cfg, "train")
    ann, root = ds_kw["ann_file"], ds_kw["data_root"]
    if not os.path.exists(ann):
        if not args.synthetic:
            raise FileNotFoundError(
                f"{ann} not found; pass --synthetic to generate data")
        os.makedirs(root or "data/mp3d", exist_ok=True)
        ann = make_synthetic_dataset(
            root or "data/mp3d", num_scans=2, viewpoints_per_scan=4,
            num_cams=ver.num_cams, feat_hw=ver.feat_h,
            feat_dim=ver.in_channels,
            occ_dims=(ver.occ_zdim, ver.occ_ydim, ver.occ_xdim),
            pc_range=ver.pc_range)
    ds = MP3DDataset(ann, root, voxel_num=ver.voxel_num,
                     occupancy_classes=ver.occupancy_classes,
                     num_cams=ver.num_cams, feat_hw=ver.feat_h,
                     test_mode=ds_kw.get("test_mode", False))
    print(f"dataset: {len(ds)} samples, classes={len(ds.classes)}, "
          f"occ classes={len(ds.occ_names)}")

    for i in range(min(args.limit, len(ds))):
        s = ds[i]
        feats = s["features"]
        occ = s["occ_dense"]
        occupied = occ < ver.occupancy_classes
        n_gt = int(s["gt_valid"].sum())
        labels = np.asarray(s["gt_labels"])[np.asarray(s["gt_valid"])]
        names = [ds.classes[int(l)] for l in labels[:6]]
        print(f"[{i}] {s['token']}: feats{tuple(feats.shape)} "
              f"mean={feats.mean():+.3f} std={feats.std():.3f} | "
              f"gt boxes={n_gt} ({', '.join(names)}"
              f"{', ...' if n_gt > 6 else ''}) | "
              f"occ fill={occupied.mean() * 100:.2f}% "
              f"({int(occupied.sum())} voxels)")
        if args.save_occ:
            os.makedirs(args.save_occ, exist_ok=True)
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            grid = occ.reshape(ver.occ_zdim, ver.occ_ydim, ver.occ_xdim)
            # top-down view: first occupied voxel's class looking along -z
            occ_mask = grid < ver.occupancy_classes
            occ_any = occ_mask.any(0)
            first = occ_mask[::-1].argmax(0)
            cls = np.take_along_axis(grid[::-1], first[None], 0)[0]
            img = np.where(occ_any, cls, -1)
            plt.figure(figsize=(4, 4))
            plt.imshow(img, cmap="tab20", interpolation="nearest")
            plt.title(s["token"])
            out = os.path.join(args.save_occ, f"{s['token']}_topdown.png")
            plt.savefig(out, dpi=120)
            plt.close()
            print(f"    wrote {out}")


if __name__ == "__main__":
    main()
