#!/usr/bin/env python
"""Validate ``sca_query_capacity`` against a dataset.

The capacity-bounded sparse lift (VERConfig.sca_query_capacity > 0) is
exact only when every camera sees at most K voxel queries; beyond K the
lowest-index overflow queries are silently dropped.  This tool scans every
sample's camera matrices (host-side numpy, no device work) and reports the
dataset-wide maximum per-camera visible-query count — the minimum safe
capacity — plus a padded recommendation.

Usage:
  python tools/check_query_capacity.py configs/verformer/vocc.py \
      [--synthetic] [--limit N] [--capacity 256]

Exit status is non-zero when --capacity is given and insufficient, so it
can gate training scripts.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="+", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--capacity", type=int, default=None,
                   help="candidate sca_query_capacity to validate")
    p.add_argument("--split", default="train",
                   choices=["train", "val", "test"])
    args = p.parse_args(argv)

    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    from vln_ver_tpu import geometry
    from vln_ver_tpu.config import build_ver_config, load_config
    from vln_ver_tpu.config.api import apply_cfg_options, dataset_kwargs
    from vln_ver_tpu.data import MP3DDataset, make_synthetic_dataset

    cfg = apply_cfg_options(load_config(args.config), args.cfg_options)
    ver = build_ver_config(cfg)
    ds_kw = (dataset_kwargs(cfg, args.split)
             or dataset_kwargs(cfg, "train"))
    ann, root = ds_kw["ann_file"], ds_kw["data_root"]
    if not os.path.exists(ann):
        if not args.synthetic:
            raise FileNotFoundError(ann)
        os.makedirs(root or "data/mp3d", exist_ok=True)
        ann = make_synthetic_dataset(root or "data/mp3d", split=args.split,
                                     num_cams=ver.num_cams,
                                     feat_hw=ver.feat_h,
                                     feat_dim=ver.in_channels,
                                     occ_dims=(ver.occ_zdim, ver.occ_ydim,
                                               ver.occ_xdim),
                                     pc_range=ver.pc_range)
    dataset = MP3DDataset(ann, root, voxel_num=ver.voxel_num,
                          occupancy_classes=ver.occupancy_classes,
                          num_cams=ver.num_cams, feat_hw=ver.feat_h,
                          test_mode=True, cache_features=False)

    n = len(dataset) if args.limit is None else min(args.limit,
                                                    len(dataset))
    worst, worst_i = 0, -1
    for i in range(n):
        s = dataset[i]
        need = geometry.max_visible_queries(
            s["world2pixel"][None], s["origin_shift"][None],
            ver.bev_z, ver.bev_h, ver.bev_w, ver.pc_range)
        if need > worst:
            worst, worst_i = need, i
    # round up to the next multiple of 64 with one tile of slack —
    # MXU/VPU-friendly and robust to unseen viewpoints of the same rig
    pad = int(np.ceil(worst / 64.0)) * 64 + 64
    print(f"samples scanned: {n}; voxel queries: {ver.bev_num}; "
          f"max visible per camera: {worst} (sample {worst_i})")
    print(f"minimum safe sca_query_capacity: {worst}; "
          f"recommended (padded): {min(pad, ver.bev_num)}")
    if args.capacity is not None:
        if args.capacity < worst:
            print(f"CAPACITY {args.capacity} INSUFFICIENT (< {worst})")
            return 1
        print(f"capacity {args.capacity} ok (>= {worst})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
