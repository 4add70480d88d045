#!/usr/bin/env python
"""Evaluation CLI: occupancy SSC metrics + indoor 3D detection mAP.

TPU-native replacement for the reference tools/test.py +
apis/test.py::custom_multi_gpu_test: a single jitted eval forward per batch;
decode + metric accumulation on host.  The occ-threshold loop mirrors
tools/test.py:235-238.

Usage:
  python tools/test.py configs/verformer/vocc.py --checkpoint work_dirs/vocc/ckpt \
      [--synthetic] [--limit N] [--occ-thresholds 0.25]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="+", default=None,
                   help="dotted config overrides: key.subkey=value")
    p.add_argument("--checkpoint", default=None,
                   help="ckpt dir (latest step restored); random init if "
                        "omitted")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--occ-thresholds", type=float, nargs="+",
                   default=[0.25])
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--mesh", type=str, default=None,
                   help="single-process multi-chip eval: 'data,view' "
                        "(e.g. 4,2) shards each batch over local chips; "
                        "batch-size must divide by the data axis")
    return p.parse_args()


def main():
    args = parse_args()
    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    from vln_ver_tpu.parallel.multihost import initialize_if_needed
    initialize_if_needed()
    import jax

    from vln_ver_tpu.config import build_ver_config, load_config
    from vln_ver_tpu.config.api import dataset_kwargs
    from vln_ver_tpu.data import MP3DDataset, make_synthetic_dataset
    from vln_ver_tpu.models import VoxelFormer
    from vln_ver_tpu.train import TrainConfig, create_train_state
    from vln_ver_tpu.utils.checkpoint import latest_step, restore_state

    cfg = load_config(args.config)
    from vln_ver_tpu.config.api import apply_cfg_options
    cfg = apply_cfg_options(cfg, args.cfg_options)
    ver = build_ver_config(cfg)

    ds_kw = dataset_kwargs(cfg, "test") or dataset_kwargs(cfg, "val")
    ann, root = ds_kw["ann_file"], ds_kw["data_root"]
    if not os.path.exists(ann):
        if not args.synthetic:
            raise FileNotFoundError(ann)
        os.makedirs(root or "data/mp3d", exist_ok=True)
        ann = make_synthetic_dataset(root or "data/mp3d", split="test",
                                     num_cams=ver.num_cams,
                                     feat_hw=ver.feat_h,
                                     feat_dim=ver.in_channels,
                                     occ_dims=(ver.occ_zdim, ver.occ_ydim,
                                               ver.occ_xdim),
                                     pc_range=ver.pc_range)
    dataset = MP3DDataset(ann, root, voxel_num=ver.voxel_num,
                          occupancy_classes=ver.occupancy_classes,
                          num_cams=ver.num_cams, feat_hw=ver.feat_h,
                          test_mode=False)

    model = VoxelFormer(ver)
    s0 = dataset[0]
    params = model.init(jax.random.PRNGKey(0), s0["features"][None],
                        s0["world2pixel"][None], s0["origin_shift"][None])
    if args.checkpoint:
        step = latest_step(args.checkpoint)
        if step is None:
            raise FileNotFoundError(f"no ckpt under {args.checkpoint}")
        state = create_train_state(model, params, TrainConfig())
        state = restore_state(args.checkpoint, step, state)
        params = state.params
        print(f"restored step {step}")

    mesh = None
    if args.mesh:
        from vln_ver_tpu.parallel import parse_eval_mesh
        mesh = parse_eval_mesh(args.mesh)

    from vln_ver_tpu.evaluation.runner import evaluate_model
    metrics = evaluate_model(model, params, dataset,
                             occ_thresholds=tuple(args.occ_thresholds),
                             limit=args.limit,
                             batch_size=args.batch_size,
                             classes=tuple(ds_kw.get("classes", ())),
                             mesh=mesh)
    for k in sorted(metrics):
        if k.startswith(("mAP", "mAR")):
            print(f"{k}: {metrics[k]:.4f}")
    for k in sorted(metrics):
        if k.startswith(("miou", "iou", "occ_")):
            print(f"{k}: {metrics[k]:.4f}")
    if metrics.get("sca_overflow", 0) > 0:
        raise SystemExit(
            f"sca_query_capacity overflow: {int(metrics['sca_overflow'])} "
            "visible queries beyond capacity in the worst camera slot — "
            "the sparse lift dropped contributions and the metrics above "
            "are NOT exact. Validate with tools/check_query_capacity.py "
            "and raise model.sca_query_capacity.")


if __name__ == "__main__":
    main()
