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

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None,
                   help="ckpt dir (latest step restored); random init if "
                        "omitted")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--occ-thresholds", type=float, nargs="+",
                   default=[0.25])
    p.add_argument("--batch-size", type=int, default=1)
    return p.parse_args()


def main():
    args = parse_args()
    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from vln_ver_tpu.coders import boxes_to_bottom_origin, decode_boxes
    from vln_ver_tpu.config import build_ver_config, load_config
    from vln_ver_tpu.config.api import dataset_kwargs
    from vln_ver_tpu.data import MP3DDataset, make_synthetic_dataset
    from vln_ver_tpu.data.mp3d import iterate_batches
    from vln_ver_tpu.evaluation import SSCMetrics
    from vln_ver_tpu.evaluation.indoor_eval import indoor_eval
    from vln_ver_tpu.models import VoxelFormer
    from vln_ver_tpu.occupancy import decode_occupancy_focal
    from vln_ver_tpu.train import TrainConfig, create_train_state
    from vln_ver_tpu.utils.checkpoint import latest_step, restore_state

    cfg = load_config(args.config)
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

    @jax.jit
    def forward(params, feats, w2p, shift):
        outs = model.apply(params, feats, w2p, shift, deterministic=True)
        dec = jax.vmap(lambda c, b: decode_boxes(
            c, b, max_num=50, num_classes=ver.num_classes))(
                outs["all_cls_scores"][-1], outs["all_bbox_preds"][-1])
        return outs["occupancy_preds"], dec

    n = min(len(dataset), args.limit or len(dataset))
    all_occ_logits = []
    pred_annos, gt_annos = [], []
    occ_gts = []
    for batch in iterate_batches(dataset, args.batch_size,
                                 indices=range(n), drop_last=False):
        occ_logits, dec = forward(params, batch["features"],
                                  batch["world2pixel"],
                                  batch["origin_shift"])
        occ_np = np.asarray(occ_logits)
        for i in range(occ_np.shape[0]):
            all_occ_logits.append(occ_np[i])
            occ_gts.append(np.asarray(batch["occ_dense"][i]))
            boxes = np.asarray(boxes_to_bottom_origin(
                jnp.asarray(dec.bboxes[i])))
            valid = np.asarray(dec.valid[i])
            # gravity-frame GT for AP (bottom-origin converted back)
            gtb = np.asarray(batch["gt_boxes"][i])
            gtv = np.asarray(batch["gt_valid"][i])
            gt_annos.append({"boxes": gtb[gtv][:, :7],
                             "labels": np.asarray(
                                 batch["gt_labels"][i])[gtv]})
            gb = boxes.copy()
            gb[:, 2] += gb[:, 5] * 0.5  # back to gravity for IoU
            pred_annos.append({
                "boxes": gb[valid][:, :7],
                "labels": np.asarray(dec.labels[i])[valid],
                "scores": np.asarray(dec.scores[i])[valid],
            })

    # detection metrics
    det = indoor_eval(gt_annos, pred_annos,
                      classes=tuple(ds_kw.get("classes", ())))
    for k in sorted(det):
        if k.startswith("mA"):
            print(f"{k}: {det[k]:.4f}")

    # occupancy metrics per threshold
    for thr in args.occ_thresholds:
        m = SSCMetrics(ver.occupancy_classes + 1)
        for logits, gt in zip(all_occ_logits, occ_gts):
            pred = np.asarray(decode_occupancy_focal(
                jnp.asarray(logits), thr))
            m.add_batch(pred, gt)
        stats = m.get_stats()
        print(f"== occ threshold {thr}")
        print(f"miou: {stats['miou']:.2f}  iou: {stats['iou']:.2f}  "
              f"P: {stats['precision']:.4f}  R: {stats['recall']:.4f}")


if __name__ == "__main__":
    main()
