#!/usr/bin/env python
"""VER volume generation — the product path (SURVEY.md §3.3).

Runs inference over the test split and appends each viewpoint's
(embed_dims, bev_z, bev_h, bev_w) voxel embedding into an output HDF5 with
``key = token`` and gzip compression — the exact dump schema of the
reference (voxelformer_occupancy_head.py:627-638); this file is the VER
consumed by the downstream VLN agent.

Usage:
  python tools/get_occ.py configs/verformer/get_occ.py \
      [--checkpoint DIR] [--synthetic] [--limit N] [--batch-size B]
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
    p.add_argument("--cfg-options", nargs="+", default=None,
                   help="dotted config overrides: key.subkey=value")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--mesh", type=str, default=None,
                   help="single-process multi-chip: 'data,view' (e.g. 4,2)"
                        " shards each batch over local chips; batch-size "
                        "must divide by the data axis")
    p.add_argument("--out", default=None, help="override savename")
    return p.parse_args()


def main():
    args = parse_args()
    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    from vln_ver_tpu.parallel import multihost
    multihost.initialize_if_needed()
    import h5py
    import jax

    from vln_ver_tpu.config import build_ver_config, load_config
    from vln_ver_tpu.config.api import dataset_kwargs
    from vln_ver_tpu.data import MP3DDataset, make_synthetic_dataset
    from vln_ver_tpu.data.mp3d import iterate_batches
    from vln_ver_tpu.models import VoxelFormer
    from vln_ver_tpu.train import TrainConfig, create_train_state
    from vln_ver_tpu.utils.checkpoint import latest_step, restore_state

    cfg = load_config(args.config)
    from vln_ver_tpu.config.api import apply_cfg_options
    cfg = apply_cfg_options(cfg, args.cfg_options)
    ver = build_ver_config(cfg)
    savename = args.out or cfg.get("savename") or cfg.get(
        "model", {}).get("pts_bbox_head", {}).get("getbev")
    if not savename:
        raise ValueError("config has no savename/getbev and --out not given")
    os.makedirs(os.path.dirname(os.path.abspath(savename)), exist_ok=True)

    ds_kw = dataset_kwargs(cfg, "test")
    ann, root = ds_kw["ann_file"], ds_kw["data_root"]
    if not os.path.exists(ann):
        if not args.synthetic:
            raise FileNotFoundError(ann)
        os.makedirs(root or "data/mp3d", exist_ok=True)
        ann = make_synthetic_dataset(root or "data/mp3d", split="forall",
                                     num_cams=ver.num_cams,
                                     feat_hw=ver.feat_h,
                                     feat_dim=ver.in_channels,
                                     occ_dims=(ver.occ_zdim, ver.occ_ydim,
                                               ver.occ_xdim),
                                     pc_range=ver.pc_range)
    dataset = MP3DDataset(ann, root, voxel_num=ver.voxel_num,
                          occupancy_classes=ver.occupancy_classes,
                          num_cams=ver.num_cams, feat_hw=ver.feat_h,
                          test_mode=True)

    model = VoxelFormer(ver)
    s0 = dataset[0]
    params = model.init(jax.random.PRNGKey(0), s0["features"][None],
                        s0["world2pixel"][None], s0["origin_shift"][None])
    if args.checkpoint:
        step = latest_step(args.checkpoint)
        state = create_train_state(model, params, TrainConfig())
        state = restore_state(args.checkpoint, step, state)
        params = state.params

    @jax.jit
    def bev_only(params, feats, w2p, shift):
        return model.apply(params, feats, w2p, shift, deterministic=True,
                           only_bev=True)["bev_embed"]

    n = min(len(dataset), args.limit or len(dataset))
    # multi-process: contiguous shard per process, one HDF5 shard file each
    # (HDF5 has no concurrent writers); single-process path unchanged
    indices = multihost.shard_indices(n)
    if multihost.process_count() > 1:
        savename = f"{savename}.shard{multihost.process_index()}"
    mesh = None
    if args.mesh:
        from vln_ver_tpu.parallel import (data_axis_size, pad_and_shard,
                                          parse_eval_mesh, replicate)
        mesh = parse_eval_mesh(args.mesh)
        if args.batch_size % data_axis_size(mesh) != 0:
            raise ValueError(f"--batch-size {args.batch_size} not "
                             f"divisible by mesh data size "
                             f"{data_axis_size(mesh)}")
        params = replicate(mesh, params)

    written = 0
    with h5py.File(savename, "a") as outf:
        for batch in iterate_batches(dataset, args.batch_size,
                                     indices=indices, drop_last=False):
            feats, w2p, shift = (batch["features"], batch["world2pixel"],
                                 batch["origin_shift"])
            real = feats.shape[0]
            if mesh is not None:
                # pad short batches to the ONE compiled batch shape
                s, real = pad_and_shard(
                    mesh, {"features": feats, "world2pixel": w2p,
                           "origin_shift": shift}, args.batch_size)
                feats, w2p, shift = (s["features"], s["world2pixel"],
                                     s["origin_shift"])
            bev = np.asarray(bev_only(params, feats, w2p,
                                      shift))[:real]
            # (B, bev_num, C) -> (B, C, Z, H, W) — dump layout parity with
            # the reference (head:634-636)
            b = bev.shape[0]
            vol = bev.reshape(b, ver.bev_z, ver.bev_h, ver.bev_w,
                              ver.embed_dims).transpose(0, 4, 1, 2, 3)
            for i, token in enumerate(batch["token"]):
                if token in outf:
                    del outf[token]
                outf.create_dataset(token, data=vol[i], compression="gzip")
                written += 1
    print(f"wrote {written} VER volumes to {savename}")


if __name__ == "__main__":
    main()
