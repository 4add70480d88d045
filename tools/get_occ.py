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
    p.add_argument("--gzip-level", type=int, default=4,
                   help="gzip compression level for the HDF5 datasets "
                        "(default 4 = h5py's default; the reference dump "
                        "schema requires gzip, not a particular level)")
    p.add_argument("--upload-dtype", default="auto",
                   choices=["auto", "float32", "bfloat16", "int8"],
                   help="dtype of the host->device feature transfer "
                        "(the dominant e2e cost on transfer-bound "
                        "deployments). 'auto' = the model's compute "
                        "dtype (exact for a bf16 pipeline: the encoder "
                        "casts in-graph anyway). 'int8' quantizes "
                        "per (sample, camera, channel) with absmax "
                        "scales and dequantizes on device — NOT exact; "
                        "measured output error in docs/performance.md")
    p.add_argument("--serial", action="store_true",
                   help="disable the pipelined dump (dispatch/fetch "
                        "overlap + writer thread) — oracle path for "
                        "tests; output bytes are identical either way")
    p.add_argument("--from-images", action="store_true",
                   help="FUSED image->VER path: upload raw uint8 panorama "
                        "views and run the on-chip ViT frontend + lift in "
                        "ONE program — exact, and the upload is 5.4 MB/"
                        "volume (36x224x224x3 u8) vs 10.8 MB of bf16 "
                        "features, halving the dominant transfer on "
                        "tunnel/transfer-bound hosts. Replaces the "
                        "offline feature HDF5 with panorama_images.hdf5 "
                        "(override with --image-file)")
    p.add_argument("--image-file", default=None,
                   help="images HDF5 ({scan}_{vp}_i{cam}_{deg} -> "
                        "(H, W, 3) uint8); default "
                        "<data_root>/panorama_images.hdf5")
    p.add_argument("--vit-checkpoint", default=None,
                   help="HF ViTModel torch state dict for the on-chip "
                        "frontend (omit = random init, smoke only)")
    p.add_argument("--hf-prefix", default="",
                   help="ViT state-dict key prefix (e.g. 'vit.')")
    p.add_argument("--vit-patch-size", type=int, default=16)
    p.add_argument("--vit-layers", type=int, default=12)
    p.add_argument("--vit-heads", type=int, default=12)
    return p.parse_args()


def main():
    args = parse_args()
    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    from vln_ver_tpu.parallel import multihost
    multihost.initialize_if_needed()
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
    savename = args.out or cfg.get("savename") or cfg.get(
        "model", {}).get("pts_bbox_head", {}).get("getbev")
    if not savename:
        raise ValueError("config has no savename/getbev and --out not given")
    os.makedirs(os.path.dirname(os.path.abspath(savename)), exist_ok=True)

    image_size = ver.feat_h * args.vit_patch_size
    ds_kw = dataset_kwargs(cfg, "test")
    ann, root = ds_kw["ann_file"], ds_kw["data_root"]
    # --from-images against a synthetic root whose image HDF5 is absent
    # OR lacks THIS ann's keys (synthetic splits share one root, and an
    # earlier run may have written images for a different split's
    # tokens): fall back to regenerating the self-consistent 'forall'
    # split WITH images — deterministic seed, so shared per-token
    # artifacts (features/w2p/occ) keep their bytes
    imgs_missing = False
    if args.from_images:
        img_path = (args.image_file
                    or os.path.join(root or "data/mp3d",
                                    "panorama_images.hdf5"))
        if not os.path.exists(img_path):
            imgs_missing = True
        elif os.path.exists(ann):
            import pickle

            import h5py
            with open(ann, "rb") as f:
                infos = pickle.load(f)
            if infos:
                scan, vp = infos[0]["token"].split("_")
                with h5py.File(img_path, "r") as f:
                    imgs_missing = f"{scan}_{vp}_i1_0" not in f
    if imgs_missing and (not args.synthetic or args.image_file):
        # a custom --image-file is a hard contract even under
        # --synthetic: regeneration writes the DEFAULT
        # panorama_images.hdf5, never the custom path, so proceeding
        # would fail later with an obscure h5py error
        raise FileNotFoundError(
            f"--from-images: {img_path} is missing (or lacks this "
            "split's keys); extract panorama views first or pass "
            "--image-file")
    if not os.path.exists(ann) or (args.synthetic and imgs_missing):
        if not args.synthetic:
            raise FileNotFoundError(ann)
        os.makedirs(root or "data/mp3d", exist_ok=True)
        ann = make_synthetic_dataset(root or "data/mp3d", split="forall",
                                     num_cams=ver.num_cams,
                                     feat_hw=ver.feat_h,
                                     feat_dim=ver.in_channels,
                                     occ_dims=(ver.occ_zdim, ver.occ_ydim,
                                               ver.occ_xdim),
                                     pc_range=ver.pc_range,
                                     image_hw=((image_size, image_size)
                                               if args.from_images
                                               else None))
    # the dump reads each viewpoint exactly once — caching raw uint8
    # views (5.4 MB each at full size) would grow RSS by the whole
    # image store over a long dump for zero re-reads
    dataset = MP3DDataset(ann, root, voxel_num=ver.voxel_num,
                          occupancy_classes=ver.occupancy_classes,
                          num_cams=ver.num_cams, feat_hw=ver.feat_h,
                          test_mode=True, from_images=args.from_images,
                          image_file=args.image_file,
                          cache_features=not args.from_images)

    model = VoxelFormer(ver)
    s0 = dataset[0]
    feats0 = (np.zeros((1, ver.num_cams, ver.feat_h, ver.feat_w,
                        ver.in_channels), np.float32)
              if args.from_images else s0["features"][None])
    params = model.init(jax.random.PRNGKey(0), feats0,
                        s0["world2pixel"][None], s0["origin_shift"][None])
    if args.checkpoint:
        step = latest_step(args.checkpoint)
        state = create_train_state(model, params, TrainConfig())
        state = restore_state(args.checkpoint, step, state)
        params = state.params

    if args.from_images:
        # FUSED product path: uint8 views -> on-chip ViT -> lift, one
        # jitted program (the stage the reference runs offline,
        # voxelformer.py:317-325 + the absent-upstream extractor)
        from vln_ver_tpu.models.vit import (convert_hf_vit_params,
                                            vit_feature_frontend,
                                            vit_for_ver)
        vit = vit_for_ver(ver, patch_size=args.vit_patch_size,
                          num_layers=args.vit_layers,
                          num_heads=args.vit_heads, dtype=ver.dtype)
        if args.vit_checkpoint:
            import torch
            sd = torch.load(args.vit_checkpoint, map_location="cpu")
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            vit_vars = convert_hf_vit_params(sd, args.vit_layers,
                                             args.vit_heads,
                                             prefix=args.hf_prefix)
        else:
            print("[get_occ] no --vit-checkpoint: RANDOM ViT weights "
                  "(smoke only)")
            import jax.numpy as jnp
            vit_vars = vit.init(jax.random.PRNGKey(1), jnp.zeros(
                (1, image_size, image_size, 3)))
        params = {"ver": params, "vit": vit_vars}

        @jax.jit
        def bev_only(params, images, w2p, shift):
            feats = vit_feature_frontend(vit, params["vit"], images)
            outs = model.apply(params["ver"], feats, w2p, shift,
                               deterministic=True, only_bev=True)
            return outs["bev_embed"], outs["sca_overflow"]
    else:
        @jax.jit
        def bev_only(params, feats, w2p, shift):
            outs = model.apply(params, feats, w2p, shift,
                               deterministic=True, only_bev=True)
            return outs["bev_embed"], outs["sca_overflow"]

    n = min(len(dataset), args.limit or len(dataset))
    # multi-process: contiguous shard per process, one HDF5 shard file each
    # (HDF5 has no concurrent writers); single-process path unchanged
    indices = multihost.shard_indices(n)
    if multihost.process_count() > 1:
        savename = f"{savename}.shard{multihost.process_index()}"
    mesh = None
    if args.mesh:
        from vln_ver_tpu.parallel import (data_axis_size, parse_eval_mesh,
                                          replicate)
        mesh = parse_eval_mesh(args.mesh)
        if args.batch_size % data_axis_size(mesh) != 0:
            raise ValueError(f"--batch-size {args.batch_size} not "
                             f"divisible by mesh data size "
                             f"{data_axis_size(mesh)}")
        params = replicate(mesh, params)

    # pipelined product path: dispatch/fetch overlap + writer thread
    # (vln_ver_tpu/ver_writer.py; --serial keeps the naive oracle loop —
    # identical bytes, tests/test_get_occ_pipeline.py)
    from vln_ver_tpu.ver_writer import dump_volumes
    res = dump_volumes(bev_only, params, ver, dataset, savename,
                       batch_size=args.batch_size, indices=indices,
                       gzip_level=args.gzip_level, serial=args.serial,
                       mesh=mesh, input_cast=args.upload_dtype,
                       input_key=("images" if args.from_images
                                  else "features"))
    print(f"wrote {res['written']} VER volumes to {savename}")
    print(f"e2e: {res['written']} volumes in {res['seconds']:.2f}s = "
          f"{res['volumes_per_sec']:.2f} volumes/s "
          f"(data load -> HDF5 bytes on disk)")
    if res["sca_overflow"] > 0:
        raise SystemExit(
            f"sca_query_capacity overflow: {res['sca_overflow']} visible "
            "queries beyond capacity in the worst camera slot — the "
            "dumped volumes are NOT exact. Validate with "
            "tools/check_query_capacity.py and raise "
            "model.sca_query_capacity, then regenerate.")


if __name__ == "__main__":
    main()
