#!/usr/bin/env python
"""Day-one-with-real-data fire drill.

The quality bars in BASELINE.md (occupancy mIoU, R2R SR/SPL) need licensed
MP3D/R2R artifacts that do not exist in this environment.  Every piece of
the day-one path exists; this drill wires them into ONE command so that,
given real data, nothing needs thought:

  1. data contract    — MP3DDataset loads; shape/dtype/flat-order checks
                        (the byte contract of mp3docc_dataset.py)
  2. query capacity   — the sparse lift's K validated against the actual
                        rig geometry (tools/check_query_capacity.py)
  3. checkpoint       — optional reference .pth -> JAX conversion
                        (tools/convert_voxelformer.py, 1e-7 fidelity)
  4. eval             — tools/test.py (SSC mIoU + indoor mAP)
  5. VER dump         — tools/get_occ.py (the pipelined product path)
  6. agent smoke      — tools/train_vln.py imitation steps (NLL must
                        drop); real R2R paths forwarded when given

Usage (real data):
  python tools/fire_drill.py configs/verformer/vocc.py \
      --torch-ckpt /path/vocc.pth \
      --r2r-data-dir /path/R2R --connectivity /path/connectivity

Synthetic dry run (what the suite exercises, tests/test_fire_drill.py):
  python tools/fire_drill.py configs/verformer/vocc_tiny.py --synthetic

Stages run as subprocesses (each tool owns its platform setup); the drill
stops at the first failure and prints a PASS/FAIL summary either way.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def parse_args():
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("config", help="mmcv-style vocc config")
    p.add_argument("--synthetic", action="store_true",
                   help="generate synthetic data where files are absent "
                        "(dry-run mode)")
    p.add_argument("--torch-ckpt", default=None,
                   help="reference .pth to convert; stage 3 is skipped "
                        "without it")
    p.add_argument("--checkpoint", default=None,
                   help="existing JAX ckpt dir for eval/dump (overrides "
                        "the converted one)")
    p.add_argument("--limit", type=int, default=4,
                   help="samples per eval/dump/capacity stage")
    p.add_argument("--vln-steps", type=int, default=24,
                   help="imitation smoke steps (stage 6)")
    p.add_argument("--r2r-data-dir", default=None,
                   help="R2R episode JSONs (forwarded to train_vln)")
    p.add_argument("--connectivity", default=None,
                   help="MP3D connectivity graphs (forwarded to train_vln)")
    p.add_argument("--work-dir", default="work_dirs/fire_drill")
    p.add_argument("--vit-checkpoint", default=None,
                   help="HF ViT .pth for the image->VER stage (random "
                        "weights otherwise — smoke only)")
    p.add_argument("--skip", nargs="*", default=[],
                   metavar="STAGE",
                   help="stage names to skip (contract capacity convert "
                        "eval dump images mesh_dump vln)")
    return p.parse_args()


def _run(cmd, log_path, extra_env=None):
    """Run a stage subprocess; returns (ok, tail)."""
    env = dict(os.environ, JAX_PLATFORMS=os.environ.get(
        "FIRE_DRILL_PLATFORM", "cpu"))
    env.update(extra_env or {})
    with open(log_path, "w") as log:
        r = subprocess.run([sys.executable] + cmd, cwd=REPO, env=env,
                           stdout=log, stderr=subprocess.STDOUT)
    with open(log_path) as f:
        tail = "".join(f.readlines()[-12:])
    return r.returncode == 0, tail


def stage_contract(args, ver, cfg) -> str:
    """In-process: the dataset must load and honor the byte contract."""
    import numpy as np

    from vln_ver_tpu.config.api import dataset_kwargs
    from vln_ver_tpu.data import MP3DDataset, make_synthetic_dataset

    ds_kw = dataset_kwargs(cfg, "val") or dataset_kwargs(cfg, "train")
    ann, root = ds_kw["ann_file"], ds_kw["data_root"]
    if not os.path.exists(ann):
        if not args.synthetic:
            raise FileNotFoundError(
                f"{ann} — pass real data paths in the config, or "
                "--synthetic for a dry run")
        os.makedirs(root or "data/mp3d", exist_ok=True)
        ann = make_synthetic_dataset(
            root or "data/mp3d", num_cams=ver.num_cams,
            feat_hw=ver.feat_h, feat_dim=ver.in_channels,
            occ_dims=(ver.occ_zdim, ver.occ_ydim, ver.occ_xdim),
            pc_range=ver.pc_range)
    ds = MP3DDataset(ann, root, voxel_num=ver.voxel_num,
                     occupancy_classes=ver.occupancy_classes,
                     num_cams=ver.num_cams, feat_hw=ver.feat_h)
    assert len(ds) > 0, "empty dataset"
    for idx in {0, len(ds) - 1}:
        s = ds[idx]
        f = s["features"]
        assert f.shape == (ver.num_cams, ver.feat_h, ver.feat_w,
                           ver.in_channels), f.shape
        assert f.dtype == np.float32, f.dtype
        assert np.isfinite(f).all(), "non-finite features"
        w = s["world2pixel"]
        assert w.shape == (ver.num_cams, 4, 4) and np.isfinite(w).all()
        assert s["origin_shift"].shape == (3,)
        if "occ_dense" in s:
            occ = s["occ_dense"]
            # flat order z*(Y*X) + y*X + x; labels in [0, C] (C = empty)
            assert occ.shape == (ver.voxel_num,), occ.shape
            assert occ.min() >= 0 and occ.max() <= ver.occupancy_classes
    return f"{len(ds)} samples, contract ok"


def main():
    args = parse_args()
    os.makedirs(args.work_dir, exist_ok=True)

    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    from vln_ver_tpu.config import build_ver_config, load_config
    cfg = load_config(args.config)
    ver = build_ver_config(cfg)

    syn = ["--synthetic"] if args.synthetic else []
    ckpt = args.checkpoint
    results = []

    def record(name, ok, detail):
        results.append((name, ok, detail))
        print(f"[fire_drill] {name}: {'PASS' if ok else 'FAIL'} — "
              f"{detail.strip().splitlines()[-1] if detail.strip() else ''}",
              flush=True)
        if not ok:
            finish()

    def finish():
        print("\n=== fire drill summary ===")
        for name, ok, _ in results:
            print(f"  {'PASS' if ok else 'FAIL'}  {name}")
        bad = [n for n, ok, _ in results if not ok]
        if bad:
            print(f"\nfailed at: {bad[0]} (log under {args.work_dir})")
            sys.exit(1)
        print("\nall stages green — the day-one path works on this data")
        sys.exit(0)

    t0 = time.time()

    # 1. data contract (in-process)
    if "contract" not in args.skip:
        try:
            detail = stage_contract(args, ver, cfg)
            record("contract", True, detail)
        except Exception as e:  # noqa: BLE001 — report, don't crash
            record("contract", False, f"{type(e).__name__}: {e}")

    # 2. sparse-lift capacity vs the rig
    if "capacity" not in args.skip:
        cmd = [f"{HERE}/check_query_capacity.py", args.config,
               "--limit", str(args.limit), "--split", "val"] + syn
        if ver.sca_query_capacity:
            cmd += ["--capacity", str(ver.sca_query_capacity)]
        ok, tail = _run(cmd, f"{args.work_dir}/capacity.log")
        record("capacity", ok, tail)

    # 3. reference checkpoint conversion; without a .pth the drill still
    # proves the conversion machinery via the random-init torch-oracle
    # selftest (convert_voxelformer --selftest)
    if "convert" not in args.skip:
        if args.torch_ckpt:
            out = os.path.join(args.work_dir, "converted_ckpt")
            ok, tail = _run([f"{HERE}/convert_voxelformer.py", args.config,
                             "--torch-ckpt", args.torch_ckpt,
                             "--out", out],
                            f"{args.work_dir}/convert.log")
            record("convert", ok, tail)
            if ok and not ckpt:
                ckpt = out
        elif args.synthetic:
            ok, tail = _run([f"{HERE}/convert_voxelformer.py", args.config,
                             "--selftest"],
                            f"{args.work_dir}/convert.log")
            record("convert", ok, tail)

    # 4. eval: SSC mIoU + indoor mAP
    if "eval" not in args.skip:
        cmd = [f"{HERE}/test.py", args.config,
               "--limit", str(args.limit)] + syn
        if ckpt:
            cmd += ["--checkpoint", ckpt]
        ok, tail = _run(cmd, f"{args.work_dir}/eval.log")
        record("eval", ok, tail)

    # 5. VER volume dump (the product path)
    ver_h5 = os.path.join(args.work_dir, "ver.hdf5")
    if "dump" not in args.skip:
        if os.path.exists(ver_h5):
            os.remove(ver_h5)
        cmd = [f"{HERE}/get_occ.py", args.config,
               "--limit", str(args.limit), "--out", ver_h5] + syn
        if ckpt:
            cmd += ["--checkpoint", ckpt]
        ok, tail = _run(cmd, f"{args.work_dir}/dump.log")
        if ok:
            import h5py
            with h5py.File(ver_h5, "r") as f:
                n = len(f)
            ok, tail = n > 0, f"{tail}\n{n} volumes in {ver_h5}"
        record("dump", ok, tail)

    # 5b. fused image->VER dump (--from-images): uint8 panorama views
    # through the on-chip ViT + lift in one program.  Synthetic mode
    # generates images; on real data the stage runs only when the
    # panorama_images.hdf5 artifact exists.
    if "images" not in args.skip:
        from vln_ver_tpu.config.api import dataset_kwargs
        ds_kw = dataset_kwargs(cfg, "test") or dataset_kwargs(cfg, "val")
        # anchor relative roots to REPO — the stage subprocesses run with
        # cwd=REPO (_run), the drill itself may be launched elsewhere
        have_imgs = args.synthetic or (ds_kw and os.path.exists(
            os.path.join(REPO, ds_kw["data_root"] or "",
                         "panorama_images.hdf5")))
        if not have_imgs:
            print("[fire_drill] images: skipped (no panorama_images.hdf5"
                  " under the data root)", flush=True)
        else:
            img_h5 = os.path.join(args.work_dir, "ver_from_images.hdf5")
            if os.path.exists(img_h5):
                os.remove(img_h5)
            cmd = [f"{HERE}/get_occ.py", args.config, "--from-images",
                   "--limit", str(args.limit), "--out", img_h5] + syn
            if args.synthetic:
                # tiny-config-safe ViT (heads must divide in_channels)
                cmd += ["--vit-layers", "2", "--vit-heads", "4"]
            if args.vit_checkpoint:
                cmd += ["--vit-checkpoint", args.vit_checkpoint]
            if ckpt:
                cmd += ["--checkpoint", ckpt]
            ok, tail = _run(cmd, f"{args.work_dir}/images.log")
            if ok:
                import h5py
                with h5py.File(img_h5, "r") as f:
                    n = len(f)
                ok, tail = n > 0, f"{tail}\n{n} fused volumes in {img_h5}"
            record("images", ok, tail)

    # 5c. the SAME dump under a 2-device mesh must reproduce stage 5's
    # volumes (GSPMD camera-axis reduction tolerance) — validates the
    # scale-out path on day one.  CPU stages only: forcing virtual
    # devices on a 1-chip TPU tunnel would be a lie.
    if ("mesh_dump" not in args.skip and "dump" not in args.skip
            and os.environ.get("FIRE_DRILL_PLATFORM", "cpu") == "cpu"):
        mesh_h5 = os.path.join(args.work_dir, "ver_mesh.hdf5")
        if os.path.exists(mesh_h5):
            os.remove(mesh_h5)
        cmd = [f"{HERE}/get_occ.py", args.config,
               "--limit", str(args.limit), "--out", mesh_h5,
               "--mesh", "2", "--batch-size", "2"] + syn
        if ckpt:
            cmd += ["--checkpoint", ckpt]
        ok, tail = _run(
            cmd, f"{args.work_dir}/mesh_dump.log",
            extra_env={"XLA_FLAGS":
                       "--xla_force_host_platform_device_count=2"})
        if ok and os.path.exists(ver_h5):
            import h5py
            import numpy as np
            with h5py.File(ver_h5, "r") as fa, \
                    h5py.File(mesh_h5, "r") as fb:
                same = sorted(fa) == sorted(fb)
                err = max((float(np.abs(fa[k][:] - fb[k][:]).max())
                           for k in fa), default=0.0) if same else np.inf
            ok = same and err < 1e-3
            tail += f"\nmesh-vs-plain max abs dev: {err:.2e}"
        record("mesh_dump", ok, tail)

    # 6. VLN agent smoke: a few imitation steps must run and report NLL
    if "vln" not in args.skip:
        cmd = [f"{HERE}/train_vln.py", "--steps", str(args.vln_steps),
               "--eval-interval", str(args.vln_steps),
               "--eval-limit", "2",
               "--work-dir", os.path.join(args.work_dir, "vln")]
        if args.r2r_data_dir:
            cmd += ["--data-dir", args.r2r_data_dir]
            if args.connectivity:
                cmd += ["--connectivity", args.connectivity]
            if os.path.exists(ver_h5):
                cmd += ["--ver", ver_h5]
        else:
            cmd += ["--synthetic"]
        ok, tail = _run(cmd, f"{args.work_dir}/vln.log")
        record("vln", ok, tail)

    print(f"\ntotal: {time.time() - t0:.1f}s")
    finish()


if __name__ == "__main__":
    main()
