"""Product-path integration on the exact reference disk contract.

1. The synthetic fixture must be byte-layout-identical to the reference's
   on-disk data: feature HDF5 values of shape (1, 197, C) whose row 0 is
   the ViT CLS token the reference strips with ``[:, 1:, :]``
   (voxelformer.py:317-325), per-scan ``world2pixel/{scan}.json`` with
   ``{vp}_i1_{deg}`` 4x4 keys + ``scanvp2cord.pkl``
   (voxel_encoder.py:121-135), sparse occupancy ``(M, 2)`` npy + 1-D
   invalid-index npy (mp3docc_dataset.py:505-517).
2. The full product chain runs end-to-end on that fixture through the real
   CLIs: train -> test -> get_occ -> the VLN agent environment consuming
   the dumped VER volumes.
"""

import json
import os
import pickle
import re
import subprocess
import sys

import numpy as np

from tests.test_model_forward import TINY

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY_CFG = os.path.join(REPO, "configs", "verformer", "vocc_tiny.py")


def _make_fixture(root):
    from vln_ver_tpu.data import make_synthetic_dataset
    cfg = TINY
    return make_synthetic_dataset(
        str(root), num_scans=1, viewpoints_per_scan=2,
        num_cams=cfg.num_cams, feat_hw=cfg.feat_h,
        feat_dim=cfg.in_channels,
        occ_dims=(cfg.occ_zdim, cfg.occ_ydim, cfg.occ_xdim),
        pc_range=cfg.pc_range)


def test_fixture_matches_reference_disk_contract(tmp_path):
    import h5py
    ann = _make_fixture(tmp_path)
    cfg = TINY

    with open(ann, "rb") as f:
        infos = pickle.load(f)
    assert infos and all(
        set(i) >= {"token", "scene_name", "gt_boxes", "names", "labels",
                   "layout", "occ_gt_path", "occ_invalid_path"}
        for i in infos)

    # feature HDF5: key '{scan}_{vp}_i1_{deg}', value (1, 197, C) with the
    # CLS row the reference strips (voxelformer.py:322)
    with h5py.File(os.path.join(
            str(tmp_path), "new_vit_base_patch16_197_imagenet.hdf5")) as h5:
        keys = list(h5.keys())
        assert all(re.fullmatch(r".+_vp\d+_i1_\d", k) for k in keys)
        v = h5[keys[0]][:]
        assert v.shape == (1, cfg.feat_h * cfg.feat_w + 1, cfg.in_channels)
        stripped = v[:, 1:, :]
        assert stripped.shape[1] == cfg.feat_h * cfg.feat_w

    # per-scan world2pixel JSON with '{vp}_i1_{deg}' 4x4 row-major keys
    scan = infos[0]["scene_name"]
    with open(os.path.join(str(tmp_path), "world2pixel",
                           f"{scan}.json")) as f:
        cams = json.load(f)
    assert all(re.fullmatch(r"vp\d+_i1_\d", k) for k in cams)
    assert np.asarray(next(iter(cams.values()))).shape == (4, 4)

    # scanvp2cord.pkl: '{scan}_{vp}' -> 3-vector
    with open(os.path.join(str(tmp_path), "scanvp2cord.pkl"), "rb") as f:
        cords = pickle.load(f)
    assert len(np.asarray(cords[infos[0]["token"]]).reshape(-1)) >= 3

    # occupancy: sparse (M, 2) int (index, class); invalid: 1-D indices
    sparse = np.load(infos[0]["occ_gt_path"])
    assert sparse.ndim == 2 and sparse.shape[1] == 2
    assert sparse[:, 0].max() < cfg.voxel_num
    assert sparse[:, 1].max() < cfg.occupancy_classes
    invalid = np.load(infos[0]["occ_invalid_path"])
    assert invalid.ndim == 1 and (len(invalid) == 0
                                  or invalid.max() < cfg.voxel_num)


def _run(args, cwd):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # the pytest conftest exports 8 virtual devices; the CLI subprocesses
    # should see a plain single-device CPU host
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "").strip()
    r = subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    return r.stdout


def test_full_product_path_train_test_getocc_vln(tmp_path):
    wd = str(tmp_path / "wd")
    out = _run(["%s/tools/train.py" % REPO, TINY_CFG, "--synthetic",
                "--max-steps", "2", "--batch-size", "2",
                "--work-dir", wd, "--log-interval", "1",
                "--ckpt-interval", "2"], cwd=str(tmp_path))
    assert "step 2:" in out and "done" in out

    out = _run(["%s/tools/test.py" % REPO, TINY_CFG,
                "--checkpoint", f"{wd}/ckpt", "--limit", "2",
                "--synthetic"], cwd=str(tmp_path))
    assert "miou" in out

    ver_h5 = str(tmp_path / "ver.hdf5")
    out = _run(["%s/tools/get_occ.py" % REPO, TINY_CFG, "--synthetic",
                "--limit", "2", "--out", ver_h5], cwd=str(tmp_path))
    assert "wrote 2 VER volumes" in out

    # the dumped VER feeds the VLN agent environment (agent/data.py
    # load_ver_features expects the reference dump layout (C, Z, H, W))
    from vln_ver_tpu.agent.data import load_ver_features
    from vln_ver_tpu.agent.env import NavGraph, R2REnv
    ver = load_ver_features(ver_h5)
    assert len(ver) == 2
    cfg = TINY
    for v in ver.values():
        assert v.shape == (cfg.bev_num, cfg.embed_dims)

    tokens = sorted(ver)
    scan = tokens[0].split("_")[0]
    vps = [t.split("_", 1)[1] for t in tokens]
    positions = {vps[0]: np.zeros(3, np.float32),
                 vps[1]: np.array([2.0, 0, 0], np.float32)}
    edges = {vps[0]: [vps[1]], vps[1]: [vps[0]]}
    episodes = [dict(scan=scan, path=[vps[0], vps[1]], heading=0.0,
                     instruction_tokens=np.zeros(8, np.int32),
                     instructions=["x"])]
    env = R2REnv(episodes, {scan: NavGraph(positions, edges)}, ver)
    state = env.reset(0)
    obs = env.observe(state)
    assert obs["volume"].shape == (cfg.bev_num, cfg.embed_dims)
    while not state["done"]:
        env.step(state, env.teacher_action(state))
    m = env.metrics(state)
    assert m["success"] == 1.0


def test_collate_rejects_inconsistent_keys():
    """A batch mixing samples with and without a key must fail with a
    clear error (np.stack KeyError / silent mask-drop regression)."""
    import numpy as np
    import pytest

    from vln_ver_tpu.data.mp3d import collate
    a = {"token": "t0", "features": np.zeros((1, 2, 2, 3), np.float32),
         "occ_visible": np.ones(4, np.uint8)}
    b = {"token": "t1", "features": np.zeros((1, 2, 2, 3), np.float32)}
    with pytest.raises(ValueError, match="occ_visible"):
        collate([a, b])
    with pytest.raises(ValueError, match="occ_visible"):
        collate([b, a])
