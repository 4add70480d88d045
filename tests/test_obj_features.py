"""REVERIE object-feature extraction (tools/extract_obj_features.py):
bbox -> 14x14 patch pooling over the reference ViT HDF5 contract."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from extract_obj_features import extract, patch_pool  # noqa: E402


def test_patch_pool_selects_covered_patches():
    grid, c = 14, 8
    feat = np.zeros((grid * grid, c), np.float32)
    # value encodes the patch's (y, x) so the pooled mean is predictable
    for y in range(grid):
        for x in range(grid):
            feat[y * grid + x, 0] = y
            feat[y * grid + x, 1] = x
    # bbox covering exactly patches x in [2, 3], y in [1, 1] of a 224x224
    # image (16 px per patch)
    out = patch_pool(feat, (32, 16, 32, 16), img_w=224, img_h=224)
    assert out[0] == pytest.approx(1.0)
    assert out[1] == pytest.approx(2.5)
    # degenerate boxes fall back to the full-view mean
    out = patch_pool(feat, (500, 500, 1, 1), img_w=224, img_h=224)
    assert np.isfinite(out).all()


def test_extract_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    scan, vp = "scanA", "vp0001"
    token = f"{scan}_{vp}"

    # reference HDF5 contract: (1, 197, 768) values incl CLS row, keys
    # {scan}_{vp}_i1_{ix} with a RAW view index suffix (the reference's
    # loader keys vp+'_i1_'+str(deg) for deg in range(6) —
    # voxel_encoder.py:124-126 — and data/mp3d.py reads the same way)
    feats_path = tmp_path / "vit.hdf5"
    views = {0: rng.standard_normal((1, 197, 768)).astype(np.float32),
             3: rng.standard_normal((1, 197, 768)).astype(np.float32)}
    with h5py.File(feats_path, "w") as h5:
        for ix, v in views.items():
            h5[f"{scan}_{vp}_i1_{ix}"] = v

    bbox_path = tmp_path / "BBoxes.json"
    anno = {token: {
        "obj7": {"name": "chair", "visible_pos": [0, 3],
                 "bbox2d": [[100, 100, 200, 150], [50, 60, 80, 90]]},
        "obj2": {"name": "lamp", "visible_pos": [3],
                 "bbox2d": [[0, 0, 640, 480]]},
        "obj9": {"name": "ghost", "visible_pos": [7],   # view not on disk
                 "bbox2d": [[0, 0, 10, 10]]},
    }}
    bbox_path.write_text(json.dumps(anno))

    out = extract(str(bbox_path), str(feats_path))
    assert token in out
    assert out[token]["ids"] == ["obj2", "obj7"]      # sorted, ghost absent
    feats = out[token]["feats"]
    assert feats.shape == (2, 768) and feats.dtype == np.float32

    # obj2's full-image bbox == mean of all patch tokens of view 3
    expect = views[3][0, 1:, :].mean(axis=0)
    np.testing.assert_allclose(feats[0], expect, rtol=1e-5)

    # obj7 pools both views it is visible in
    p0 = patch_pool(views[0][0, 1:, :], (100, 100, 200, 150), 640, 480)
    p3 = patch_pool(views[3][0, 1:, :], (50, 60, 80, 90), 640, 480)
    np.testing.assert_allclose(feats[1], (p0 + p3) / 2, rtol=1e-5)


def test_mattersim_mapping_hits_ring_keys(tmp_path):
    """visible_pos 14 = elevation ring 1, heading 2 under the MatterSim
    36-view convention -> key _i1_2 (reference voxel_encoder.py:127-130
    per-ring layout)."""
    rng = np.random.default_rng(2)
    v = rng.standard_normal((1, 197, 768)).astype(np.float32)
    with h5py.File(tmp_path / "vit.hdf5", "w") as h5:
        h5["s_v_i1_2"] = v
    (tmp_path / "bb.json").write_text(json.dumps(
        {"s_v": {"o1": {"name": "x", "visible_pos": [14],
                        "bbox2d": [[0, 0, 640, 480]]}}}))
    out = extract(str(tmp_path / "bb.json"), str(tmp_path / "vit.hdf5"),
                  mapping="mattersim")
    np.testing.assert_allclose(out["s_v"]["feats"][0],
                               v[0, 1:, :].mean(axis=0), rtol=1e-5)
    # the default index mapping would look for _i1_14 and find nothing
    assert extract(str(tmp_path / "bb.json"),
                   str(tmp_path / "vit.hdf5")) == {}


def test_cli_writes_env_compatible_pkl(tmp_path):
    rng = np.random.default_rng(1)
    with h5py.File(tmp_path / "vit.hdf5", "w") as h5:
        h5["s_v_i1_0"] = rng.standard_normal((1, 197, 768)).astype(
            np.float32)
    (tmp_path / "bb.json").write_text(json.dumps(
        {"s_v": {"o1": {"name": "x", "visible_pos": [0],
                        "bbox2d": [[10, 10, 50, 50]]}}}))
    out_pkl = tmp_path / "objects.pkl"
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "tools",
                      "extract_obj_features.py"),
         "--bbox", str(tmp_path / "bb.json"),
         "--features", str(tmp_path / "vit.hdf5"),
         "--out", str(out_pkl)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    with open(out_pkl, "rb") as f:
        objects = pickle.load(f)
    # the env contract: token -> {"ids", "feats"}
    assert objects["s_v"]["ids"] == ["o1"]
    assert objects["s_v"]["feats"].shape == (1, 768)
