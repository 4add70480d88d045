"""Fused image->VER path (the reference's offline feature-extraction
stage folded on-chip).

The reference consumes precomputed ViT features (voxelformer.py:317-325)
produced by an extractor it never ships; this repo owns both halves — the
TPU ViT (models/vit.py, HF-parity-tested) and the lift — and the fused
path runs them in ONE jitted program fed by raw uint8 panorama views
(tools/get_occ.py --from-images, serve_ver image requests).  The fused
program must reproduce the two-stage pipeline (extract -> feature HDF5 ->
lift) at fp32 tolerance: identical math, only the staging differs.
"""

import os
import subprocess
import sys

import h5py
import jax
import numpy as np
import pytest

from tests.test_model_forward import TINY
from vln_ver_tpu.data import MP3DDataset, make_synthetic_dataset
from vln_ver_tpu.models import VoxelFormer
from vln_ver_tpu.models.vit import (preprocess_images, vit_feature_frontend,
                                    vit_for_ver)
from vln_ver_tpu.ver_writer import dump_volumes

PATCH = 8  # tiny rig: feat 4x4 -> 32x32 images


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("imgds"))
    cfg = TINY
    img_size = cfg.feat_h * PATCH
    ann = make_synthetic_dataset(
        root, num_scans=1, viewpoints_per_scan=5, num_cams=cfg.num_cams,
        feat_hw=cfg.feat_h, feat_dim=cfg.in_channels,
        occ_dims=(cfg.occ_zdim, cfg.occ_ydim, cfg.occ_xdim),
        pc_range=cfg.pc_range, image_hw=(img_size, img_size))

    vit = vit_for_ver(cfg, patch_size=PATCH, num_layers=2, num_heads=4)
    vit_vars = vit.init(jax.random.PRNGKey(1),
                        np.zeros((1, img_size, img_size, 3), np.float32))

    # two-stage oracle: run the extractor over the images and write the
    # reference feature-HDF5 schema ((1, 1+P, C), CLS kept — the dataset
    # strips it at load, data/mp3d.py _get_feature)
    extract = jax.jit(lambda u8: vit.apply(
        vit_vars, preprocess_images(u8, vit.image_size)))
    feat_path = os.path.join(root, "vit_features.hdf5")
    with h5py.File(os.path.join(root, "panorama_images.hdf5"), "r") as fi, \
            h5py.File(feat_path, "w") as fo:
        for k in fi:
            tok = np.asarray(extract(np.asarray(fi[k], np.uint8)[None]))
            fo.create_dataset(k, data=tok)

    ds_feats = MP3DDataset(ann, root, feature_file=feat_path,
                           voxel_num=cfg.voxel_num,
                           occupancy_classes=cfg.occupancy_classes,
                           num_cams=cfg.num_cams, feat_hw=cfg.feat_h,
                           test_mode=True)
    ds_imgs = MP3DDataset(ann, root, from_images=True,
                          voxel_num=cfg.voxel_num,
                          occupancy_classes=cfg.occupancy_classes,
                          num_cams=cfg.num_cams, feat_hw=cfg.feat_h,
                          test_mode=True)

    model = VoxelFormer(cfg)
    s0 = ds_feats[0]
    params = model.init(jax.random.PRNGKey(0), s0["features"][None],
                        s0["world2pixel"][None], s0["origin_shift"][None])
    fused_params = {"ver": params, "vit": vit_vars}

    @jax.jit
    def bev_feats(params, feats, w2p, shift):
        outs = model.apply(params, feats, w2p, shift, deterministic=True,
                           only_bev=True)
        return outs["bev_embed"], outs["sca_overflow"]

    @jax.jit
    def bev_images(p, images, w2p, shift):
        feats = vit_feature_frontend(vit, p["vit"], images)
        outs = model.apply(p["ver"], feats, w2p, shift,
                           deterministic=True, only_bev=True)
        return outs["bev_embed"], outs["sca_overflow"]

    return (cfg, ds_feats, ds_imgs, params, fused_params, bev_feats,
            bev_images)


def _read_all(path):
    out = {}
    with h5py.File(path, "r") as f:
        for k in f:
            assert f[k].compression == "gzip", k
            out[k] = f[k][:]
    return out


def test_image_sample_contract(setup):
    cfg, _, ds_imgs, *_ = setup
    s = ds_imgs[0]
    assert "features" not in s
    img = s["images"]
    assert img.dtype == np.uint8
    assert img.shape == (cfg.num_cams, cfg.feat_h * PATCH,
                         cfg.feat_w * PATCH, 3)


def test_fused_matches_two_stage(setup, tmp_path):
    """One-program image->VER == extract -> feature HDF5 -> lift, at fp32
    tolerance (the staging differs, the math must not)."""
    cfg, ds_feats, ds_imgs, params, fparams, bev_feats, bev_images = setup
    a = str(tmp_path / "two_stage.h5")
    b = str(tmp_path / "fused.h5")
    r1 = dump_volumes(bev_feats, params, cfg, ds_feats, a, batch_size=2)
    r2 = dump_volumes(bev_images, fparams, cfg, ds_imgs, b, batch_size=2,
                      input_key="images")
    assert r1["written"] == r2["written"] == len(ds_feats)
    assert r2["sca_overflow"] == 0
    va, vb = _read_all(a), _read_all(b)
    assert sorted(va) == sorted(vb)
    for k in va:
        denom = max(np.abs(va[k]).max(), 1e-6)
        rel = np.abs(va[k] - vb[k]).max() / denom
        assert rel < 1e-4, (k, rel)


def test_fused_mesh_matches_plain(setup, tmp_path):
    """The fused dump under a (data, view) mesh (uint8 images sharded over
    the camera axis with the w2p matrices) matches the single-device fused
    dump at fp32 reduction tolerance — GSPMD's camera-axis psum reorders
    the fp32 sum (measured ~6e-7 abs), so byte-identity across DIFFERENT
    meshes is not a real property; same-mesh runs stay deterministic
    (tests/test_get_occ_pipeline.py proves serial==pipelined bytes)."""
    from vln_ver_tpu.parallel import make_mesh, replicate

    cfg, _, ds_imgs, _, fparams, _, bev_images = setup
    mesh = make_mesh((4, 2))
    a = str(tmp_path / "plain.h5")
    b = str(tmp_path / "mesh.h5")
    dump_volumes(bev_images, fparams, cfg, ds_imgs, a, batch_size=4,
                 input_key="images")
    dump_volumes(bev_images, replicate(mesh, fparams), cfg, ds_imgs, b,
                 batch_size=4, input_key="images", mesh=mesh)
    va, vb = _read_all(a), _read_all(b)
    assert sorted(va) == sorted(vb)
    for k in va:
        np.testing.assert_allclose(vb[k], va[k], rtol=1e-5, atol=1e-5,
                                   err_msg=k)


def test_image_path_rejects_feature_cast_options(setup, tmp_path):
    cfg, _, ds_imgs, _, fparams, _, bev_images = setup
    with pytest.raises(ValueError, match="feature-upload option"):
        dump_volumes(bev_images, fparams, cfg, ds_imgs,
                     str(tmp_path / "x.h5"), batch_size=2,
                     input_key="images", input_cast="int8")


def test_get_occ_cli_from_images(tmp_path):
    """tools/get_occ.py --from-images end-to-end on the tiny config:
    synthetic images generated, fused program runs, volumes land."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "ver.hdf5")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "").strip()
    r = subprocess.run(
        [sys.executable, "tools/get_occ.py", "configs/verformer/vocc_tiny.py",
         "--synthetic", "--from-images", "--limit", "4", "--batch-size", "2",
         "--vit-patch-size", str(PATCH), "--vit-layers", "1",
         "--vit-heads", "4", "--out", out,
         "--cfg-options", f"data.test.data_root={tmp_path}/tiny",
         f"data.test.ann_file={tmp_path}/tiny/mp3d_forall.pkl"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    with h5py.File(out, "r") as f:
        assert len(f) == 4
        for k in f:
            assert f[k].compression == "gzip"


def test_synthetic_regeneration_is_byte_stable(tmp_path):
    """Regenerating a synthetic root is BYTE-STABLE even when artifacts
    already exist: every random artifact draws from its own
    (seed, split, indices)-keyed stream (synthetic._key_rng), so a
    second call — e.g. get_occ backfilling panorama images next to an
    existing feature store — rewrites ann/w2p/occ with identical bytes
    and only ADDS the missing image keys.  (Regression: the old single
    sequential rng stream shifted whenever a draw was skipped because a
    key existed, silently rewriting every later viewpoint's geometry
    and ground truth.)"""
    import json
    import pickle

    import h5py

    from vln_ver_tpu.data import make_synthetic_dataset

    root = str(tmp_path)
    kw = dict(num_scans=1, viewpoints_per_scan=3, num_cams=2, feat_hw=4,
              feat_dim=8, occ_dims=(4, 8, 8), split="forall")
    ann = make_synthetic_dataset(root, **kw)

    def snapshot():
        with open(ann, "rb") as f:
            infos = pickle.load(f)
        with open(os.path.join(root, "world2pixel",
                               "forallscan000.json")) as f:
            w2p = f.read()
        occs = {i["token"]: np.load(i["occ_gt_path"]).tobytes()
                for i in infos}
        return infos, w2p, occs

    infos1, w2p1, occ1 = snapshot()
    # second generation: features exist (draws skipped), images added
    ann2 = make_synthetic_dataset(root, image_hw=(16, 16), **kw)
    assert ann2 == ann
    infos2, w2p2, occ2 = snapshot()
    assert w2p2 == w2p1
    assert occ2 == occ1
    for a, b in zip(infos1, infos2):
        assert a["token"] == b["token"]
        np.testing.assert_array_equal(a["gt_boxes"], b["gt_boxes"])
        np.testing.assert_array_equal(a["labels"], b["labels"])
    with h5py.File(os.path.join(root, "panorama_images.hdf5"), "r") as f:
        assert len(f) == 3 * 2   # images landed for every (vp, cam)
