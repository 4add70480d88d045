"""Eval-runner tests: visible-mask plumbing and layout IoU metric."""

import dataclasses

import numpy as np

from tests.test_model_forward import TINY
from vln_ver_tpu.data import MP3DDataset, make_synthetic_dataset
from vln_ver_tpu.evaluation.runner import evaluate_model
from vln_ver_tpu.models import VoxelFormer

import jax  # noqa: E402


def _dataset(tmp_path, cfg):
    ann = make_synthetic_dataset(
        str(tmp_path), num_scans=1, viewpoints_per_scan=2,
        num_cams=cfg.num_cams, feat_hw=cfg.feat_h,
        feat_dim=cfg.in_channels,
        occ_dims=(cfg.occ_zdim, cfg.occ_ydim, cfg.occ_xdim),
        pc_range=cfg.pc_range)
    return MP3DDataset(ann, str(tmp_path), voxel_num=cfg.voxel_num,
                       occupancy_classes=cfg.occupancy_classes,
                       num_cams=cfg.num_cams, feat_hw=cfg.feat_h)


def test_evaluate_model_with_layouts(tmp_path):
    cfg = dataclasses.replace(TINY, add_layout=True)
    ds = _dataset(tmp_path, cfg)
    model = VoxelFormer(cfg)
    s = ds[0]
    params = model.init(jax.random.PRNGKey(0), s["features"][None],
                        s["world2pixel"][None], s["origin_shift"][None])
    metrics = evaluate_model(model, params, ds, limit=2)
    assert "layout_iou" in metrics
    assert 0.0 <= metrics["layout_iou"] <= 1.0
    assert "miou" in metrics and np.isfinite(metrics["miou"])


def test_evaluate_model_respects_visible_mask(tmp_path):
    cfg = TINY
    ds = _dataset(tmp_path, cfg)
    # mark everything invisible for sample 0 -> metrics exclude it entirely
    info = ds.data_infos[0]
    invalid = np.arange(cfg.voxel_num)
    path = str(tmp_path / "invalid0.npy")
    np.save(path, invalid)
    info["occ_invalid_path"] = path
    sample = ds[0]
    assert "occ_visible" in sample
    assert sample["occ_visible"].sum() == 0
