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


def test_evaluate_model_mesh_matches_plain(tmp_path):
    """Single-process multi-chip eval (batch sharded over a (data, view)
    mesh, short final batch padded) must produce identical metrics to the
    plain single-device path."""
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 cpu devices")
    from vln_ver_tpu.parallel import make_mesh

    cfg = dataclasses.replace(TINY, add_layout=True)
    ds = _dataset(tmp_path, cfg)
    model = VoxelFormer(cfg)
    s = ds[0]
    params = model.init(jax.random.PRNGKey(0), s["features"][None],
                        s["world2pixel"][None], s["origin_shift"][None])
    plain = evaluate_model(model, params, ds, limit=2, batch_size=1)
    # batch_size 4 over 2 samples -> one short batch, padded 2->4
    meshed = evaluate_model(model, params, ds, limit=2, batch_size=4,
                            mesh=make_mesh((4, 2)))
    assert set(plain) == set(meshed)
    for k in plain:
        np.testing.assert_allclose(meshed[k], plain[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)


def test_evaluate_model_device_hist_matches_host(tmp_path):
    """The default on-device occupancy histogram path must produce
    IDENTICAL metrics to the per-sample host decode (the oracle path) —
    including multi-threshold @thr-suffixed keys."""
    cfg = TINY
    ds = _dataset(tmp_path, cfg)
    model = VoxelFormer(cfg)
    s = ds[0]
    params = model.init(jax.random.PRNGKey(0), s["features"][None],
                        s["world2pixel"][None], s["origin_shift"][None])
    kw = dict(limit=2, batch_size=2, occ_thresholds=(0.25, 0.5))
    dev = evaluate_model(model, params, ds, device_hist=True, **kw)
    host = evaluate_model(model, params, ds, device_hist=False, **kw)
    assert set(dev) == set(host)
    assert any("@" in k for k in dev)   # suffixed keys exercised
    for k in host:
        np.testing.assert_allclose(dev[k], host[k], rtol=0, atol=0,
                                   err_msg=k)


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


def test_ce_mode_eval_counts_empty_gt(tmp_path):
    """ce-loss eval: dense GT encodes empty as occupancy_classes while
    the ce decode emits empty as the LAST channel — the runner must remap
    GT like the loss does (min(gt, n-1)) or every empty GT voxel falls
    out of the confusion histogram.  Expectation computed independently
    from the raw forward + decode + numpy bincount; the device-hist and
    host-oracle paths must both match it."""
    import jax.numpy as jnp

    from vln_ver_tpu.occupancy import decode_occupancy

    cfg = dataclasses.replace(TINY, occ_loss_type="ce_loss",
                              occupancy_classes=TINY.occupancy_classes + 1)
    ds = _dataset(tmp_path, cfg)
    model = VoxelFormer(cfg)
    s = ds[0]
    params = model.init(jax.random.PRNGKey(0), s["features"][None],
                        s["world2pixel"][None], s["origin_shift"][None])

    # independent expectation over both samples
    n = cfg.occupancy_classes          # ce: channels already incl. empty
    hist = np.zeros((n, n), np.int64)
    for i in range(2):
        smp = ds[i]
        outs = model.apply(params, smp["features"][None],
                           smp["world2pixel"][None],
                           smp["origin_shift"][None], deterministic=True)
        pred = np.asarray(decode_occupancy(
            jnp.asarray(outs["occupancy_preds"][0]), loss_type="ce_loss"))
        gt = np.minimum(smp["occ_dense"], n - 1)
        vis = smp["occ_visible"].astype(bool)
        k = vis & (gt >= 0) & (gt < n)
        hist += np.bincount(n * gt[k] + pred[k],
                            minlength=n * n).reshape(n, n)
    from vln_ver_tpu.evaluation.ssc_metrics import SSCMetrics
    ref = SSCMetrics(n)
    ref.hist += hist
    exp = ref.get_stats()
    assert hist[n - 1].sum() > 0, "synthetic GT must contain empty voxels"

    for device_hist in (True, False):
        m = evaluate_model(model, params, ds, limit=2,
                           device_hist=device_hist)
        np.testing.assert_allclose(m["miou"], exp["miou"], rtol=1e-6,
                                   err_msg=f"device_hist={device_hist}")
        np.testing.assert_allclose(m["iou"], exp["iou"], rtol=1e-6,
                                   err_msg=f"device_hist={device_hist}")
