"""Serving tool (tools/serve_ver.py): queue requests must be answered
with volumes identical to a direct forward, padding rows dropped, and
malformed requests turned into error files."""

import argparse
import importlib.util
import os
import sys
import time

import jax
import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_serve():
    spec = importlib.util.spec_from_file_location(
        "serve_ver", os.path.join(ROOT, "tools", "serve_ver.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _request(cfg, seed):
    rng = np.random.default_rng(seed)
    from vln_ver_tpu import geometry
    feats = rng.standard_normal(
        (cfg.num_cams, cfg.feat_h, cfg.feat_w, cfg.in_channels)
    ).astype(np.float32)
    w2p = np.stack([
        geometry.make_pinhole_world2pixel(
            90.0, (360 / cfg.num_cams) * i, (0, 0, 0))
        for i in range(cfg.num_cams)]).astype(np.float32)
    return feats, w2p, np.zeros(3, np.float32)


def test_serve_round_trip(tmp_path):
    serve_mod = _load_serve()
    from vln_ver_tpu.config import build_ver_config, load_config
    from vln_ver_tpu.models import VoxelFormer

    config_path = os.path.join(ROOT, "configs", "verformer",
                               "vocc_tiny.py")
    cfg = build_ver_config(load_config(config_path))
    queue = str(tmp_path / "q")
    inbox = os.path.join(queue, "in")
    os.makedirs(inbox, exist_ok=True)

    # 3 requests (batch_max=2 -> one full batch + one padded batch)
    reqs = {f"r{i}": _request(cfg, i) for i in range(3)}
    for rid, (f, w, s) in reqs.items():
        np.savez(os.path.join(inbox, f"{rid}.npz"), features=f,
                 world2pixel=w, origin_shift=s)
    # one malformed request
    np.savez(os.path.join(inbox, "bad.npz"),
             features=np.zeros((1, 2, 2, 3), np.float32),
             world2pixel=np.zeros((1, 4, 4), np.float32),
             origin_shift=np.zeros(3, np.float32))

    args = argparse.Namespace(
        config=config_path, cfg_options=None, checkpoint=None,
        queue=queue, batch_max=2, poll_ms=10, occupancy=True,
        max_requests=3, images=False, vit_checkpoint=None, hf_prefix="",
        vit_patch_size=16, vit_layers=12, vit_heads=12)
    served = serve_mod.serve(args)
    assert served == 3

    # reference forward with the server's deterministic init
    model = VoxelFormer(cfg)
    f0, w0, s0 = reqs["r0"]
    rng = np.random.default_rng(0)
    feats0 = rng.standard_normal(
        (1, cfg.num_cams, cfg.feat_h, cfg.feat_w, cfg.in_channels)
    ).astype(np.float32)
    w2p0 = np.tile(np.eye(4, dtype=np.float32), (1, cfg.num_cams, 1, 1))
    params = model.init(jax.random.PRNGKey(0), feats0, w2p0,
                        np.zeros((1, 3), np.float32))

    outbox = os.path.join(queue, "out")
    for rid, (f, w, s) in reqs.items():
        path = os.path.join(outbox, f"{rid}.npz")
        assert os.path.exists(path), os.listdir(outbox)
        with np.load(path) as z:
            vol = z["volume"]
            occ = z["occupancy"]
        assert vol.shape == (cfg.embed_dims, cfg.bev_z, cfg.bev_h,
                             cfg.bev_w)
        assert occ.shape == (cfg.voxel_num,)
        outs = model.apply(params, f[None], w[None], s[None],
                           deterministic=True, only_bev=False)
        want = np.asarray(outs["bev_embed"]).reshape(
            cfg.bev_z, cfg.bev_h, cfg.bev_w,
            cfg.embed_dims).transpose(3, 0, 1, 2)
        np.testing.assert_allclose(vol, want, rtol=2e-5, atol=2e-5,
                                   err_msg=rid)

    err = os.path.join(outbox, "bad.error.txt")
    assert os.path.exists(err)
    assert not os.listdir(os.path.join(queue, "in"))


def test_serve_image_requests(tmp_path):
    """--images: a request carrying raw uint8 views is answered by the
    fused on-chip ViT + lift program, exactly matching a direct fused
    forward; feature requests keep working in the same claim."""
    serve_mod = _load_serve()
    from vln_ver_tpu.config import build_ver_config, load_config
    from vln_ver_tpu.models import VoxelFormer
    from vln_ver_tpu.models.vit import vit_feature_frontend, vit_for_ver

    config_path = os.path.join(ROOT, "configs", "verformer",
                               "vocc_tiny.py")
    cfg = build_ver_config(load_config(config_path))
    patch = 8
    img_size = cfg.feat_h * patch
    queue = str(tmp_path / "q")
    inbox = os.path.join(queue, "in")
    os.makedirs(inbox, exist_ok=True)

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (cfg.num_cams, img_size, img_size, 3)
                       ).astype(np.uint8)
    feats, w2p, shift = _request(cfg, 0)
    np.savez(os.path.join(inbox, "imgreq.npz"), images=img,
             world2pixel=w2p, origin_shift=shift)
    np.savez(os.path.join(inbox, "featreq.npz"), features=feats,
             world2pixel=w2p, origin_shift=shift)

    args = argparse.Namespace(
        config=config_path, cfg_options=None, checkpoint=None,
        queue=queue, batch_max=2, poll_ms=10, occupancy=False,
        max_requests=2, images=True, vit_checkpoint=None, hf_prefix="",
        vit_patch_size=patch, vit_layers=1, vit_heads=4)
    served = serve_mod.serve(args)
    assert served == 2

    outbox = os.path.join(queue, "out")
    with np.load(os.path.join(outbox, "imgreq.npz")) as z:
        vol = z["volume"]
    with np.load(os.path.join(outbox, "featreq.npz")) as z:
        vol_f = z["volume"]
    assert vol.shape == vol_f.shape == (cfg.embed_dims, cfg.bev_z,
                                        cfg.bev_h, cfg.bev_w)

    # oracle: the server's deterministic init (PRNGKey(0) model,
    # PRNGKey(1) ViT) applied directly
    model = VoxelFormer(cfg)
    rng0 = np.random.default_rng(0)
    feats0 = rng0.standard_normal(
        (1, cfg.num_cams, cfg.feat_h, cfg.feat_w, cfg.in_channels)
    ).astype(np.float32)
    w2p0 = np.tile(np.eye(4, dtype=np.float32), (1, cfg.num_cams, 1, 1))
    params = model.init(jax.random.PRNGKey(0), feats0, w2p0,
                        np.zeros((1, 3), np.float32))
    vit = vit_for_ver(cfg, patch_size=patch, num_layers=1, num_heads=4,
                      dtype=cfg.dtype)
    vit_vars = vit.init(jax.random.PRNGKey(1),
                        np.zeros((1, img_size, img_size, 3), np.float32))
    f_img = vit_feature_frontend(vit, vit_vars, np.asarray(img[None]))
    outs = model.apply(params, f_img, w2p[None], shift[None],
                       deterministic=True, only_bev=True)
    want = np.asarray(outs["bev_embed"]).reshape(
        cfg.bev_z, cfg.bev_h, cfg.bev_w,
        cfg.embed_dims).transpose(3, 0, 1, 2)
    np.testing.assert_allclose(vol, want, rtol=2e-5, atol=2e-5)


def test_sweep_orphans_cross_host_semantics(tmp_path):
    """The orphan sweep may reclaim a cross-host server's requests only on
    STALENESS — pid liveness is meaningless for another host's claims
    (os.kill would probe an unrelated local process)."""
    import importlib
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    sv = importlib.import_module("serve_ver")

    queue = str(tmp_path)
    inbox = os.path.join(queue, "in")
    os.makedirs(inbox)

    def make_claim(dirname, fname, age_s):
        d = os.path.join(queue, dirname)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, fname)
        np.save(path, np.zeros(2, np.float32))
        old = time.time() - age_s
        os.utime(path, (old, old))
        return path

    # 1. cross-host claim, FRESH: must stay even though the pid is not
    #    alive on this host (the pre-fix code stole it immediately)
    make_claim(".claimed.otherhost-994321", "r1.npy", age_s=1.0)
    # 2. cross-host claim, stale: reclaimed
    make_claim(".claimed.otherhost-994321", "r2.npy", age_s=9999.0)
    # 3. same-host dead pid, fresh: reclaimed (liveness verifiable here)
    make_claim(f".claimed.{sv._claim_host()}-994322", "r3.npy", age_s=1.0)
    # 4. our own claim: never touched
    make_claim(f".claimed.{sv._claim_host()}-{os.getpid()}", "r4.npy",
               age_s=9999.0)

    sv._sweep_orphans(queue, inbox, max_age_s=300.0)

    got = sorted(os.listdir(inbox))
    assert got == ["r2.npy", "r3.npy"], got
    assert os.path.exists(os.path.join(
        queue, ".claimed.otherhost-994321", "r1.npy"))
    assert os.path.exists(os.path.join(
        queue, f".claimed.{sv._claim_host()}-{os.getpid()}", "r4.npy"))
