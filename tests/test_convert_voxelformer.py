"""Reference-fidelity proof: full-model torch oracle -> weight converter ->
our forward, requiring fp32-level agreement on every head output.

The oracle (tests/oracle_voxelformer.py) instantiates the reference module
tree with the reference's exact state_dict names; ``convert_state_dict``
maps that state_dict onto our flax tree.  Both models then run the same
inputs: this converts the north-star fidelity clause ("occupancy volumes
bitwise-comparable within fp32 tolerance") from asserted to measured, and
exercises every name the converter must handle for a real released
checkpoint (tools/convert_voxelformer.py).

Run at full vocc.py size via tools/fidelity_voxelformer.py (slow; not CI).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vln_ver_tpu import geometry
from vln_ver_tpu.convert import convert_state_dict
from vln_ver_tpu.models import VERConfig, VoxelFormer

from oracle_voxelformer import OracleVoxelFormer

CFG = VERConfig(
    num_cams=3, feat_h=6, feat_w=6, in_channels=64,
    embed_dims=64, num_heads=4, encoder_layers=2, decoder_layers=2,
    ffn_dim=128, num_query=12, num_layout_query=4, num_classes=5,
    occupancy_classes=4, occ_dims=8,
    bev_z=2, bev_h=5, bev_w=5,
    occupancy_size=(0.6, 0.6, 0.5),   # occ grid (z, y, x) = (7, 20, 20)
    dropout_rate=0.0, deform_impl="gather",
    refine_occ=True, occ_layout="ref",
)


def _inputs(batch: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal(
        (batch, CFG.num_cams, CFG.feat_h, CFG.feat_w,
         CFG.in_channels)).astype(np.float32)
    w2p = np.stack([
        np.stack([geometry.make_pinhole_world2pixel(
            90.0, deg, [0.1 * b, -0.1, 1.0])
            for deg in (0.0, 120.0, 240.0)])
        for b in range(batch)])
    shift = rng.normal(0, 0.5, (batch, 3)).astype(np.float32)
    return feats, w2p.astype(np.float32), shift


@pytest.fixture(scope="module")
def converted():
    torch.manual_seed(0)
    oracle = OracleVoxelFormer(CFG)
    # randomise embeddings/linears away from torch defaults where defaults
    # are degenerate (e.g. zeros) so the comparison is non-trivial
    with torch.no_grad():
        for p in oracle.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params, skipped = convert_state_dict(sd, CFG)
    return oracle, params, skipped


def test_converter_consumes_every_active_key(converted):
    _, _, skipped = converted
    # only the (upstream-dead) layout branches may remain unconverted when
    # add_layout is off
    assert all(k.startswith("pts_bbox_head.layout_branches.")
               for k in skipped), skipped


def test_full_model_outputs_match_reference(converted):
    oracle, params, _ = converted
    feats, w2p, shift = _inputs(batch=1)

    outs_t = oracle(
        torch.from_numpy(feats[0].reshape(
            CFG.num_cams, 1, CFG.feat_h * CFG.feat_w, CFG.in_channels)),
        torch.from_numpy(w2p), torch.from_numpy(shift))

    model = VoxelFormer(CFG)
    outs_j = model.apply({"params": params}, jnp.asarray(feats),
                         jnp.asarray(w2p), jnp.asarray(shift),
                         deterministic=True)

    # bev_embed: ours (B, nq, C); reference (nq, bs, C)
    bev_t = outs_t["bev_embed"].numpy().transpose(1, 0, 2)
    bev_j = np.asarray(outs_j["bev_embed"])
    np.testing.assert_allclose(bev_j, bev_t, rtol=1e-4, atol=2e-5)

    cls_t = outs_t["all_cls_scores"].numpy()
    np.testing.assert_allclose(np.asarray(outs_j["all_cls_scores"]),
                               cls_t, rtol=1e-4, atol=5e-5)

    box_t = outs_t["all_bbox_preds"].numpy()
    np.testing.assert_allclose(np.asarray(outs_j["all_bbox_preds"]),
                               box_t, rtol=1e-4, atol=5e-5)

    occ_t = outs_t["occupancy_preds"].numpy()
    np.testing.assert_allclose(np.asarray(outs_j["occupancy_preds"]),
                               occ_t, rtol=1e-4, atol=5e-5)


def test_sane_layout_matches_reference_everywhere_but_occ(converted):
    """Our default (Z,H,W,C) occupancy layout is a documented divergence;
    everything upstream of it must still match the reference exactly."""
    oracle, params, _ = converted
    feats, w2p, shift = _inputs(batch=1, seed=3)
    outs_t = oracle(
        torch.from_numpy(feats[0].reshape(
            CFG.num_cams, 1, CFG.feat_h * CFG.feat_w, CFG.in_channels)),
        torch.from_numpy(w2p), torch.from_numpy(shift))

    import dataclasses
    cfg = dataclasses.replace(CFG, occ_layout="zhwc")
    model = VoxelFormer(cfg)
    outs_j = model.apply({"params": params}, jnp.asarray(feats),
                         jnp.asarray(w2p), jnp.asarray(shift),
                         deterministic=True)
    bev_t = outs_t["bev_embed"].numpy().transpose(1, 0, 2)
    np.testing.assert_allclose(np.asarray(outs_j["bev_embed"]), bev_t,
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(outs_j["all_bbox_preds"]),
                               outs_t["all_bbox_preds"].numpy(),
                               rtol=1e-4, atol=5e-5)
    # occupancy head still runs (different, sane layout)
    assert outs_j["occupancy_preds"].shape == \
        outs_t["occupancy_preds"].shape


def test_equal_z_refine_matches_reference():
    """bev_z == occ_zdim with refine_occ: the reference's equal-z refine
    path projects the 5D upsampled volume DIRECTLY (head:567-568 — no
    z-fusing) and flattens z-major over the (occ_x, occ_y) scramble
    (head:578-580); a converted checkpoint with this geometry must
    reproduce the reference occupancy exactly."""
    import dataclasses
    cfg = dataclasses.replace(CFG, occupancy_size=(0.6, 0.6, 1.75))
    assert cfg.occ_zdim == cfg.bev_z

    torch.manual_seed(1)
    oracle = OracleVoxelFormer(cfg)
    with torch.no_grad():
        for p in oracle.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params, _ = convert_state_dict(sd, cfg)

    feats, w2p, shift = _inputs(batch=1, seed=5)
    outs_t = oracle(
        torch.from_numpy(feats[0].reshape(
            cfg.num_cams, 1, cfg.feat_h * cfg.feat_w, cfg.in_channels)),
        torch.from_numpy(w2p), torch.from_numpy(shift))

    model = VoxelFormer(cfg)
    outs_j = model.apply({"params": params}, jnp.asarray(feats),
                         jnp.asarray(w2p), jnp.asarray(shift),
                         deterministic=True)
    # atol 5e-4: this geometry routes more signal through the upsampler
    # convs (XLA vs torch accumulate in different orders — measured max
    # 2.5e-4, mean 5e-5, NO structural outliers); a layout/scramble bug
    # produces O(1) errors
    np.testing.assert_allclose(np.asarray(outs_j["occupancy_preds"]),
                               outs_t["occupancy_preds"].numpy(),
                               rtol=1e-3, atol=5e-4)
