"""Reverse-converter proof: flax tree -> reference state_dict.

``export_state_dict`` must be the exact inverse of ``convert_state_dict``
(the forward mapping is all transposes/reshapes/flips, so round-tripping
is bitwise) and must produce names the reference module tree loads
directly — proven by loading the export into a fresh torch oracle and
requiring identical forward outputs.  This is the migration-story
completion: train here, ship a reference-format ``.pth`` any downstream
torch consumer of the reference (tools/train.py:238-248 checkpoint
format) can load by name.
"""

import numpy as np
import pytest
import torch

from vln_ver_tpu.convert import convert_state_dict, export_state_dict
from vln_ver_tpu import geometry

from oracle_voxelformer import OracleVoxelFormer
from test_convert_voxelformer import CFG


@pytest.fixture(scope="module")
def oracle_and_trees():
    torch.manual_seed(1)
    oracle = OracleVoxelFormer(CFG)
    with torch.no_grad():
        for p in oracle.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params, skipped = convert_state_dict(sd, CFG)
    exported = export_state_dict(params, CFG)
    return oracle, sd, params, skipped, exported


def test_roundtrip_is_bitwise(oracle_and_trees):
    _, sd, _, skipped, exported = oracle_and_trees
    # every reference key except the (add_layout=False) dead layout
    # branches comes back, bit-for-bit
    assert set(exported) == set(sd) - set(skipped)
    for k, v in exported.items():
        assert v.dtype == np.float32, k
        np.testing.assert_array_equal(v, sd[k], err_msg=k)


def test_export_loads_into_reference_model(oracle_and_trees):
    oracle, _, _, _, exported = oracle_and_trees
    torch.manual_seed(1234)  # fresh, differently-initialised oracle
    reloaded = OracleVoxelFormer(CFG)
    res = reloaded.load_state_dict(
        {k: torch.from_numpy(v) for k, v in exported.items()},
        strict=False)
    assert res.unexpected_keys == []
    assert all(k.startswith("pts_bbox_head.layout_branches.")
               for k in res.missing_keys), res.missing_keys

    rng = np.random.default_rng(7)
    feats = rng.standard_normal(
        (CFG.num_cams, 1, CFG.feat_h * CFG.feat_w,
         CFG.in_channels)).astype(np.float32)
    w2p = np.stack([geometry.make_pinhole_world2pixel(
        90.0, deg, [0.0, -0.1, 1.0])
        for deg in (0.0, 120.0, 240.0)])[None].astype(np.float32)
    shift = np.zeros((1, 3), np.float32)
    args = (torch.from_numpy(feats), torch.from_numpy(w2p),
            torch.from_numpy(shift))
    outs_a = oracle(*args)
    outs_b = reloaded(*args)
    for key in ("bev_embed", "all_cls_scores", "all_bbox_preds",
                "occupancy_preds"):
        np.testing.assert_array_equal(outs_a[key].detach().numpy(),
                                      outs_b[key].detach().numpy(),
                                      err_msg=key)


def test_roundtrip_from_jax_init():
    """Starting from OUR init (not a converted one): export -> convert
    must reproduce the flax tree bitwise (pure-inverse property on the
    whole parameter space, not just converted points)."""
    import jax
    import jax.numpy as jnp
    from vln_ver_tpu.models import VoxelFormer

    model = VoxelFormer(CFG)
    rng = np.random.default_rng(11)
    feats = jnp.asarray(rng.standard_normal(
        (1, CFG.num_cams, CFG.feat_h, CFG.feat_w,
         CFG.in_channels)).astype(np.float32))
    w2p = jnp.asarray(np.stack([geometry.make_pinhole_world2pixel(
        90.0, deg, [0.0, -0.1, 1.0])
        for deg in (0.0, 120.0, 240.0)])[None].astype(np.float32))
    shift = jnp.zeros((1, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), feats, w2p, shift,
                        deterministic=True)["params"]

    exported = export_state_dict(params, CFG)
    back, _ = convert_state_dict(exported, CFG)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(back)}
    # the inert positional encoding is absent from the flax init and
    # synthesized (as zeros) by the exporter — the only allowed extra
    extras = set(flat_b) - {jax.tree_util.keystr(p) for p, _ in flat_a}
    assert all("positional_encoding" in k for k in extras), extras
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf, dtype=np.float32),
            np.asarray(flat_b[jax.tree_util.keystr(path)]),
            err_msg=jax.tree_util.keystr(path))
