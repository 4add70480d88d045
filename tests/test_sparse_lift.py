"""Capacity-bounded sparse lift: parity vs the masked-dense SCA.

The sparse path (SpatialCrossAttention.query_capacity > 0) is the
static-shape TPU analog of the reference's data-dependent per-camera
rebatch (spatial_cross_attention.py:137-154): per camera, only the top-K
visible queries run the deformable attention.  It must be math-identical
to the masked-dense formulation whenever every camera sees <= K queries —
with the SAME parameters (the capacity knob changes no parameter shapes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_ver_tpu import geometry
from vln_ver_tpu.models.attention import SpatialCrossAttention


def _inputs(seed=0, bsz=2, cams=4, nq=60, nv=49, c=32, anchors=1,
            max_vis=20):
    rng = np.random.default_rng(seed)
    query = rng.standard_normal((bsz, nq, c)).astype(np.float32)
    value = rng.standard_normal((bsz, cams, nv, c)).astype(np.float32)
    ref = rng.uniform(0.1, 0.9, (bsz, cams, nq, anchors, 2)).astype(
        np.float32)
    # each camera sees a random subset of <= max_vis queries
    mask = np.zeros((bsz, cams, nq, anchors), bool)
    for b in range(bsz):
        for cam in range(cams):
            vis = rng.choice(nq, size=rng.integers(3, max_vis + 1),
                             replace=False)
            mask[b, cam, vis, :] = True
    return (jnp.asarray(query), jnp.asarray(value), jnp.asarray(ref),
            jnp.asarray(mask), ((7, 7),))


def _mods(cap, c=32, impl="onehot"):
    return SpatialCrossAttention(embed_dims=c, num_heads=4, num_points=4,
                                 dropout_rate=0.0, deform_impl=impl,
                                 query_capacity=cap)


def test_sparse_matches_dense_forward():
    args = _inputs()
    dense = _mods(0)
    params = dense.init(jax.random.PRNGKey(0), *args)
    out_dense = dense.apply(params, *args)
    for cap in (24, 32, 60):  # >= max visible (20); 60 == nq -> dense
        out_sparse = _mods(cap).apply(params, *args)
        np.testing.assert_allclose(np.asarray(out_sparse),
                                   np.asarray(out_dense),
                                   rtol=2e-5, atol=2e-5)


def test_sparse_matches_dense_gradients():
    args = _inputs(seed=1)
    dense = _mods(0)
    params = dense.init(jax.random.PRNGKey(0), *args)

    def loss(p, mod):
        out = mod.apply(p, *args)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(
            out.shape) * 0.01))

    g_dense = jax.grad(loss)(params, dense)
    g_sparse = jax.grad(loss)(params, _mods(32))
    flat_d = jax.tree_util.tree_leaves(g_dense)
    flat_s = jax.tree_util.tree_leaves(g_sparse)
    for a, b in zip(flat_d, flat_s):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5)


def test_sparse_matches_dense_gather_impl():
    """The capacity path composes with every deform backend."""
    args = _inputs(seed=2)
    params = _mods(0).init(jax.random.PRNGKey(0), *args)
    out_dense = _mods(0, impl="gather").apply(params, *args)
    out_sparse = _mods(32, impl="gather").apply(params, *args)
    np.testing.assert_allclose(np.asarray(out_sparse),
                               np.asarray(out_dense), rtol=2e-5, atol=2e-5)


def test_overflow_drops_are_detectable():
    """With capacity BELOW a camera's visible count the result differs —
    the documented contract that capacity must be dataset-validated."""
    args = _inputs(seed=3, max_vis=30)
    params = _mods(0).init(jax.random.PRNGKey(0), *args)
    out_dense = _mods(0).apply(params, *args)
    out_tiny = _mods(8).apply(params, *args)
    assert not np.allclose(np.asarray(out_tiny), np.asarray(out_dense),
                           rtol=2e-5, atol=2e-5)


def test_full_model_capacity_parity():
    """End-to-end VoxelFormer forward with sca_query_capacity on."""
    import dataclasses

    from vln_ver_tpu.models import VERConfig, VoxelFormer
    from __graft_entry__ import _example_inputs

    cfg = VERConfig(bev_z=2, bev_h=4, bev_w=4, num_cams=4, embed_dims=32,
                    num_heads=4, encoder_layers=2, decoder_layers=2,
                    ffn_dim=64, num_query=8, num_layout_query=2,
                    occupancy_size=(1.5, 1.5, 0.4375), occ_dims=8,
                    dropout_rate=0.0, feat_h=4, feat_w=4, in_channels=32)
    feats, w2p, shift = _example_inputs(cfg, batch=2)
    model = VoxelFormer(cfg)
    params = model.init(jax.random.PRNGKey(0), feats, w2p, shift)
    out_dense = model.apply(params, feats, w2p, shift, deterministic=True)

    need = geometry.max_visible_queries(
        np.asarray(w2p), np.asarray(shift), cfg.bev_z, cfg.bev_h,
        cfg.bev_w, cfg.pc_range)
    assert 0 < need <= cfg.bev_num
    cap_cfg = dataclasses.replace(cfg, sca_query_capacity=int(need))
    out_sparse = VoxelFormer(cap_cfg).apply(params, feats, w2p, shift,
                                            deterministic=True)
    for k in ("bev_embed", "occupancy_preds", "all_cls_scores"):
        np.testing.assert_allclose(np.asarray(out_sparse[k]),
                                   np.asarray(out_dense[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 cpu devices")
def test_sparse_lift_on_view_sharded_mesh():
    """top_k + one-hot scatter must compose with the (data, view) GSPMD
    mesh: the sharded sparse train step reproduces the unsharded dense
    loss."""
    import dataclasses

    from tests.test_train_step import TINY, _toy_batch
    from vln_ver_tpu.models import VoxelFormer
    from vln_ver_tpu.parallel import make_mesh, replicate, shard_batch
    from vln_ver_tpu.train import (TrainConfig, create_train_state,
                                   make_train_step)

    cfg = dataclasses.replace(TINY, sca_query_capacity=12)
    batch = _toy_batch(b=4, cfg=cfg)
    model = VoxelFormer(cfg)
    params = model.init(jax.random.PRNGKey(0), batch["features"][:1],
                        batch["world2pixel"][:1],
                        batch["origin_shift"][:1])
    tc = TrainConfig(learning_rate=1e-4, matcher="auction")
    state = create_train_state(model, params, tc)

    dense_step = make_train_step(dataclasses.replace(
        cfg, sca_query_capacity=0), tc, donate=False)
    _, m_dense = dense_step(state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh((4, 2))
    sp_step = make_train_step(cfg, tc, donate=False)
    with mesh:
        _, m_sp = sp_step(replicate(mesh, state),
                          shard_batch(mesh, batch),
                          jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m_sp["loss"]),
                               float(m_dense["loss"]), rtol=2e-5)


def test_overflow_metric_surfaces_in_graph():
    """An under-capacity config must REPORT the drop in-graph: the model
    emits ``sca_overflow`` = visible queries beyond K in the worst
    (batch, camera) slot, and the train step forwards it as a metric —
    the guard the reference never needs (its rebatch is data-dependent
    and never drops, spatial_cross_attention.py:137-154)."""
    import dataclasses

    from tests.test_train_step import TINY, _toy_batch
    from vln_ver_tpu.models import VoxelFormer
    from vln_ver_tpu.train import (TrainConfig, create_train_state,
                                   make_train_step)

    batch = _toy_batch(b=2, cfg=TINY)
    model = VoxelFormer(TINY)
    params = model.init(jax.random.PRNGKey(0), batch["features"][:1],
                        batch["world2pixel"][:1],
                        batch["origin_shift"][:1])

    # ground truth from the host validator (never under-counts) and the
    # exact projection mask
    ref3d = geometry.voxel_reference_points(TINY.bev_z, TINY.bev_h,
                                            TINY.bev_w)
    _, mask = jax.vmap(
        lambda w, s: geometry.project_reference_points(
            ref3d, w, s, pc_range=TINY.pc_range))(
                jnp.asarray(batch["world2pixel"]),
                jnp.asarray(batch["origin_shift"]))
    max_vis = int(np.asarray(mask).sum(-1).max())
    assert max_vis > 2, "toy rig must see >2 queries for this test"

    under = dataclasses.replace(TINY, sca_query_capacity=2)
    outs = VoxelFormer(under).apply(
        params, batch["features"], batch["world2pixel"],
        batch["origin_shift"], deterministic=True)
    assert int(outs["sca_overflow"]) == max_vis - 2

    # covering capacity and the dense path both report zero
    cover = dataclasses.replace(TINY, sca_query_capacity=max_vis)
    outs_ok = VoxelFormer(cover).apply(
        params, batch["features"], batch["world2pixel"],
        batch["origin_shift"], deterministic=True)
    assert int(outs_ok["sca_overflow"]) == 0
    outs_dense = model.apply(
        params, batch["features"], batch["world2pixel"],
        batch["origin_shift"], deterministic=True)
    assert int(outs_dense["sca_overflow"]) == 0

    # the train step surfaces it as a metric
    tc = TrainConfig(learning_rate=1e-4, matcher="auction")
    state = create_train_state(VoxelFormer(under), params, tc)
    step = make_train_step(under, tc, donate=False)
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(metrics["sca_overflow"]) == max_vis - 2


def test_max_visible_queries_matches_projection():
    """The host validator replicates project_reference_points' mask."""
    from __graft_entry__ import _example_inputs
    from vln_ver_tpu.models import VERConfig

    cfg = VERConfig(num_cams=6)
    _, w2p, shift = _example_inputs(cfg, batch=3)
    ref3d = geometry.voxel_reference_points(cfg.bev_z, cfg.bev_h, cfg.bev_w)
    _, mask = jax.vmap(
        lambda w, s: geometry.project_reference_points(
            ref3d, w, s, pc_range=cfg.pc_range))(w2p, shift)
    expect = int(np.asarray(mask).sum(-1).max())
    got = geometry.max_visible_queries(np.asarray(w2p), np.asarray(shift),
                                       cfg.bev_z, cfg.bev_h, cfg.bev_w,
                                       cfg.pc_range)
    # the validator dilates the visibility boundary (fp-rounding guard),
    # so it may over-count slightly but must NEVER under-count
    assert expect <= got <= expect + 16, (got, expect)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
