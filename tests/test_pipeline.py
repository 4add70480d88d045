"""Pipeline-parallel layer stack (parallel/pipeline.py): outputs and
grads must match the sequential stack exactly, including on the real
VoxelEncoderLayer."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_ver_tpu.parallel.pipeline import (make_pp_mesh, pipeline_apply,
                                           sequential_apply,
                                           stack_layer_params)

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 cpu devices")


def _toy_stack(L=4, d=16, seed=0):
    rng = np.random.default_rng(seed)
    trees = [{"w": jnp.asarray(
        rng.standard_normal((d, d)).astype(np.float32) / np.sqrt(d)),
        "b": jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1)}
        for _ in range(L)]
    return stack_layer_params(trees)


def _toy_layer(p, h, scale):
    return jnp.tanh(h @ p["w"] + p["b"]) * scale


@needs8
@pytest.mark.parametrize("stages,micro", [(4, 2), (2, 4), (1, 1)])
def test_pipeline_matches_sequential(stages, micro):
    stacked = _toy_stack(L=4)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 6, 16)).astype(np.float32))
    scale = jnp.float32(1.1)

    ref = sequential_apply(_toy_layer, stacked, x, shared=(scale,))
    mesh = make_pp_mesh(stages)
    out = pipeline_apply(mesh, _toy_layer, stacked, x, shared=(scale,),
                         microbatches=micro)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@needs8
def test_pipeline_composes_with_data_parallel():
    """(stage, data) mesh: microbatch rows split over 'data' while layers
    pipeline over 'stage' — still exactly the sequential stack."""
    stacked = _toy_stack(L=4)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((8, 6, 16)).astype(np.float32))
    scale = jnp.float32(1.05)

    ref = sequential_apply(_toy_layer, stacked, x, shared=(scale,))
    mesh = make_pp_mesh(2, data=4)
    assert mesh.axis_names == ("stage", "data")
    out = pipeline_apply(mesh, _toy_layer, stacked, x, shared=(scale,),
                         microbatches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@needs8
def test_pipeline_grads_match_sequential():
    stacked = _toy_stack(L=4)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 6, 16)).astype(np.float32))
    scale = jnp.float32(0.9)
    mesh = make_pp_mesh(4)

    def loss_seq(p):
        return jnp.sum(jnp.square(sequential_apply(
            _toy_layer, p, x, shared=(scale,))))

    def loss_pp(p):
        return jnp.sum(jnp.square(pipeline_apply(
            mesh, _toy_layer, p, x, shared=(scale,), microbatches=2)))

    g_seq = jax.grad(loss_seq)(stacked)
    g_pp = jax.grad(loss_pp)(stacked)
    for a, b in zip(jax.tree.leaves(g_seq), jax.tree.leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


@needs8
def test_pipeline_on_voxel_encoder_layer():
    """The real SCA encoder layer pipelines stage-parallel with exact
    output parity (deterministic, batch-elementwise)."""
    from tests.test_train_step import TINY, _toy_batch
    from vln_ver_tpu import geometry
    from vln_ver_tpu.models.encoder import VoxelEncoderLayer

    cfg = TINY
    batch = _toy_batch(b=4, cfg=cfg)
    feats = jnp.asarray(batch["features"])
    b, n_cam = feats.shape[:2]
    value = feats.reshape(b, n_cam, -1, cfg.in_channels).astype(jnp.float32)
    ref3d = geometry.voxel_reference_points(cfg.bev_z, cfg.bev_h, cfg.bev_w)
    ref_cam, bev_mask = jax.vmap(
        lambda w2p, shift: geometry.project_reference_points(
            ref3d, w2p, shift, pc_range=cfg.pc_range))(
                jnp.asarray(batch["world2pixel"]),
                jnp.asarray(batch["origin_shift"]))
    ref_cam = ref_cam[:, :, :, None, :]
    bev_mask = bev_mask[:, :, :, None]
    spatial_shapes = ((cfg.feat_h, cfg.feat_w),)

    layer = VoxelEncoderLayer(cfg)
    rng = np.random.default_rng(3)
    query0 = jnp.asarray(rng.standard_normal(
        (b, cfg.bev_num, cfg.embed_dims)).astype(np.float32))

    L = 4
    trees = []
    for i in range(L):
        v = layer.init(jax.random.PRNGKey(10 + i), query0, value,
                       ref_cam, bev_mask, spatial_shapes,
                       deterministic=True)
        trees.append(v["params"])
    stacked = stack_layer_params(trees)

    def layer_fn(p, h, value, ref_cam, bev_mask):
        return layer.apply({"params": p}, h, value, ref_cam, bev_mask,
                           spatial_shapes, deterministic=True)

    ref = sequential_apply(layer_fn, stacked, query0, value, ref_cam,
                           bev_mask)
    mesh = make_pp_mesh(2)
    out = pipeline_apply(mesh, layer_fn, stacked, query0, value, ref_cam,
                         bev_mask, microbatches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # gradient parity on the REAL layer too (the risky part: ppermute /
    # masked-psum / cond transposes through shard_map)
    def loss_seq(p):
        return jnp.sum(jnp.square(sequential_apply(
            layer_fn, p, query0, value, ref_cam, bev_mask)))

    def loss_pp(p):
        return jnp.sum(jnp.square(pipeline_apply(
            mesh, layer_fn, p, query0, value, ref_cam, bev_mask,
            microbatches=2)))

    g_seq = jax.grad(loss_seq)(stacked)
    g_pp = jax.grad(loss_pp)(stacked)
    for (k, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_seq)[0],
            jax.tree_util.tree_flatten_with_path(g_pp)[0]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(k))

