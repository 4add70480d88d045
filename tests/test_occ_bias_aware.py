"""Bias-aware refined-occupancy path == naive dense upsample-then-project.

The upsampler's interleave makes 3/4 of the refined grid pure bias
(models/head.py _UpStage); the bias-aware path projects the informative
subgrid + one bias cell and interleaves logits.  Must be numerically
identical to the dense path with shared weights, for every batch size and
both z-fused and z-preserving occ_proj shapes.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_model_forward import TINY, _tiny_batch
from vln_ver_tpu.models import VoxelFormer


@pytest.mark.parametrize("batch", [1, 2])
def test_bias_aware_matches_dense(batch):
    cfg_fast = TINY  # occ_layout defaults to 'zhwc' (bias-aware)
    cfg_dense = dataclasses.replace(TINY, occ_layout="zhwc_dense")
    feats, w2p, shift = _tiny_batch(batch)

    model_fast = VoxelFormer(cfg_fast)
    model_dense = VoxelFormer(cfg_dense)
    params = model_fast.init(jax.random.PRNGKey(0), feats, w2p, shift)

    out_fast = model_fast.apply(params, feats, w2p, shift,
                                deterministic=True)
    out_dense = model_dense.apply(params, feats, w2p, shift,
                                  deterministic=True)
    np.testing.assert_allclose(np.asarray(out_fast["occupancy_preds"]),
                               np.asarray(out_dense["occupancy_preds"]),
                               rtol=1e-5, atol=1e-5)
    # everything upstream identical
    np.testing.assert_array_equal(np.asarray(out_fast["bev_embed"]),
                                  np.asarray(out_dense["bev_embed"]))


def test_bias_aware_matches_dense_z_preserving():
    """bev_z == occ_zdim branch of occ_proj."""
    cfg = dataclasses.replace(
        TINY, bev_z=2, occupancy_size=(1.5, 1.5, 1.75))  # occ z = 2 = bev_z
    assert cfg.occ_zdim == cfg.bev_z
    cfg_dense = dataclasses.replace(cfg, occ_layout="zhwc_dense")
    feats, w2p, shift = _tiny_batch(1, cfg)
    model = VoxelFormer(cfg)
    params = model.init(jax.random.PRNGKey(1), feats, w2p, shift)
    out_fast = model.apply(params, feats, w2p, shift, deterministic=True)
    out_dense = VoxelFormer(cfg_dense).apply(params, feats, w2p, shift,
                                             deterministic=True)
    np.testing.assert_allclose(np.asarray(out_fast["occupancy_preds"]),
                               np.asarray(out_dense["occupancy_preds"]),
                               rtol=1e-5, atol=1e-5)


def test_bias_aware_gradients_match_dense():
    """Training goes through the same path — gradients must agree too."""
    cfg_fast = TINY
    cfg_dense = dataclasses.replace(TINY, occ_layout="zhwc_dense")
    feats, w2p, shift = _tiny_batch(1)
    model_fast = VoxelFormer(cfg_fast)
    model_dense = VoxelFormer(cfg_dense)
    params = model_fast.init(jax.random.PRNGKey(0), feats, w2p, shift)

    def loss(m):
        def f(p):
            out = m.apply(p, jnp.asarray(feats), jnp.asarray(w2p),
                          jnp.asarray(shift), deterministic=True)
            return jnp.sum(out["occupancy_preds"].astype(jnp.float32) ** 2)
        return f

    from jax.flatten_util import ravel_pytree
    g_fast = jax.grad(loss(model_fast))(params)
    g_dense = jax.grad(loss(model_dense))(params)
    flat_f, _ = ravel_pytree(g_fast)
    flat_d, _ = ravel_pytree(g_dense)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_d),
                               rtol=1e-4, atol=1e-4)
