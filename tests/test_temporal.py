"""Temporal self-attention (BEV queue) tests."""

import dataclasses

import jax
import numpy as np

from tests.test_model_forward import TINY, _tiny_batch
from vln_ver_tpu.models import VoxelFormer

TSA_CFG = dataclasses.replace(TINY, use_temporal_self_attn=True)


def test_tsa_forward_with_and_without_prev():
    model = VoxelFormer(TSA_CFG)
    batch = _tiny_batch(cfg=TSA_CFG)
    params = model.init(jax.random.PRNGKey(0), *batch)
    out_none = model.apply(params, *batch)
    assert np.isfinite(np.asarray(out_none["bev_embed"])).all()

    prev = out_none["bev_embed"]
    out_prev = model.apply(params, *batch, prev_bev=prev)
    assert np.isfinite(np.asarray(out_prev["bev_embed"])).all()
    # a different queue slot must change the result
    assert not np.allclose(np.asarray(out_none["bev_embed"]),
                           np.asarray(out_prev["bev_embed"]))


def test_obtain_history_bev_rolls_queue():
    model = VoxelFormer(TSA_CFG)
    batch = _tiny_batch(cfg=TSA_CFG)
    params = model.init(jax.random.PRNGKey(0), *batch)
    feats, w2p, shift = batch
    t = 3
    fq = np.repeat(np.asarray(feats)[:, None], t, axis=1)
    # vary frames so the queue matters
    fq[:, 1] *= 0.5
    wq = np.repeat(np.asarray(w2p)[:, None], t, axis=1)
    sq = np.repeat(np.asarray(shift)[:, None], t, axis=1)
    prev = model.apply(params, fq, wq, sq,
                       method=VoxelFormer.obtain_history_bev)
    assert prev.shape == (1, TSA_CFG.bev_num, TSA_CFG.embed_dims)
    assert np.isfinite(np.asarray(prev)).all()


def test_tsa_params_receive_gradients():
    import jax.numpy as jnp

    model = VoxelFormer(TSA_CFG)
    batch = _tiny_batch(cfg=TSA_CFG)
    params = model.init(jax.random.PRNGKey(0), *batch)

    def loss(p):
        outs = model.apply(p, *batch,
                           prev_bev=jnp.ones(
                               (1, TSA_CFG.bev_num, TSA_CFG.embed_dims)))
        return jnp.sum(outs["bev_embed"] ** 2)

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    tsa_grads = [g for k, g in flat
                 if "temporal_self_attn" in jax.tree_util.keystr(k)]
    assert tsa_grads and any(np.any(np.asarray(g)) for g in tsa_grads)
