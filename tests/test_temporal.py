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


def test_tsa_matches_torch_reference_transcription():
    """Standalone TSA vs a torch transcription of the reference forward
    (voxel_temporal_self_attention.py:150-273) with the encoder's
    once-stacked value semantics (voxel_encoder.py:252-269), sharing
    weights: values are pos-LESS, the 'current' slot is the frame-initial
    grid, slot-0 refs are ego-shifted, conditioning is
    [prev, pos-added query]."""
    import torch
    import jax.numpy as jnp

    from tests.test_deform_attn import torch_msda_3d
    from vln_ver_tpu.models.temporal import VoxelTemporalSelfAttention

    Z, H, W = 2, 3, 4
    nq, C, heads, P = Z * H * W, 16, 4, 2
    rng = np.random.default_rng(0)
    q = rng.standard_normal((1, nq, C)).astype(np.float32)
    prev = rng.standard_normal((1, nq, C)).astype(np.float32)
    frame = rng.standard_normal((1, nq, C)).astype(np.float32)
    pos = rng.standard_normal((1, nq, C)).astype(np.float32)
    shift = (rng.standard_normal((1, 3)) * 0.1).astype(np.float32)
    refs = rng.uniform(0.1, 0.9, (1, nq, 1, 3)).astype(np.float32)

    tsa = VoxelTemporalSelfAttention(embed_dims=C, num_heads=heads,
                                     num_levels=1, num_points=P)
    kw = dict(query_pos=jnp.asarray(pos), frame_query=jnp.asarray(frame),
              shift=jnp.asarray(shift))
    params = tsa.init(jax.random.PRNGKey(0), jnp.asarray(q),
                      jnp.asarray(prev), jnp.asarray(refs),
                      ((Z, H, W),), **kw)

    p = params["params"]

    def lin(x, name):
        k = torch.from_numpy(np.asarray(p[name]["kernel"]))
        b = torch.from_numpy(np.asarray(p[name]["bias"]))
        return x @ k + b

    def torch_tsa(tq, value, href):
        bs, queue = 1, 2
        query = tq + torch.from_numpy(pos)
        qcat = torch.cat([value[:bs], query], -1)
        v = lin(value, "value_proj").reshape(bs * 2, nq, heads, C // heads)
        off = lin(qcat, "sampling_offsets").view(
            bs, nq, heads, queue, 1, P, 3)
        att = lin(qcat, "attention_weights").view(
            bs, nq, heads, queue, 1 * P).softmax(-1).view(
            bs, nq, heads, queue, 1, P)
        att = att.permute(0, 3, 1, 2, 4, 5).reshape(
            bs * 2, nq, heads, 1, P)
        off = off.permute(0, 3, 1, 2, 4, 5, 6).reshape(
            bs * 2, nq, heads, 1, P, 3)
        norm = torch.tensor([[W, H, Z]], dtype=torch.float32)
        locs = (href[:, :, None, :, None, :]
                + off / norm[None, None, None, :, None, :])
        out = torch_msda_3d(v, [(Z, H, W)], locs, att)
        out = out.reshape(bs, queue, nq, C).mean(1)
        return lin(out, "output_proj") + tq

    tq = torch.from_numpy(q)
    trefs = torch.from_numpy(refs)
    tshift = torch.from_numpy(shift)

    # with prev_bev: value = [prev, FRAME-INITIAL], slot-0 refs shifted
    out_j = tsa.apply(params, jnp.asarray(q), jnp.asarray(prev),
                      jnp.asarray(refs), ((Z, H, W),), **kw)
    value = torch.stack([torch.from_numpy(prev),
                         torch.from_numpy(frame)], 1).reshape(2, nq, C)
    href = torch.stack([trefs + tshift[:, None, None, :], trefs],
                       1).reshape(2, nq, 1, 3)
    with torch.no_grad():
        out_t = torch_tsa(tq, value, href)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=1e-5, atol=1e-5)

    # without prev_bev: both value slots are the pos-less incoming query,
    # refs unshifted (the reference's value-None fallback, ":177-187")
    out_j0 = tsa.apply(params, jnp.asarray(q), None, jnp.asarray(refs),
                       ((Z, H, W),), **kw)
    value0 = torch.stack([tq, tq], 1).reshape(2, nq, C)
    href0 = torch.stack([trefs, trefs], 1).reshape(2, nq, 1, 3)
    with torch.no_grad():
        out_t0 = torch_tsa(tq, value0, href0)
    np.testing.assert_allclose(np.asarray(out_j0), out_t0.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_tsa_shift_reachable_through_full_forward():
    """tsa_shift plumbs end-to-end (detector -> head -> transformer ->
    TSA): a nonzero ego shift must change the temporal forward, and
    obtain_history_bev derives it from the origin-shift deltas
    (regression: the capability existed only for direct only_bev
    callers)."""
    import jax.numpy as jnp

    model = VoxelFormer(TSA_CFG)
    batch = _tiny_batch(cfg=TSA_CFG)
    params = model.init(jax.random.PRNGKey(0), *batch)
    prev = model.apply(params, *batch, only_bev=True)["bev_embed"]
    base = model.apply(params, *batch, prev_bev=prev,
                       only_bev=True)["bev_embed"]
    shifted = model.apply(
        params, *batch, prev_bev=prev,
        tsa_shift=jnp.full((1, 3), 0.25, jnp.float32),
        only_bev=True)["bev_embed"]
    assert float(jnp.max(jnp.abs(shifted - base))) > 1e-6

    # history roll with MOVING origins exercises the derived shift
    q = lambda a: jnp.stack([a, a], axis=1)
    feats, w2p, shift0 = batch
    shifts = jnp.stack([shift0, shift0 + 1.0], axis=1)
    hist = model.apply(params, method=model.obtain_history_bev,
                       features_queue=q(feats),
                       world2pixel_queue=q(w2p),
                       origin_shift_queue=shifts)
    assert np.isfinite(np.asarray(hist, np.float32)).all()
