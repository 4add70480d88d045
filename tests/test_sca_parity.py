"""End-to-end parity: masked-dense SpatialCrossAttention (JAX) vs the
reference's sparse per-camera rebatch algorithm (torch, written here from
spatial_cross_attention.py:76-176 semantics) with IDENTICAL weights.

This validates the central TPU-design claim (SURVEY.md §7): running the
deformable attention dense over all queries per camera and masking is
math-identical to the reference's data-dependent gather/scatter."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from vln_ver_tpu.models.attention import SpatialCrossAttention

EMBED, HEADS, PTS, CAMS, NQ, H, W = 16, 4, 8, 3, 25, 5, 5
ANCHORS = 1


def torch_msda(value, w_v, b_v, w_off, b_off, w_att, b_att, query, ref,
               h, w, heads, pts):
    """Reference MSDeformableAttention3D forward (single level, torch)."""
    bs, nq, c = query.shape
    nv = value.shape[1]
    v = value @ w_v.T + b_v
    v = v.view(bs, nv, heads, c // heads)
    off = (query @ w_off.T + b_off).view(bs, nq, heads, 1, pts, 2)
    att = (query @ w_att.T + b_att).view(bs, nq, heads, pts)
    att = att.softmax(-1).view(bs, nq, heads, 1, pts)
    normalizer = torch.tensor([[w, h]], dtype=torch.float32)
    off = off / normalizer[None, None, None, :, None, :]
    n_anchor = ref.shape[2]
    off = off.view(bs, nq, heads, 1, pts // n_anchor, n_anchor, 2)
    loc = ref[:, :, None, None, None, :, :] + off
    loc = loc.reshape(bs, nq, heads, 1, pts, 2)
    # grid_sample fallback (multi_scale_deformable_attn_pytorch)
    vl = v.flatten(2).transpose(1, 2).reshape(bs * heads, c // heads, h, w)
    grid = 2 * loc[:, :, :, 0] - 1                      # (bs,nq,heads,P,2)
    grid = grid.permute(0, 2, 1, 3, 4).flatten(0, 1)    # (bs*heads,nq,P,2)
    sampled = F.grid_sample(vl, grid, mode="bilinear",
                            padding_mode="zeros", align_corners=False)
    att_r = att.permute(0, 2, 1, 3, 4).reshape(bs * heads, 1, nq, pts)
    out = (sampled * att_r).sum(-1)                     # (bs*heads, d, nq)
    return out.view(bs, heads * (c // heads), nq).transpose(1, 2)


def torch_reference_sca(query, value_cams, ref_cam, mask, weights):
    """Reference SpatialCrossAttention.forward: sparse rebatch + scatter."""
    bs, nq, c = query.shape
    num_cams = value_cams.shape[0]
    slots = torch.zeros_like(query)
    indexes = []
    for i in range(num_cams):
        idx = mask[i][0].sum(-1).nonzero().squeeze(-1)
        indexes.append(idx)
    max_len = max(len(i) for i in indexes)
    q_rb = query.new_zeros(bs, num_cams, max_len, c)
    r_rb = ref_cam.new_zeros(bs, num_cams, max_len, ANCHORS, 2)
    for j in range(bs):
        for i in range(num_cams):
            idx = indexes[i]
            q_rb[j, i, :len(idx)] = query[j, idx]
            r_rb[j, i, :len(idx)] = ref_cam[i, j, idx]
    v = value_cams.permute(1, 0, 2, 3).reshape(bs * num_cams, -1, c)
    out = torch_msda(v, *weights[:6], q_rb.view(bs * num_cams, max_len, c),
                     r_rb.view(bs * num_cams, max_len, ANCHORS, 2),
                     H, W, HEADS, PTS)
    out = out.view(bs, num_cams, max_len, c)
    for j in range(bs):
        for i, idx in enumerate(indexes):
            slots[j, idx] += out[j, i, :len(idx)]
    count = mask.sum(-1) > 0
    count = count.permute(1, 2, 0).sum(-1).clamp(min=1)
    slots = slots / count[..., None]
    w_out, b_out = weights[6], weights[7]
    slots = slots @ w_out.T + b_out
    return slots + query   # dropout identity in eval


def test_masked_dense_sca_matches_reference_sparse_rebatch():
    rng = np.random.default_rng(0)
    query = rng.standard_normal((1, NQ, EMBED)).astype(np.float32)
    value = rng.standard_normal((1, CAMS, H * W, EMBED)).astype(np.float32)
    ref_cam = rng.uniform(0.05, 0.95,
                          (1, CAMS, NQ, ANCHORS, 2)).astype(np.float32)
    # visibility: ~60% visible, every query visible in >=1 cam,
    # plus some queries visible nowhere (count clamps to 1)
    mask = rng.uniform(size=(1, CAMS, NQ, ANCHORS)) < 0.6
    mask[0, 0, :3] = True
    mask[0, :, 5] = False

    sca = SpatialCrossAttention(embed_dims=EMBED, num_heads=HEADS,
                                num_points=PTS, deform_impl="gather")
    params = sca.init(jax.random.PRNGKey(0), jnp.asarray(query),
                      jnp.asarray(value), jnp.asarray(ref_cam),
                      jnp.asarray(mask), ((H, W),))
    got = np.asarray(sca.apply(params, jnp.asarray(query),
                               jnp.asarray(value), jnp.asarray(ref_cam),
                               jnp.asarray(mask), ((H, W),)))

    # extract identical weights for the torch reference
    p = params["params"]
    da = p["deformable_attention"]

    def t(x):
        return torch.from_numpy(np.asarray(x, dtype=np.float32))

    weights = (
        t(da["value_proj"]["kernel"]).T, t(da["value_proj"]["bias"]),
        t(da["sampling_offsets"]["kernel"]).T,
        t(da["sampling_offsets"]["bias"]),
        t(da["attention_weights"]["kernel"]).T,
        t(da["attention_weights"]["bias"]),
        t(p["output_proj"]["kernel"]).T, t(p["output_proj"]["bias"]),
    )
    # torch reference consumes (num_cams, bs, nq, A, 2) refs and
    # (num_cams, bs, nq, A) mask
    exp = torch_reference_sca(
        t(query), t(value[0])[:, None],
        t(ref_cam).permute(1, 0, 2, 3, 4),
        torch.from_numpy(mask).permute(1, 0, 2, 3),
        weights).numpy()
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_masked_dense_sca_zero_visibility_keeps_residual_path_finite():
    sca = SpatialCrossAttention(embed_dims=EMBED, num_heads=HEADS,
                                num_points=PTS, deform_impl="gather")
    rng = np.random.default_rng(1)
    query = jnp.asarray(rng.standard_normal((1, NQ, EMBED)), jnp.float32)
    value = jnp.asarray(rng.standard_normal((1, CAMS, H * W, EMBED)),
                        jnp.float32)
    ref = jnp.asarray(rng.uniform(-5, 5, (1, CAMS, NQ, ANCHORS, 2)),
                      jnp.float32)
    mask = jnp.zeros((1, CAMS, NQ, ANCHORS), bool)
    params = sca.init(jax.random.PRNGKey(0), query, value, ref, mask,
                      ((H, W),))
    out = sca.apply(params, query, value, ref, mask, ((H, W),))
    assert np.isfinite(np.asarray(out)).all()
