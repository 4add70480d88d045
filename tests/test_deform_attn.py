"""Numerics tests for the XLA deformable-attention oracles against torch.

The torch references below are written from the documented semantics of the
reference's pure-PyTorch fallbacks (bilinear/trilinear ``F.grid_sample`` with
``align_corners=False``, zero padding, grid = 2*loc - 1, per-point weighted
sum) — see voxel_temporal_self_attention.py:275-335.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from vln_ver_tpu.ops import (bilinear_sample_2d, ms_deform_attn_2d,
                             trilinear_sample_3d, voxel_deform_attn_3d)


def torch_msda_2d(value, shapes, locs, weights):
    """(bs, nv, heads, dim), [(h,w)], (bs,nq,heads,L,P,2), (bs,nq,heads,L,P)."""
    bs, _, n_heads, dim = value.shape
    nq = locs.shape[1]
    splits = [h * w for h, w in shapes]
    vlist = value.split(splits, dim=1)
    grids = 2 * locs - 1
    sampled = []
    for lvl, (h, w) in enumerate(shapes):
        vl = vlist[lvl].flatten(2).transpose(1, 2).reshape(
            bs * n_heads, dim, h, w)
        g = grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)
        # grid (bs*heads, nq, P, 2)
        s = F.grid_sample(vl, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)
        sampled.append(s)  # (bs*heads, dim, nq, P)
    att = weights.transpose(1, 2).reshape(bs * n_heads, 1, nq, -1)
    out = (torch.stack([s.view(bs * n_heads, dim, nq, -1) for s in sampled],
                       dim=-2).flatten(-2) * att).sum(-1)
    return out.view(bs, n_heads * dim, nq).transpose(1, 2).contiguous()


def torch_msda_3d(value, shapes, locs, weights):
    bs, _, n_heads, dim = value.shape
    nq = locs.shape[1]
    splits = [d * h * w for d, h, w in shapes]
    vlist = value.split(splits, dim=1)
    grids = 2 * locs - 1
    sampled = []
    for lvl, (d, h, w) in enumerate(shapes):
        vl = vlist[lvl].flatten(2).transpose(1, 2).reshape(
            bs * n_heads, dim, d, h, w)
        g = grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)[:, None]
        # grid (N, 1, nq, P, 3) with (x, y, z)
        s = F.grid_sample(vl, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)
        sampled.append(s.view(bs * n_heads, dim, nq, -1))
    att = weights.transpose(1, 2).reshape(bs * n_heads, 1, nq, -1)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * att).sum(-1)
    return out.view(bs, n_heads * dim, nq).transpose(1, 2).contiguous()


def test_bilinear_sample_matches_grid_sample():
    rng = np.random.default_rng(0)
    h, w, c = 14, 14, 8
    v = rng.standard_normal((h, w, c)).astype(np.float32)
    # include out-of-range points to exercise zero padding
    x = rng.uniform(-2, w + 2, 64).astype(np.float32)
    y = rng.uniform(-2, h + 2, 64).astype(np.float32)
    got = np.asarray(bilinear_sample_2d(jnp.asarray(v), jnp.asarray(x),
                                        jnp.asarray(y)))
    gx = (2 * (x + 0.5) / w) - 1
    gy = (2 * (y + 0.5) / h) - 1
    grid = torch.from_numpy(np.stack([gx, gy], -1))[None, None]
    tv = torch.from_numpy(v).permute(2, 0, 1)[None]
    exp = F.grid_sample(tv, grid, mode="bilinear", padding_mode="zeros",
                        align_corners=False)[0, :, 0].T.numpy()
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_trilinear_sample_matches_grid_sample():
    rng = np.random.default_rng(1)
    d, h, w, c = 4, 15, 15, 8
    v = rng.standard_normal((d, h, w, c)).astype(np.float32)
    n = 64
    x = rng.uniform(-1, w + 1, n).astype(np.float32)
    y = rng.uniform(-1, h + 1, n).astype(np.float32)
    z = rng.uniform(-1, d + 1, n).astype(np.float32)
    got = np.asarray(trilinear_sample_3d(
        jnp.asarray(v), jnp.asarray(x), jnp.asarray(y), jnp.asarray(z)))
    gx = (2 * (x + 0.5) / w) - 1
    gy = (2 * (y + 0.5) / h) - 1
    gz = (2 * (z + 0.5) / d) - 1
    grid = torch.from_numpy(np.stack([gx, gy, gz], -1))[None, None, None]
    tv = torch.from_numpy(v).permute(3, 0, 1, 2)[None]
    exp = F.grid_sample(tv, grid, mode="bilinear", padding_mode="zeros",
                        align_corners=False)[0, :, 0, 0].T.numpy()
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_ms_deform_attn_2d_matches_torch():
    rng = np.random.default_rng(2)
    bs, heads, dim, nq, pts = 6, 8, 16, 37, 8
    shapes = [(14, 14)]
    nv = sum(h * w for h, w in shapes)
    v = rng.standard_normal((bs, nv, heads, dim)).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1, (bs, nq, heads, 1, pts, 2)).astype(
        np.float32)
    wraw = rng.standard_normal((bs, nq, heads, 1 * pts)).astype(np.float32)
    wsm = np.exp(wraw) / np.exp(wraw).sum(-1, keepdims=True)
    wsm = wsm.reshape(bs, nq, heads, 1, pts)
    got = np.asarray(ms_deform_attn_2d(jnp.asarray(v), shapes,
                                       jnp.asarray(locs), jnp.asarray(wsm)))
    exp = torch_msda_2d(torch.from_numpy(v), shapes,
                        torch.from_numpy(locs),
                        torch.from_numpy(wsm)).numpy()
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_ms_deform_attn_2d_multilevel():
    rng = np.random.default_rng(4)
    bs, heads, dim, nq, pts = 2, 4, 8, 11, 4
    shapes = [(14, 14), (7, 7)]
    nv = sum(h * w for h, w in shapes)
    v = rng.standard_normal((bs, nv, heads, dim)).astype(np.float32)
    locs = rng.uniform(0, 1, (bs, nq, heads, 2, pts, 2)).astype(np.float32)
    wraw = rng.standard_normal((bs, nq, heads, 2 * pts)).astype(np.float32)
    wsm = (np.exp(wraw) / np.exp(wraw).sum(-1, keepdims=True)).reshape(
        bs, nq, heads, 2, pts)
    got = np.asarray(ms_deform_attn_2d(jnp.asarray(v), shapes,
                                       jnp.asarray(locs), jnp.asarray(wsm)))
    exp = torch_msda_2d(torch.from_numpy(v), shapes, torch.from_numpy(locs),
                        torch.from_numpy(wsm)).numpy()
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_voxel_deform_attn_3d_matches_torch():
    rng = np.random.default_rng(3)
    bs, heads, dim, nq, pts = 1, 8, 96, 100, 4
    shapes = [(4, 15, 15)]
    nv = sum(d * h * w for d, h, w in shapes)
    v = rng.standard_normal((bs, nv, heads, dim)).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1, (bs, nq, heads, 1, pts, 3)).astype(
        np.float32)
    wraw = rng.standard_normal((bs, nq, heads, pts)).astype(np.float32)
    wsm = (np.exp(wraw) / np.exp(wraw).sum(-1, keepdims=True)).reshape(
        bs, nq, heads, 1, pts)
    got = np.asarray(voxel_deform_attn_3d(jnp.asarray(v), shapes,
                                          jnp.asarray(locs),
                                          jnp.asarray(wsm)))
    exp = torch_msda_3d(torch.from_numpy(v), shapes, torch.from_numpy(locs),
                        torch.from_numpy(wsm)).numpy()
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_voxel_deform_attn_3d_onehot_matches_gather():
    """The decoder's MXU one-hot 3D sampling (round 4: the gather path
    was 97.6% of decoder cost, tools/probe_decoder.py) is exact vs the
    gather oracle — forward AND grads, including out-of-range taps
    (all-zero one-hot rows == grid_sample zero padding)."""
    from vln_ver_tpu.ops import voxel_deform_attn_3d_onehot

    rng = np.random.default_rng(5)
    bs, heads, dim, nq, pts = 2, 8, 96, 100, 4
    shapes = [(4, 15, 15)]
    nv = sum(d * h * w for d, h, w in shapes)
    v = rng.standard_normal((bs, nv, heads, dim)).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1, (bs, nq, heads, 1, pts, 3)).astype(
        np.float32)
    wraw = rng.standard_normal((bs, nq, heads, pts)).astype(np.float32)
    wsm = (np.exp(wraw) / np.exp(wraw).sum(-1, keepdims=True)).reshape(
        bs, nq, heads, 1, pts)
    args = (jnp.asarray(v), shapes, jnp.asarray(locs), jnp.asarray(wsm))
    got = np.asarray(voxel_deform_attn_3d_onehot(*args))
    exp = np.asarray(voxel_deform_attn_3d(*args))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)

    def loss_onehot(v_, l_, w_):
        return jnp.sum(voxel_deform_attn_3d_onehot(v_, shapes, l_, w_)**2)

    def loss_gather(v_, l_, w_):
        return jnp.sum(voxel_deform_attn_3d(v_, shapes, l_, w_)**2)

    g1 = jax.grad(loss_onehot, argnums=(0, 1, 2))(
        jnp.asarray(v), jnp.asarray(locs), jnp.asarray(wsm))
    g2 = jax.grad(loss_gather, argnums=(0, 1, 2))(
        jnp.asarray(v), jnp.asarray(locs), jnp.asarray(wsm))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_voxel_3d_onehot_matches_gather_on_depth1_level():
    """A depth-1 level must hit the same bilinear special case in BOTH
    3D impls (regression: the one-hot path trilinearly attenuated d=1
    levels by a z-dependent 0.5-1.0 factor while the gather oracle
    sampled bilinearly)."""
    from vln_ver_tpu.ops.deform_attn import (voxel_deform_attn_3d,
                                             voxel_deform_attn_3d_onehot)

    rng = np.random.default_rng(11)
    shapes = ((1, 5, 6), (3, 4, 4))      # depth-1 AND depth-3 levels
    nv = sum(d * h * w for d, h, w in shapes)
    bs, nq, nh, hd, npts = 2, 7, 2, 8, 3
    value = jnp.asarray(rng.standard_normal(
        (bs, nv, nh, hd)).astype(np.float32))
    loc = jnp.asarray(rng.uniform(
        0.05, 0.95, (bs, nq, nh, len(shapes), npts, 3)).astype(np.float32))
    w = rng.uniform(0, 1, (bs, nq, nh, len(shapes), npts)).astype(np.float32)
    w /= w.sum(axis=(-2, -1), keepdims=True)
    w = jnp.asarray(w)
    a = np.asarray(voxel_deform_attn_3d(value, shapes, loc, w))
    b = np.asarray(voxel_deform_attn_3d_onehot(value, shapes, loc, w))
    np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-5)
