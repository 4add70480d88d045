"""Numerics: one-hot MXU formulation and Pallas kernel (interpret mode on
CPU) vs the gather oracle."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

import vln_ver_tpu.ops.pallas_deform as pd
from vln_ver_tpu.ops import ms_deform_attn_2d
from vln_ver_tpu.ops.deform_attn import ms_deform_attn_2d_onehot


def _case(seed=0, bs=4, heads=4, dim=16, nq=57, pts=8, h=14, w=14):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((bs, h * w, heads, dim)).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1, (bs, nq, heads, 1, pts, 2)).astype(
        np.float32)
    wraw = rng.standard_normal((bs, nq, heads, pts)).astype(np.float32)
    wsm = (np.exp(wraw) / np.exp(wraw).sum(-1, keepdims=True)).reshape(
        bs, nq, heads, 1, pts)
    return jnp.asarray(v), jnp.asarray(locs), jnp.asarray(wsm)


def test_onehot_matches_gather_oracle():
    v, locs, wsm = _case()
    ref = ms_deform_attn_2d(v, ((14, 14),), locs, wsm)
    got = ms_deform_attn_2d_onehot(v, ((14, 14),), locs, wsm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_onehot_gradients_match_oracle():
    v, locs, wsm = _case(seed=1, bs=2, nq=13)

    def f_ref(v, l, w):
        return jnp.sum(ms_deform_attn_2d(v, ((14, 14),), l, w) ** 2)

    def f_one(v, l, w):
        return jnp.sum(ms_deform_attn_2d_onehot(v, ((14, 14),), l, w) ** 2)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(v, locs, wsm)
    g_one = jax.grad(f_one, argnums=(0, 1, 2))(v, locs, wsm)
    for a, b in zip(g_ref, g_one):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_pallas_kernel_interpret_matches_oracle(monkeypatch):
    v, locs, wsm = _case(seed=2)
    ref = ms_deform_attn_2d(v, ((14, 14),), locs, wsm)
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pd.pl, "pallas_call", interp)
    got = pd.ms_deform_attn_2d_pallas(v, ((14, 14),), locs, wsm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_v2_interpret_matches_oracle(monkeypatch):
    # regression: v2's y-factor expansion must be a block broadcast
    # (yrow[s // W]), not a tile (yrow[s % H]) — ADVICE r2 (high)
    v, locs, wsm = _case(seed=4)
    ref = ms_deform_attn_2d(v, ((14, 14),), locs, wsm)
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pd.pl, "pallas_call", interp)
    got = pd.ms_deform_attn_2d_pallas_v2(v, ((14, 14),), locs, wsm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_v2_nonsquare_grid(monkeypatch):
    # H != W so a tiled (s % H) expansion cannot alias the correct answer
    v, locs, wsm = _case(seed=5, h=10, w=20)
    ref = ms_deform_attn_2d(v, ((10, 20),), locs, wsm)
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pd.pl, "pallas_call", interp)
    got = pd.ms_deform_attn_2d_pallas_v2(v, ((10, 20),), locs, wsm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_v2_backward_via_onehot(monkeypatch):
    v, locs, wsm = _case(seed=6, bs=2, nq=13)
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pd.pl, "pallas_call", interp)

    def f_pal(v, l, w):
        return jnp.sum(
            pd.ms_deform_attn_2d_pallas_v2(v, ((14, 14),), l, w) ** 2)

    def f_ref(v, l, w):
        return jnp.sum(ms_deform_attn_2d(v, ((14, 14),), l, w) ** 2)

    g_pal = jax.grad(f_pal, argnums=(0, 1, 2))(v, locs, wsm)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(v, locs, wsm)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_pallas_kernel_backward_via_onehot(monkeypatch):
    v, locs, wsm = _case(seed=3, bs=2, nq=13)
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pd.pl, "pallas_call", interp)

    def f_pal(v, l, w):
        return jnp.sum(
            pd.ms_deform_attn_2d_pallas(v, ((14, 14),), l, w) ** 2)

    def f_ref(v, l, w):
        return jnp.sum(ms_deform_attn_2d(v, ((14, 14),), l, w) ** 2)

    g_pal = jax.grad(f_pal, argnums=(0, 1, 2))(v, locs, wsm)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(v, locs, wsm)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
