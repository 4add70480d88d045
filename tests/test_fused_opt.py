"""Fused clip+AdamW must reproduce the optax chain exactly.

The production optimizer (train/state.py make_fused_clip_adamw) computes
chain(clip_by_global_norm(300), adamw(schedule, wd=0.01)) in one per-leaf
pass for HBM-bandwidth reasons; these tests pin its math to the optax
chain it replaces, over multiple steps, with and without the clip
triggering.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vln_ver_tpu.train.state import (TrainConfig, make_fused_clip_adamw,
                                     make_optimizer)


def _tree(seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return {
        "dense": {"kernel": jnp.asarray(
            rng.standard_normal((64, 32)).astype(np.float32) * scale),
            "bias": jnp.asarray(
                rng.standard_normal(32).astype(np.float32) * scale)},
        "norm": jnp.asarray(
            rng.standard_normal(16).astype(np.float32) * scale),
    }


@pytest.mark.parametrize("grad_scale,label", [
    (0.1, "no_clip"),
    # global norm of ~47 leaves x 1e3 >> 300 -> clip triggers every step
    (1e3, "clip_active"),
])
def test_fused_matches_optax_chain(grad_scale, label):
    tc = TrainConfig(warmup_steps=3, total_steps=20)
    chain = optax.chain(
        optax.clip_by_global_norm(tc.grad_clip_norm),
        optax.adamw(__import__(
            "vln_ver_tpu.train.state", fromlist=["make_lr_schedule"]
        ).make_lr_schedule(tc), b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=tc.weight_decay))
    fused = make_fused_clip_adamw(tc)

    params_a = _tree(0)
    params_b = jax.tree.map(jnp.array, params_a)
    sa, sb = chain.init(params_a), fused.init(params_b)

    for step in range(6):
        grads = _tree(100 + step, scale=grad_scale)
        ua, sa = chain.update(grads, sa, params_a)
        params_a = optax.apply_updates(params_a, ua)
        ub, sb = fused.update(grads, sb, params_b)
        params_b = optax.apply_updates(params_b, ub)
        for pa, pb in zip(jax.tree.leaves(params_a),
                          jax.tree.leaves(params_b)):
            np.testing.assert_allclose(np.asarray(pb), np.asarray(pa),
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=f"{label} step {step}")


def test_make_optimizer_variants():
    # default stays the optax chain (checkpoint-structure continuity;
    # measured perf parity on chip — see TrainConfig.fused_opt)
    tc = TrainConfig()
    assert not tc.fused_opt
    params = _tree(1)
    st_default = make_optimizer(tc).init(params)
    assert isinstance(st_default, tuple) and len(st_default) == 2
    # fused opt-in: state is (count, mu, nu) with mu/nu mirroring params
    st = make_optimizer(
        dataclasses.replace(tc, fused_opt=True)).init(params)
    assert hasattr(st, "mu") and hasattr(st, "nu")
    assert (jax.tree_util.tree_structure(st.mu)
            == jax.tree_util.tree_structure(params))
