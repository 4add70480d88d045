#!/usr/bin/env python
"""Probe: optax chain(clip_by_global_norm, adamw) vs a hand-fused update.

The train-step mode split (docs/performance.md) shows ~29 ms/step of
optimizer cost on 208.8M fp32 params — ~3x the ~9 ms HBM floor
(read g,m,v,p + write m,v,p = 7 passes + one norm reduction).  This probe
times both updates standalone on a synthetic param tree shaped like the
real model (many leaves, ~208M total elements) to decide whether a fused
transform is worth adopting in train/state.py.

Usage: python tools/probe_opt.py [--million 208] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--million", type=float, default=208.0,
                   help="total parameter count in millions")
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    import jax
    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax.numpy as jnp
    import optax

    from vln_ver_tpu.train.state import TrainConfig, make_optimizer
    from vln_ver_tpu.utils.bench import scan_diff_time

    # tree shaped like the real model: a few big matrices + many small ones
    total = int(args.million * 1e6)
    sizes = []
    big = total
    # 24 transformer-block-sized matrices carry ~80% of the weight
    for i in range(24):
        sizes.append(int(total * 0.8 / 24))
    # 200 small leaves (norms, biases)
    for i in range(200):
        sizes.append(int(total * 0.2 / 200))
    rng = np.random.default_rng(0)
    params = {f"p{i}": jnp.asarray(rng.standard_normal(s).astype(np.float32))
              for i, s in enumerate(sizes)}
    grads = {k: v * 0.01 for k, v in params.items()}

    import dataclasses
    tc = TrainConfig(warmup_steps=10, total_steps=1000)
    # the chain arm must NOT pick up the fused default
    tx = make_optimizer(dataclasses.replace(tc, fused_opt=False))
    opt_state0 = tx.init(params)

    def run_optax(n):
        @jax.jit
        def fn(params, opt_state, grads):
            def body(carry, i):
                p, s = carry
                g = jax.tree.map(
                    lambda x: x + 1e-6 * i.astype(jnp.float32), grads)
                u, s2 = tx.update(g, s, p)
                p2 = optax.apply_updates(p, u)
                return (p2, s2), ()
            (p, s), _ = jax.lax.scan(body, (params, opt_state),
                                     jnp.arange(n))
            # full reduction over every param element: without it XLA
            # element-level-DCEs all updates not feeding the output
            # (observed: 1.37 ms "update" of 208M params = impossible)
            return sum(jnp.sum(x) for x in jax.tree.leaves(p))
        return fn

    # hand-fused: identical math to chain(clip_by_global_norm(c), adamw)
    from vln_ver_tpu.train.state import make_lr_schedule
    sched = make_lr_schedule(tc)
    b1, b2, eps, wd, clip = 0.9, 0.999, 1e-8, tc.weight_decay, \
        tc.grad_clip_norm

    def fused_update(g, state, p):
        count, mu, nu = state
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(x))
                             for x in jax.tree.leaves(g)))
        scale = jnp.where(gnorm < clip, 1.0, clip / gnorm)
        ci = count + 1
        lr = sched(count)
        bc1 = 1 - b1 ** ci.astype(jnp.float32)
        bc2 = 1 - b2 ** ci.astype(jnp.float32)

        def leaf(g, mu, nu, p):
            g = g * scale
            mu2 = b1 * mu + (1 - b1) * g
            nu2 = b2 * nu + (1 - b2) * jnp.square(g)
            upd = (mu2 / bc1) / (jnp.sqrt(nu2 / bc2) + eps) + wd * p
            return mu2, nu2, p - lr * upd

        out = jax.tree.map(leaf, g, mu, nu, p)
        mu2 = jax.tree.map(lambda t: t[0], out,
                           is_leaf=lambda t: isinstance(t, tuple))
        nu2 = jax.tree.map(lambda t: t[1], out,
                           is_leaf=lambda t: isinstance(t, tuple))
        p2 = jax.tree.map(lambda t: t[2], out,
                          is_leaf=lambda t: isinstance(t, tuple))
        return (ci, mu2, nu2), p2

    zeros = jax.tree.map(jnp.zeros_like, params)
    fused_state0 = (jnp.zeros([], jnp.int32), zeros,
                    jax.tree.map(jnp.zeros_like, params))

    def run_fused(n):
        @jax.jit
        def fn(params, fstate, grads):
            def body(carry, i):
                p, s = carry
                g = jax.tree.map(
                    lambda x: x + 1e-6 * i.astype(jnp.float32), grads)
                s2, p2 = fused_update(g, s, p)
                return (p2, s2), ()
            (p, s), _ = jax.lax.scan(body, (params, fstate), jnp.arange(n))
            return sum(jnp.sum(x) for x in jax.tree.leaves(p))
        return fn

    # numerics check (CPU or chip): one step each must agree closely
    u, s = tx.update(grads, opt_state0, params)
    p_opt = optax.apply_updates(params, u)
    _, p_fused = fused_update(grads, fused_state0, params)
    err = max(float(jnp.max(jnp.abs(a - b)))
              for a, b in zip(jax.tree.leaves(p_opt),
                              jax.tree.leaves(p_fused)))

    dt_optax = scan_diff_time(run_optax, (params, opt_state0, grads),
                              args.iters, base_len=1)
    dt_fused = scan_diff_time(run_fused, (params, fused_state0, grads),
                              args.iters, base_len=1)
    print(json.dumps({
        "optax_ms": round(dt_optax * 1e3, 3),
        "fused_ms": round(dt_fused * 1e3, 3),
        "max_abs_param_diff_1step": err,
        "million_params": args.million,
    }))


if __name__ == "__main__":
    main()
