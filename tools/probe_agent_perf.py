#!/usr/bin/env python
"""On-chip perf numbers for the VLN agent stack (VERDICT r4: the agent
half's perf story).

Measures, at the policy's REAL size (PolicyConfig defaults: 768 dims,
4 text + 4 fusion layers, 900-voxel VER volume, 32 memory nodes):

* ``policy_step``    — the rollout inner op (one decision step) at batch
  B, device-honest scan-diff timing (utils/bench.py discipline: the axon
  tunnel's per-dispatch RTT is tens of ms, so the body is scanned inside
  ONE jit and two scan lengths are differenced).
* ``policy_dispatch``— the HOST-LOOP rate of the same step (one jitted
  call + scalar fetch per env step, what run_episode actually does) —
  the RTT-bound number batched rollout amortizes over B episodes.
* ``imitation_update`` / ``pretrain_update`` — full train steps
  (value_and_grad + global-norm clip + AdamW), scanned.

Prints one JSON dict.  Run solo (no concurrent suite) for honest timing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8,
                   help="episodes per lockstep rollout batch / decision "
                        "steps per update")
    p.add_argument("--iters", type=int, default=8,
                   help="scan length for the update parts (~6-8 ms each)")
    p.add_argument("--fwd-iters", type=int, default=64,
                   help="scan length for the forward-only policy step — "
                        "it is ~0.3 ms/iter, so a short scan's diff "
                        "drowns in tunnel fetch noise (8 iters measured "
                        "an exact 0.0)")
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--dispatch-steps", type=int, default=20,
                   help="host-loop dispatches for the RTT-bound number")
    p.add_argument("--parts", default="step,dispatch,imitation,pretrain")
    return p.parse_args()


def main():
    args = parse_args()
    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vln_ver_tpu.agent.memory import init_memory
    from vln_ver_tpu.agent.policy import PolicyConfig, VLNPolicy
    from vln_ver_tpu.agent.pretrain import (VLNPretrainModel, mask_tokens,
                                            pretrain_loss)
    from vln_ver_tpu.agent.rollout import imitation_step_loss
    from vln_ver_tpu.utils.bench import scan_diff_time_stats

    cfg = PolicyConfig(dropout_rate=0.0,
                       dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    B = args.batch
    nvox = cfg.bev_z * cfg.bev_h * cfg.bev_w
    rng = np.random.default_rng(0)
    instr = rng.integers(2, cfg.vocab_size,
                         (B, cfg.max_text_len)).astype(np.int32)
    batch = dict(
        instruction=jnp.asarray(instr),
        volume=jnp.asarray(rng.standard_normal(
            (B, nvox, cfg.embed_dims)).astype(np.float32)),
        memory=init_memory(B, cfg.max_nodes, cfg.embed_dims),
        cur_pos=jnp.zeros((B, 3), jnp.float32),
        cur_slot=jnp.zeros((B,), jnp.int32),
        teacher=jnp.zeros((B,), jnp.int32))

    policy = VLNPolicy(cfg)
    params = policy.init(jax.random.PRNGKey(0), batch["instruction"],
                         batch["instruction"] > 0, batch["volume"],
                         batch["memory"], batch["cur_pos"],
                         batch["cur_slot"])
    n_par = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    out = {"batch": B, "params_m": round(n_par / 1e6, 2),
           "dtype": "bf16" if args.bf16 else "fp32"}
    parts = args.parts.split(",")

    def apply_step(p, vol):
        o = policy.apply(p, batch["instruction"], batch["instruction"] > 0,
                         vol, batch["memory"], batch["cur_pos"],
                         batch["cur_slot"])
        return jnp.sum(o.logits.astype(jnp.float32))

    if "step" in parts:
        def make_fwd(n):
            @jax.jit
            def fn(p, vol):
                def body(c, _):
                    s = apply_step(p, vol + c * 0)
                    return s.astype(vol.dtype), ()
                s, _ = jax.lax.scan(body, jnp.zeros((), vol.dtype), None,
                                    length=n)
                return s
            return fn
        st = scan_diff_time_stats(make_fwd, (params, batch["volume"]),
                                  args.fwd_iters, warmup=3,
                                  repeats=args.repeats)
        out["policy_step_ms"] = round(st["sec_per_iter"] * 1e3, 3)
        out["policy_step_spread"] = round(st["spread"], 4)
        out["decision_steps_per_sec"] = round(B / st["sec_per_iter"], 2)

    if "dispatch" in parts:
        # what run_episode(s) actually pays per env step: one dispatch +
        # one scalar fetch (action argmax) over the tunnel
        step = jax.jit(apply_step)
        float(step(params, batch["volume"]))  # compile
        t0 = time.perf_counter()
        for _ in range(args.dispatch_steps):
            float(step(params, batch["volume"]))
        dt = (time.perf_counter() - t0) / args.dispatch_steps
        out["dispatch_ms"] = round(dt * 1e3, 2)
        # R2R episodes average ~6 hops; lockstep-batched rollout does one
        # dispatch per hop for B episodes
        out["episodes_per_sec_batched"] = round(B / (6 * dt), 2)

    tx = optax.chain(optax.clip_by_global_norm(40.0), optax.adamw(1e-4))

    def timed_update(name, loss_fn, init_params):
        opt0 = tx.init(init_params)

        def make_upd(n):
            @jax.jit
            def fn(p, opt):
                def body(carry, i):
                    p, opt = carry
                    (l, _), g = jax.value_and_grad(
                        loss_fn, has_aux=True)(p, i)
                    up, opt = tx.update(g, opt, p)
                    return (optax.apply_updates(p, up), opt), l
                (_, _), ls = jax.lax.scan(body, (p, opt),
                                          jnp.arange(n))
                return ls[-1]
            return fn
        st = scan_diff_time_stats(make_upd, (init_params, opt0),
                                  args.iters, warmup=2,
                                  repeats=args.repeats)
        out[f"{name}_ms"] = round(st["sec_per_iter"] * 1e3, 3)
        out[f"{name}_spread"] = round(st["spread"], 4)
        out[f"{name}_steps_per_sec"] = round(B / st["sec_per_iter"], 2)

    if "imitation" in parts:
        def im_loss(p, i):
            return imitation_step_loss(policy, p, batch)
        timed_update("imitation_update", im_loss, params)

    if "pretrain" in parts:
        pm = VLNPretrainModel(cfg)
        mk, _, ms = mask_tokens(jax.random.PRNGKey(0),
                                batch["instruction"], cfg.vocab_size)
        pp = pm.init(jax.random.PRNGKey(0), batch, mk,
                     batch["instruction"], ms, deterministic=True)
        out["pretrain_params_m"] = round(sum(
            int(np.prod(x.shape)) for x in jax.tree.leaves(pp)) / 1e6, 2)

        def pre_loss(p, i):
            key = jax.random.fold_in(jax.random.PRNGKey(7), i)
            return pretrain_loss(pm, p, batch, key, mask_id=1,
                                 deterministic=True)
        timed_update("pretrain_update", pre_loss, pp)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
