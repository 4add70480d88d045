"""DAgger schedule: student-executed rollouts with teacher labels.

The paper's agent trains with DUET's IL recipe; DAgger-style student
sampling (``tools/train_vln.py --sample-prob/--dagger-ramp``) is what makes
imitation robust off the teacher path.  These tests pin the two properties
that make the schedule worth having:

* coverage — sampled rollouts visit (and label) states pure teacher forcing
  never sees;
* quality — training on the DAgger aggregate is at least as good on held-out
  greedy evaluation as pure teacher forcing, under identical budgets/seeds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vln_ver_tpu.agent import PolicyConfig, VLNPolicy
from vln_ver_tpu.agent.env import R2REnv, make_synthetic_vln
from vln_ver_tpu.agent.rollout import (evaluate, imitation_step_loss,
                                       run_episode)

CFG = PolicyConfig(embed_dims=32, num_heads=4, fusion_layers=1,
                   text_layers=1, ffn_dim=64, vocab_size=100,
                   max_text_len=16, max_nodes=12, bev_z=2, bev_h=4,
                   bev_w=4, num_query_tokens=2)
BEV_NUM = CFG.bev_z * CFG.bev_h * CFG.bev_w


def _env(tmp_path, n_eps=12):
    episodes, graphs, ver = make_synthetic_vln(
        str(tmp_path / "synvln"), num_scans=2, nodes_per_scan=9,
        num_episodes=n_eps, bev_num=BEV_NUM, embed_dims=CFG.embed_dims,
        max_text_len=CFG.max_text_len, seed=3)
    return R2REnv(episodes, graphs, ver, max_nodes=CFG.max_nodes)


def _stack(recs):
    return dict(
        instruction=jnp.stack(
            [jnp.asarray(r["obs"]["instruction"]) for r in recs]),
        volume=jnp.stack([jnp.asarray(r["obs"]["volume"]) for r in recs]),
        memory=jax.tree.map(lambda *xs: jnp.concatenate(xs, 0),
                            *[r["memory"] for r in recs]),
        cur_pos=jnp.stack(
            [jnp.asarray(r["obs"]["cur_pos"]) for r in recs]),
        cur_slot=jnp.asarray([r["obs"]["cur_slot"] for r in recs],
                             jnp.int32),
        teacher=jnp.asarray([r["teacher"] for r in recs], jnp.int32))


def _train(env, policy, steps, sample_prob_at, seed=0):
    """Mini train_vln loop; ``sample_prob_at(step)`` is the DAgger
    schedule (0 == pure teacher forcing).  Returns (params, visited)."""
    rng = np.random.default_rng(seed)
    obs0 = env.observe(env.reset(0))
    from vln_ver_tpu.agent.memory import init_memory
    mem0 = init_memory(1, CFG.max_nodes, CFG.embed_dims)
    params = policy.init(jax.random.PRNGKey(seed),
                         jnp.asarray(obs0["instruction"])[None],
                         jnp.asarray(obs0["instruction"])[None] > 0,
                         jnp.asarray(obs0["volume"])[None], mem0,
                         jnp.asarray(obs0["cur_pos"])[None],
                         jnp.asarray(obs0["cur_slot"])[None])
    tx = optax.chain(optax.clip_by_global_norm(40.0), optax.adamw(3e-3))
    opt_state = tx.init(params)

    @jax.jit
    def update(params, opt_state, batch):
        (loss, _), grads = jax.value_and_grad(
            lambda p: imitation_step_loss(policy, p, batch),
            has_aux=True)(params)
        ups, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, ups), opt_state2, loss

    visited = set()
    roll_rng = jax.random.PRNGKey(seed + 7)
    buffer, step = [], 0
    while step < steps:
        ep_idx = int(rng.integers(len(env.episodes)))
        sample = bool(rng.uniform() < sample_prob_at(step))
        roll_rng, sub = jax.random.split(roll_rng)
        _, trace = run_episode(policy, params, env, ep_idx, CFG,
                               greedy=not sample, rng=sub,
                               collect_teacher=True)
        ep = env.episodes[ep_idx]
        for r in trace:
            visited.add((ep["scan"], tuple(np.round(
                np.asarray(r["obs"]["cur_pos"]), 1))))
        buffer.extend(trace)
        while len(buffer) >= 8 and step < steps:
            chunk, buffer = buffer[:8], buffer[8:]
            params, opt_state, _ = update(params, opt_state,
                                          _stack(chunk))
            step += len(chunk)
    return params, visited


def test_dagger_covers_off_teacher_states_and_matches_tf(tmp_path):
    env = _env(tmp_path)
    policy = VLNPolicy(CFG)
    steps = 96

    params_tf, vis_tf = _train(env, policy, steps, lambda s: 0.0)
    ramp = steps // 2
    params_dg, vis_dg = _train(
        env, policy, steps,
        lambda s: 0.7 * min(1.0, s / ramp))

    # coverage: student-executed rollouts must label states the teacher
    # path never visits (the point of DAgger)
    assert len(vis_dg - vis_tf) > 0, "no off-teacher-path states collected"

    # quality: same budget, same seeds -> DAgger aggregate must not lose
    # to pure teacher forcing on held-out greedy eval (allow one-episode
    # slack: 12 eval episodes)
    sr_tf = evaluate(policy, params_tf, env, CFG, limit=12)["success"]
    sr_dg = evaluate(policy, params_dg, env, CFG, limit=12)["success"]
    assert sr_dg >= sr_tf - 1.0 / 12 - 1e-6, (sr_dg, sr_tf)
    assert sr_dg > 0.0


def test_dagger_ramp_schedule_math():
    """The CLI ramp: p(step) = sample_prob * min(1, step/ramp)."""
    sample_prob, ramp = 0.5, 100

    def p(step):
        return sample_prob * min(1.0, step / ramp)

    assert p(0) == 0.0
    assert abs(p(50) - 0.25) < 1e-9
    assert p(100) == sample_prob
    assert p(10_000) == sample_prob
