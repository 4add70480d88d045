"""Lockstep-batched rollouts must reproduce per-episode rollouts exactly
(the policy is row-independent; graph stepping is host-side either way)."""

import jax
import numpy as np

from vln_ver_tpu.agent import PolicyConfig, VLNPolicy, init_memory
from vln_ver_tpu.agent.env import R2REnv, make_synthetic_vln
from vln_ver_tpu.agent.rollout import run_episode, run_episodes_batched

CFG = PolicyConfig(embed_dims=32, num_heads=4, fusion_layers=1,
                   text_layers=1, ffn_dim=64, vocab_size=100,
                   max_text_len=16, max_nodes=12, bev_z=2, bev_h=4,
                   bev_w=4, num_query_tokens=2)
BEV_NUM = CFG.bev_z * CFG.bev_h * CFG.bev_w


def _setup(tmp_path):
    import jax.numpy as jnp
    episodes, graphs, ver = make_synthetic_vln(
        str(tmp_path / "synvln"), num_scans=2, nodes_per_scan=9,
        num_episodes=6, bev_num=BEV_NUM, embed_dims=CFG.embed_dims,
        max_text_len=CFG.max_text_len, seed=5)
    env = R2REnv(episodes, graphs, ver, max_nodes=CFG.max_nodes)
    policy = VLNPolicy(CFG)
    obs = env.observe(env.reset(0))
    params = policy.init(jax.random.PRNGKey(1),
                         jnp.asarray(obs["instruction"])[None],
                         jnp.asarray(obs["instruction"])[None] > 0,
                         jnp.asarray(obs["volume"])[None],
                         init_memory(1, CFG.max_nodes, CFG.embed_dims),
                         jnp.asarray(obs["cur_pos"])[None],
                         jnp.asarray(obs["cur_slot"])[None])
    return env, policy, params


def test_batched_matches_sequential_greedy(tmp_path):
    env, policy, params = _setup(tmp_path)
    idxs = [0, 1, 2, 3]

    seq = []
    for i in idxs:
        m, t = run_episode(policy, params, env, i, CFG, greedy=True,
                           collect_teacher=True)
        seq.append((m, t))

    bm, bt = run_episodes_batched(policy, params, env, idxs, CFG,
                                  greedy=True, collect_teacher=True)

    for (m_seq, t_seq), m_b, t_b in zip(seq, bm, bt):
        # identical action sequences -> identical teacher labels and
        # identical navigation metrics
        assert [r["teacher"] for r in t_b] == [r["teacher"] for r in t_seq]
        assert len(t_b) == len(t_seq)
        for k, v in m_seq.items():
            np.testing.assert_allclose(m_b[k], v, rtol=1e-5, atol=1e-6,
                                       err_msg=k)
        for rb, rs in zip(t_b, t_seq):
            np.testing.assert_array_equal(rb["obs"]["cur_slot"],
                                          rs["obs"]["cur_slot"])
            np.testing.assert_allclose(
                np.asarray(rb["memory"].valid),
                np.asarray(rs["memory"].valid), err_msg="memory.valid")


def test_batched_sampled_mode(tmp_path):
    # sampled (DAgger-student) batched rollouts must run with an rng and
    # must refuse to run without one (ADVICE r2: default rng=None raised
    # a TypeError inside jax.random.split)
    import pytest

    env, policy, params = _setup(tmp_path)
    bm, bt = run_episodes_batched(policy, params, env, [0, 1], CFG,
                                  greedy=False,
                                  rng=jax.random.PRNGKey(7),
                                  collect_teacher=True)
    assert len(bm) == 2 and all(np.isfinite(m["nav_error"]) for m in bm)
    with pytest.raises(ValueError, match="rng"):
        run_episodes_batched(policy, params, env, [0, 1], CFG,
                             greedy=False)
    with pytest.raises(ValueError, match="rng"):
        run_episode(policy, params, env, 0, CFG, greedy=False)


def test_batched_handles_uneven_lengths(tmp_path):
    env, policy, params = _setup(tmp_path)
    # all six episodes at once: different path lengths force frozen rows
    bm, bt = run_episodes_batched(policy, params, env, list(range(6)),
                                  CFG, greedy=True, collect_teacher=True)
    assert len(bm) == 6
    lengths = {len(t) for t in bt}
    assert len(lengths) > 1, "expected uneven episode lengths"
    for m in bm:
        assert np.isfinite(m["nav_error"])


def test_mesh_eval_matches_single_device(tmp_path):
    """evaluate_batched over an agent ('data',) mesh (8 virtual devices)
    reproduces the per-episode evaluate() metrics — eval sharding must
    not change a single action (the policy is row-independent and the
    mesh only splits the batch axis).  Also covers the padded short
    final chunk (6 episodes, batch 8)."""
    from vln_ver_tpu.agent.parallel import make_agent_mesh
    from vln_ver_tpu.agent.rollout import evaluate, evaluate_batched

    env, policy, params = _setup(tmp_path)
    ref = evaluate(policy, params, env, CFG, limit=6)
    mesh = make_agent_mesh(8)
    got = evaluate_batched(policy, params, env, CFG, limit=6,
                           batch_size=8, mesh=mesh)
    assert sorted(ref) == sorted(got)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)

    import pytest
    with pytest.raises(ValueError, match="divisible"):
        evaluate_batched(policy, params, env, CFG, limit=6,
                         batch_size=6, mesh=mesh)
