"""VLN pretraining stage (agent/pretrain.py): masking recipe, proxy-loss
training, policy-subtree compatibility, and the headline claim — a
pretrained init beats scratch imitation at fixed finetune steps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from vln_ver_tpu.agent import PolicyConfig, VLNPolicy, init_memory
from vln_ver_tpu.agent.env import R2REnv, make_synthetic_vln
from vln_ver_tpu.agent.pretrain import (VLNPretrainModel,
                                        collect_teacher_trace,
                                        extract_policy_params,
                                        init_pretrain_params, mask_tokens,
                                        pretrain_loss, stack_records)

CFG = PolicyConfig(embed_dims=32, num_heads=4, fusion_layers=1,
                   text_layers=1, ffn_dim=64, vocab_size=100,
                   max_text_len=16, max_nodes=12, bev_z=2, bev_h=4,
                   bev_w=4, num_query_tokens=2)
BEV_NUM = CFG.bev_z * CFG.bev_h * CFG.bev_w


def _env(tmp_path, seed=5):
    episodes, graphs, ver = make_synthetic_vln(
        str(tmp_path / "synvln"), num_scans=2, nodes_per_scan=9,
        num_episodes=8, bev_num=BEV_NUM, embed_dims=CFG.embed_dims,
        max_text_len=CFG.max_text_len, seed=seed)
    return R2REnv(episodes, graphs, ver, max_nodes=CFG.max_nodes)


def test_mask_tokens_recipe():
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(2, 100, (64, 16)), jnp.int32)
    tokens = tokens.at[:, 12:].set(0)  # pad tail
    masked, targets, sel = mask_tokens(jax.random.PRNGKey(0), tokens,
                                       vocab_size=100, mask_id=1)
    sel = np.asarray(sel)
    masked = np.asarray(masked)
    tokens_np = np.asarray(tokens)
    # pad never selected
    assert not sel[:, 12:].any()
    # targets are the original tokens
    np.testing.assert_array_equal(np.asarray(targets), tokens_np)
    # unselected positions unchanged
    np.testing.assert_array_equal(masked[~sel], tokens_np[~sel])
    # selection rate ~15% of real tokens
    rate = sel.sum() / (64 * 12)
    assert 0.10 < rate < 0.20, rate
    # of selected: ~80% mask_id, some random, some unchanged
    m = masked[sel]
    t = tokens_np[sel]
    frac_mask = (m == 1).mean()
    assert 0.65 < frac_mask < 0.92, frac_mask
    assert (m == t).sum() > 0           # 10% keep branch
    assert ((m != 1) & (m != t)).sum() > 0  # 10% random branch


def test_offline_trace_contract(tmp_path):
    env = _env(tmp_path)
    trace = collect_teacher_trace(env, 0, CFG)
    assert len(trace) >= 2
    # teacher-driven: last action is stop
    assert trace[-1]["teacher"] == 0
    batch = stack_records(trace)
    assert batch["instruction"].shape == (len(trace), CFG.max_text_len)
    assert batch["volume"].shape == (len(trace), BEV_NUM, CFG.embed_dims)
    assert batch["memory"].features.shape == (
        len(trace), CFG.max_nodes, CFG.embed_dims)


def test_pretrain_subtree_matches_policy_tree(tmp_path):
    env = _env(tmp_path)
    model = VLNPretrainModel(CFG)
    pre = init_pretrain_params(model, env, seed=0)
    pol = extract_policy_params(pre)

    obs = env.observe(env.reset(0))
    policy = VLNPolicy(CFG)
    ref = policy.init(jax.random.PRNGKey(1),
                      jnp.asarray(obs["instruction"])[None],
                      jnp.asarray(obs["instruction"])[None] > 0,
                      jnp.asarray(obs["volume"])[None],
                      init_memory(1, CFG.max_nodes, CFG.embed_dims),
                      jnp.asarray(obs["cur_pos"])[None],
                      jnp.asarray(obs["cur_slot"])[None])
    shapes = lambda t: jax.tree.map(lambda x: x.shape, t)  # noqa: E731
    assert shapes(pol) == shapes(ref)
    # and the extracted tree actually drives the policy
    out = policy.apply(pol, jnp.asarray(obs["instruction"])[None],
                       jnp.asarray(obs["instruction"])[None] > 0,
                       jnp.asarray(obs["volume"])[None],
                       init_memory(1, CFG.max_nodes, CFG.embed_dims),
                       jnp.asarray(obs["cur_pos"])[None],
                       jnp.asarray(obs["cur_slot"])[None])
    assert np.isfinite(np.asarray(out.logits)).all()


def _pretrain(env, steps, seed=0, lr=1e-3):
    model = VLNPretrainModel(CFG)
    params = init_pretrain_params(model, env, seed)
    records = []
    for i in range(len(env.episodes)):
        records.extend(collect_teacher_trace(env, i, CFG))
    tx = optax.chain(optax.clip_by_global_norm(40.0), optax.adamw(lr))
    opt_state = tx.init(params)

    @jax.jit
    def update(params, opt_state, batch, key):
        (loss, parts), grads = jax.value_and_grad(
            lambda p: pretrain_loss(model, p, batch, key),
            has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, parts

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed + 11)
    first, last = None, None
    for step in range(steps):
        idx = rng.integers(0, len(records), 8)
        batch = stack_records([records[i] for i in idx])
        key, sub = jax.random.split(key)
        params, opt_state, parts = update(params, opt_state, batch, sub)
        parts = {k: float(v) for k, v in parts.items()}
        if first is None:
            first = parts
        last = parts
    return params, first, last


def _finetune_eval(env, params0, steps, seed=0):
    """Teacher-forced imitation for `steps` decision steps from params0
    (or scratch when None); returns greedy SR over all episodes."""
    from vln_ver_tpu.agent.rollout import (evaluate, imitation_step_loss,
                                           run_episode)
    policy = VLNPolicy(CFG)
    obs = env.observe(env.reset(0))
    if params0 is None:
        params = policy.init(jax.random.PRNGKey(seed),
                             jnp.asarray(obs["instruction"])[None],
                             jnp.asarray(obs["instruction"])[None] > 0,
                             jnp.asarray(obs["volume"])[None],
                             init_memory(1, CFG.max_nodes, CFG.embed_dims),
                             jnp.asarray(obs["cur_pos"])[None],
                             jnp.asarray(obs["cur_slot"])[None])
    else:
        params = params0
    tx = optax.chain(optax.clip_by_global_norm(40.0), optax.adamw(1e-3))
    opt_state = tx.init(params)

    @jax.jit
    def update(params, opt_state, batch):
        (loss, _), grads = jax.value_and_grad(
            lambda p: imitation_step_loss(policy, p, batch),
            has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    rng = np.random.default_rng(seed)
    buffer = []
    done = 0
    loss = None
    while done < steps:
        _, trace = run_episode(policy, params, env,
                               int(rng.integers(len(env.episodes))), CFG,
                               greedy=True, collect_teacher=True)
        buffer.extend(trace)
        while len(buffer) >= 8 and done < steps:
            chunk, buffer = buffer[:8], buffer[8:]
            from vln_ver_tpu.agent.pretrain import stack_records as _sr
            params, opt_state, loss = update(params, opt_state,
                                             _sr(chunk))
            done += len(chunk)
    m = evaluate(policy, params, env, CFG)
    return float(m["success"]), float(loss)


def test_pretrain_losses_drop_and_init_beats_scratch(tmp_path):
    env = _env(tmp_path)
    pre_params, first, last = _pretrain(env, steps=120)
    # proxy losses train
    assert last["mlm"] < first["mlm"], (first, last)
    assert last["sap"] < first["sap"], (first, last)

    policy_init = extract_policy_params(pre_params)
    sr_pre, _ = _finetune_eval(env, policy_init, steps=32)
    sr_scratch, _ = _finetune_eval(env, None, steps=32)
    # the VERDICT r2 done-criterion: pretrained init beats scratch on
    # synthetic SR at fixed finetune steps
    assert sr_pre > sr_scratch, (sr_pre, sr_scratch)


def test_cli_setup_shared_handoff_contract(tmp_path):
    """The pretrain and finetune CLIs build their config/env from ONE
    shared plumbing (agent/cli_setup.build_vln_setup); the policy
    subtree extracted from a pretrain init must match the finetune
    policy-init tree structure and shapes exactly — the property
    --init-from-pretrain's orbax restore depends on."""
    from types import SimpleNamespace

    from vln_ver_tpu.agent.cli_setup import build_vln_setup

    args = SimpleNamespace(synthetic=True, work_dir=str(tmp_path),
                           embed_dims=32, objects=None, data_dir=None,
                           connectivity=None, ver=None, benchmark="R2R",
                           bert_vocab=None)
    a = build_vln_setup(args)
    b = build_vln_setup(args)   # both CLIs call the same function
    assert a.cfg == b.cfg

    env = R2REnv(a.episodes, a.graphs, a.ver, max_nodes=a.cfg.max_nodes)
    pre = init_pretrain_params(VLNPretrainModel(a.cfg), env, seed=0)
    policy_tree = extract_policy_params(pre)

    obs = env.observe(env.reset(0))
    mem0 = init_memory(1, a.cfg.max_nodes, a.cfg.embed_dims)
    fine = VLNPolicy(a.cfg).init(
        jax.random.PRNGKey(1), jnp.asarray(obs["instruction"])[None],
        jnp.asarray(obs["instruction"])[None] > 0,
        jnp.asarray(obs["volume"])[None], mem0,
        jnp.asarray(obs["cur_pos"])[None],
        jnp.asarray(obs["cur_slot"])[None])
    ts_a = jax.tree.structure(policy_tree)
    ts_b = jax.tree.structure(fine)
    assert ts_a == ts_b, (ts_a, ts_b)
    for pa, pb in zip(jax.tree.leaves(policy_tree),
                      jax.tree.leaves(fine)):
        assert pa.shape == pb.shape and pa.dtype == pb.dtype
