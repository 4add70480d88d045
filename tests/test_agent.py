"""VLN agent tests: policy step shapes/masking, episodic memory, synthetic
environment semantics, teacher rollout reaching the goal."""

import jax
import jax.numpy as jnp
import numpy as np

from vln_ver_tpu.agent import (EpisodicMemory, PolicyConfig, VLNPolicy,
                               init_memory, update_memory)
from vln_ver_tpu.agent.env import R2REnv, make_synthetic_vln
from vln_ver_tpu.agent.rollout import evaluate, run_episode

CFG = PolicyConfig(embed_dims=32, num_heads=4, fusion_layers=1,
                   text_layers=1, ffn_dim=64, vocab_size=100,
                   max_text_len=16, max_nodes=12, bev_z=2, bev_h=4,
                   bev_w=4, num_query_tokens=2)
BEV_NUM = CFG.bev_z * CFG.bev_h * CFG.bev_w


def _policy_inputs(b=2, n_valid=5):
    rng = np.random.default_rng(0)
    tokens = np.zeros((b, CFG.max_text_len), np.int32)
    tokens[:, :6] = rng.integers(1, 100, (b, 6))
    volume = rng.standard_normal((b, BEV_NUM, CFG.embed_dims)).astype(
        np.float32)
    mem = init_memory(b, CFG.max_nodes, CFG.embed_dims)
    for i in range(n_valid):
        mem = update_memory(
            mem, jnp.full((b,), i, jnp.int32),
            jnp.asarray(rng.standard_normal((b, CFG.embed_dims)),
                        jnp.float32),
            jnp.asarray(rng.standard_normal((b, 3)), jnp.float32),
            jnp.asarray([i == 0] * b))
    cur_pos = np.zeros((b, 3), np.float32)
    cur_slot = np.zeros((b,), np.int32)
    return tokens, volume, mem, cur_pos, cur_slot


def test_memory_update_semantics():
    mem = init_memory(1, 4, 8)
    mem = update_memory(mem, jnp.asarray([2]), jnp.ones((1, 8)),
                        jnp.ones((1, 3)), jnp.asarray([True]))
    assert bool(mem.valid[0, 2]) and bool(mem.visited[0, 2])
    assert int(mem.count[0]) == 1
    # refresh without duplication
    mem = update_memory(mem, jnp.asarray([2]), 2 * jnp.ones((1, 8)),
                        jnp.ones((1, 3)), jnp.asarray([False]))
    assert int(mem.count[0]) == 1
    assert bool(mem.visited[0, 2])  # sticky
    np.testing.assert_allclose(np.asarray(mem.features[0, 2]), 2.0)


def test_policy_step_shapes_and_mask():
    tokens, volume, mem, cur_pos, cur_slot = _policy_inputs()
    policy = VLNPolicy(CFG)
    params = policy.init(jax.random.PRNGKey(0), jnp.asarray(tokens),
                         jnp.asarray(tokens) > 0, jnp.asarray(volume),
                         mem, jnp.asarray(cur_pos), jnp.asarray(cur_slot))
    out = policy.apply(params, jnp.asarray(tokens), jnp.asarray(tokens) > 0,
                       jnp.asarray(volume), mem, jnp.asarray(cur_pos),
                       jnp.asarray(cur_slot))
    assert out.logits.shape == (2, 1 + CFG.max_nodes)
    assert out.state_pred.shape == (2, 5)
    logits = np.asarray(out.logits)
    # stop always scoreable; current node and invalid slots masked
    assert np.isfinite(logits[:, 0]).all()
    assert (logits[:, 1] < -1e8).all()            # current node (slot 0)
    assert (logits[:, 1 + 5:] < -1e8).all()       # invalid slots
    assert np.isfinite(logits[:, 2:1 + 5]).all()


def test_synthetic_env_teacher_reaches_goal(tmp_path):
    episodes, graphs, ver = make_synthetic_vln(
        str(tmp_path), num_scans=1, nodes_per_scan=9, num_episodes=4,
        bev_num=BEV_NUM, embed_dims=CFG.embed_dims,
        max_text_len=CFG.max_text_len)
    env = R2REnv(episodes, graphs, ver, max_nodes=CFG.max_nodes)
    for i in range(len(episodes)):
        state = env.reset(i)
        guard = 0
        while not state["done"] and guard < 50:
            a = env.teacher_action(state)
            env.step(state, a)
            guard += 1
        m = env.metrics(state)
        assert m["success"] == 1.0, (i, m)
        assert m["spl"] > 0.99  # teacher follows the shortest path


def test_rollout_and_evaluate_random_policy(tmp_path):
    episodes, graphs, ver = make_synthetic_vln(
        str(tmp_path), num_scans=1, nodes_per_scan=6, num_episodes=2,
        bev_num=BEV_NUM, embed_dims=CFG.embed_dims,
        max_text_len=CFG.max_text_len)
    env = R2REnv(episodes, graphs, ver, max_nodes=CFG.max_nodes)
    policy = VLNPolicy(CFG)
    obs = env.observe(env.reset(0))
    mem = init_memory(1, CFG.max_nodes, CFG.embed_dims)
    params = policy.init(
        jax.random.PRNGKey(0), jnp.asarray(obs["instruction"])[None],
        jnp.asarray(obs["instruction"])[None] > 0,
        jnp.asarray(obs["volume"])[None], mem,
        jnp.asarray(obs["cur_pos"])[None],
        jnp.asarray(obs["cur_slot"])[None])
    metrics = evaluate(policy, params, env, CFG, limit=2)
    assert set(metrics) == {"nav_error", "success", "spl",
                            "oracle_success", "traj_length",
                            "ndtw", "sdtw", "cls"}
    assert np.isfinite(list(metrics.values())).all()


def test_imitation_loss_grad_flows(tmp_path):
    from vln_ver_tpu.agent.rollout import imitation_step_loss

    tokens, volume, mem, cur_pos, cur_slot = _policy_inputs()
    policy = VLNPolicy(CFG)
    params = policy.init(jax.random.PRNGKey(0), jnp.asarray(tokens),
                         jnp.asarray(tokens) > 0, jnp.asarray(volume),
                         mem, jnp.asarray(cur_pos), jnp.asarray(cur_slot))
    batch = dict(instruction=jnp.asarray(tokens),
                 volume=jnp.asarray(volume), memory=mem,
                 cur_pos=jnp.asarray(cur_pos),
                 cur_slot=jnp.asarray(cur_slot),
                 teacher=jnp.asarray([2, 3], jnp.int32))

    def loss_fn(p):
        loss, _ = imitation_step_loss(policy, p, batch,
                                      state_targets=jnp.zeros((2, 5)))
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert gnorm > 0


def test_path_fidelity_metrics(tmp_path):
    """nDTW / SDTW / CLS (the R4R headline metrics): 1.0 for the teacher
    path, degraded for a detouring trajectory."""
    episodes, graphs, ver = make_synthetic_vln(
        str(tmp_path), num_scans=1, nodes_per_scan=9, num_episodes=4,
        bev_num=BEV_NUM, embed_dims=CFG.embed_dims,
        max_text_len=CFG.max_text_len)
    env = R2REnv(episodes, graphs, ver, max_nodes=CFG.max_nodes)
    # pick an episode with a non-trivial path
    idx = next(i for i, e in enumerate(episodes) if len(e["path"]) >= 3)

    state = env.reset(idx)
    guard = 0
    while not state["done"] and guard < 50:
        env.step(state, env.teacher_action(state))
        guard += 1
    m = env.metrics(state)
    assert m["ndtw"] > 0.99, m
    assert m["sdtw"] > 0.99, m
    assert m["cls"] > 0.99, m

    # a wandering trajectory: visit every discovered node before the goal
    state = env.reset(idx)
    guard = 0
    while not state["done"] and guard < 30:
        teacher = env.teacher_action(state)
        # detour: go to the highest unexplored slot instead, twice
        valid = [s + 1 for v, s in state["slot_of"].items()
                 if v != state["cur"]]
        action = valid[-1] if guard < 2 and len(valid) > 1 else teacher
        env.step(state, action)
        guard += 1
    m2 = env.metrics(state)
    assert m2["ndtw"] < m["ndtw"], (m2, m)
    assert m2["cls"] < m["cls"], (m2, m)
    assert 0.0 <= m2["ndtw"] <= 1.0 and 0.0 <= m2["cls"] <= 1.0


def test_reverie_grounding(tmp_path):
    """REVERIE support: candidate objects in observations, grounding head
    logits, RGS/RGSPL metrics, and the grounding CE in the imitation loss."""
    import jax
    import jax.numpy as jnp

    from vln_ver_tpu.agent.policy import VLNPolicy
    from vln_ver_tpu.agent.rollout import imitation_step_loss, run_episode

    episodes, graphs, ver, objects = make_synthetic_vln(
        str(tmp_path), num_scans=1, nodes_per_scan=9, num_episodes=4,
        bev_num=BEV_NUM, embed_dims=CFG.embed_dims,
        max_text_len=CFG.max_text_len, with_objects=True)
    assert all("objId" in e for e in episodes)
    env = R2REnv(episodes, graphs, ver, max_nodes=CFG.max_nodes,
                 objects=objects)
    obs = env.observe(env.reset(0))
    assert obs["obj_feats"].shape == (env.max_objects, CFG.embed_dims)
    assert obs["obj_valid"][:4].all()

    policy = VLNPolicy(CFG)
    mem = init_memory(1, CFG.max_nodes, CFG.embed_dims)
    params = policy.init(
        jax.random.PRNGKey(0), jnp.asarray(obs["instruction"])[None],
        jnp.asarray(obs["instruction"])[None] > 0,
        jnp.asarray(obs["volume"])[None], mem,
        jnp.asarray(obs["cur_pos"])[None],
        jnp.asarray(obs["cur_slot"])[None],
        obj_feats=jnp.asarray(obs["obj_feats"])[None],
        obj_valid=jnp.asarray(obs["obj_valid"])[None])

    m, trace = run_episode(policy, params, env, 0, CFG, greedy=True,
                           collect_teacher=True)
    assert "rgs" in m and "rgspl" in m
    assert 0.0 <= m["rgs"] <= 1.0 and m["rgspl"] <= m["rgs"] + 1e-9

    # grounding loss: a step at the goal viewpoint has gt_obj >= 0
    rec = trace[-1]
    batch = dict(
        instruction=jnp.asarray(rec["obs"]["instruction"])[None],
        volume=jnp.asarray(rec["obs"]["volume"])[None],
        memory=rec["memory"],
        cur_pos=jnp.asarray(rec["obs"]["cur_pos"])[None],
        cur_slot=jnp.asarray(rec["obs"]["cur_slot"])[None],
        teacher=jnp.asarray([rec["teacher"]], jnp.int32),
        obj_feats=jnp.asarray(rec["obs"]["obj_feats"])[None],
        obj_valid=jnp.asarray(rec["obs"]["obj_valid"])[None],
        gt_obj=jnp.asarray([rec["obs"]["gt_obj"]], jnp.int32))
    loss, aux = imitation_step_loss(policy, params, batch)
    assert np.isfinite(float(loss))
    assert "ground_nll" in aux
    grads = jax.grad(lambda p: imitation_step_loss(policy, p, batch)[0])(
        params)
    gp = grads["params"]["ground_proj"]["kernel"]
    # the goal-viewpoint step must drive grounding gradients (teacher path
    # ends at the goal, where gt_obj >= 0)
    goal_steps = [r for r in trace if int(r["obs"]["gt_obj"]) >= 0]
    if goal_steps:
        assert int(rec["obs"]["gt_obj"]) < 0 or np.any(np.asarray(gp))


def test_memory_arrays_correct_under_slot_recycling():
    """When the env recycles a slot (episode discovers more viewpoints
    than max_nodes), memory_arrays must describe the slot's CURRENT
    occupant — an incremental memory would keep the evicted node's
    feature/position/visited flag (the bug this guards against)."""
    from vln_ver_tpu.agent.env import NavGraph
    from vln_ver_tpu.agent.memory import memory_from_arrays

    rng = np.random.default_rng(0)
    # chain graph: v0 - v1 - ... - v9, walking it discovers one new
    # node per step; max_nodes=4 forces recycling from step ~3
    n_nodes = 10
    names = [f"v{i}" for i in range(n_nodes)]
    positions = {v: np.array([float(i), 0.0, 0.0], np.float32)
                 for i, v in enumerate(names)}
    edges = {v: [] for v in names}
    for a, b in zip(names[:-1], names[1:]):
        edges[a].append(b)
        edges[b].append(a)
    graph = NavGraph(positions, edges)
    ver = {f"s_{v}": rng.standard_normal(
        (BEV_NUM, CFG.embed_dims)).astype(np.float32) for v in names}
    ep = dict(scan="s", path=["v0", names[-1]], instr_id="0",
              instruction_tokens=np.zeros((CFG.max_text_len,), np.int32))
    env = R2REnv([ep], {"s": graph}, ver, max_nodes=4)

    state = env.reset(0)
    recycled = False
    for _ in range(n_nodes - 1):
        before = dict(state["vp_of"])
        env.step(state, 1 + state["slot_of"][
            graph.edges[state["cur"]][-1]])   # walk toward v9
        if any(before.get(s) not in (None, vp)
               for s, vp in state["vp_of"].items()):
            recycled = True
        arrs = env.memory_arrays(state)
        # every slot's content matches its CURRENT occupant
        for s in range(env.max_nodes):
            vp = state["vp_of"].get(s)
            if vp is None:
                assert not arrs["valid"][s]
                continue
            assert arrs["valid"][s]
            np.testing.assert_array_equal(arrs["positions"][s],
                                          positions[vp])
            if vp in state["visited_dec"]:
                assert arrs["visited"][s]
                np.testing.assert_allclose(
                    arrs["features"][s],
                    ver[f"s_{vp}"].astype(np.float32).mean(axis=0),
                    rtol=1e-6)
            else:
                assert not arrs["visited"][s]
                assert not arrs["features"][s].any()
        if state["done"]:
            break
    assert recycled, "test never exercised slot recycling"

    mem = memory_from_arrays([env.memory_arrays(state)])
    assert int(mem.count[0]) == int(np.sum(
        np.asarray(env.memory_arrays(state)["valid"])))
