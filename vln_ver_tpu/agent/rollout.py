"""Episode rollouts: teacher-forced imitation training and greedy eval.

The jitted pieces are the policy step and the loss; graph stepping stays
host-side (BASELINE.json north star: "Matterport3D episode stepping stays
host-side").  Imitation training follows the DUET/HAMT recipe the paper
builds on: cross-entropy to the shortest-path teacher action at every step,
plus the volume-state-estimation auxiliary loss.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .env import R2REnv
from .memory import memory_from_arrays
from .policy import PolicyConfig, VLNPolicy, masked_grounding_ce


def _to_batch(obs: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v)[None] for k, v in obs.items()}


_STEP_CACHE: Dict[int, object] = {}


def policy_step_fn(policy: VLNPolicy):
    """Jitted policy step, cached per policy instance (a fresh jit per
    episode would retrace every call).  The policy object is pinned in
    the entry so a recycled ``id`` can never alias a different policy,
    and the cache is capped (FIFO) so sweep scripts that build many
    policies don't leak jit executables."""
    key = id(policy)
    hit = _STEP_CACHE.get(key)
    if hit is not None and hit[0] is policy:
        return hit[1]
    if len(_STEP_CACHE) >= 8:
        _STEP_CACHE.pop(next(iter(_STEP_CACHE)))
    fn = jax.jit(lambda p, *a, **k: policy.apply(p, *a, **k))
    _STEP_CACHE[key] = (policy, fn)
    return fn


def run_episode(policy: VLNPolicy, params, env: R2REnv, ep_idx: int,
                cfg: PolicyConfig, greedy: bool = True,
                rng=None, collect_teacher: bool = False):
    """Roll one episode; returns (metrics, trace) where trace holds per-step
    (logits, teacher_action) for imitation losses."""
    if not greedy and rng is None:
        raise ValueError("sampled rollout (greedy=False) requires rng")
    state = env.reset(ep_idx)
    text_feats = None
    trace: List[Dict] = []

    step_fn = policy_step_fn(policy)

    while not state["done"]:
        obs = env.observe(state)
        b = _to_batch(obs)
        # memory = pure function of env state (visited nodes carry pooled
        # VER, frontiers are position-only) — one transfer per step and
        # correct under slot recycling (env.memory_arrays docstring)
        arrs = env.memory_arrays(state)
        mem = memory_from_arrays([arrs])

        obj_kw = {}
        if "obj_feats" in obs:
            obj_kw = dict(obj_feats=b["obj_feats"],
                          obj_valid=b["obj_valid"])
        out = step_fn(params, b["instruction"],
                      b["instruction"] > 0, b["volume"], mem,
                      b["cur_pos"], b["cur_slot"], text_feats=text_feats,
                      **obj_kw)
        text_feats = out.text_feats
        teacher = env.teacher_action(state)
        if collect_teacher:
            trace.append(dict(obs=obs, teacher=teacher,
                              memory=memory_from_arrays([arrs],
                                                        host=True)))
        if greedy:
            action = int(jnp.argmax(out.logits[0]))
        else:
            rng, sub = jax.random.split(rng)
            action = int(jax.random.categorical(sub, out.logits[0]))
        if action == 0 and out.obj_logits is not None:
            # REVERIE: ground the referred object at the stop viewpoint
            pred = int(jnp.argmax(out.obj_logits[0]))
            token = f"{state['ep']['scan']}_{state['cur']}"
            entry = (env.objects or {}).get(token)
            if entry is not None and pred < len(entry["ids"]):
                state["pred_obj_id"] = entry["ids"][pred]
        env.step(state, action)
    return env.metrics(state), trace


def run_episodes_batched(policy: VLNPolicy, params, env: R2REnv,
                         ep_idxs, cfg: PolicyConfig, greedy: bool = True,
                         rng=None, collect_teacher: bool = False,
                         mesh=None):
    """Lockstep-batched rollouts: one jitted policy call per step for B
    episodes (the policy is row-independent, so per-episode results match
    :func:`run_episode` exactly — tests/test_batched_rollout.py).

    Graph stepping stays host-side per episode; finished episodes are
    frozen (their rows still flow through the batch, outputs ignored).
    Returns (metrics_list, traces_list) parallel to ``ep_idxs``.

    ``mesh``: an :func:`~vln_ver_tpu.agent.parallel.make_agent_mesh`
    ('data',) mesh — the per-step batch shards over its devices and
    GSPMD partitions the (row-independent) policy step, scaling eval
    throughput with device count (the reference's own eval-sharding
    pattern, samplers/distributed_sampler.py:36-39, applied to the
    agent).  ``len(ep_idxs)`` must divide by the mesh size; results are
    device-count-independent (tests/test_batched_rollout.py).
    """
    if not greedy and rng is None:
        raise ValueError("sampled rollout (greedy=False) requires rng")
    if mesh is not None:
        from .parallel import replicate_agent, shard_agent_batch
        params = replicate_agent(mesh, params)
    bsz = len(ep_idxs)
    states = [env.reset(i) for i in ep_idxs]
    text_feats = None
    traces = [[] for _ in ep_idxs]
    step_fn = policy_step_fn(policy)
    last_obs = [env.observe(s) for s in states]

    while not all(s["done"] for s in states):
        active = np.array([not s["done"] for s in states])
        obs = [env.observe(s) if a else o
               for s, a, o in zip(states, active, last_obs)]
        last_obs = obs
        b = {k: np.stack([o[k] for o in obs]) for k in obs[0]}
        b = (shard_agent_batch(mesh, b) if mesh is not None
             else {k: jnp.asarray(v) for k, v in b.items()})
        # one host build + one transfer for the whole batch (finished
        # episodes rebuild from their frozen final state — identical
        # rows, outputs ignored)
        batch_arrs = [env.memory_arrays(s) for s in states]
        mem = memory_from_arrays(batch_arrs)
        if mesh is not None:
            mem = shard_agent_batch(mesh, mem)

        obj_kw = {}
        if "obj_feats" in b:
            obj_kw = dict(obj_feats=b["obj_feats"],
                          obj_valid=b["obj_valid"])
        out = step_fn(params, b["instruction"], b["instruction"] > 0,
                      b["volume"], mem, b["cur_pos"], b["cur_slot"],
                      text_feats=text_feats, **obj_kw)
        text_feats = out.text_feats
        logits = np.asarray(out.logits, np.float32)
        if not greedy:
            rng, sub = jax.random.split(rng)
            sampled = np.asarray(jax.random.categorical(
                sub, out.logits, axis=-1))
        for i, s in enumerate(states):
            if not active[i]:
                continue
            teacher = env.teacher_action(s)
            if collect_teacher:
                traces[i].append(dict(
                    obs=obs[i], teacher=teacher,
                    memory=memory_from_arrays([batch_arrs[i]],
                                              host=True)))
            action = (int(np.argmax(logits[i])) if greedy
                      else int(sampled[i]))
            if action == 0 and out.obj_logits is not None:
                pred = int(np.argmax(np.asarray(out.obj_logits[i])))
                token = f"{s['ep']['scan']}_{s['cur']}"
                entry = (env.objects or {}).get(token)
                if entry is not None and pred < len(entry["ids"]):
                    s["pred_obj_id"] = entry["ids"][pred]
            env.step(s, action)
    return [env.metrics(s) for s in states], traces


def evaluate(policy: VLNPolicy, params, env: R2REnv,
             cfg: PolicyConfig, limit: int | None = None) -> Dict[str, float]:
    n = min(len(env.episodes), limit or len(env.episodes))
    agg: Dict[str, float] = {}
    for i in range(n):
        metrics, _ = run_episode(policy, params, env, i, cfg, greedy=True)
        for k, v in metrics.items():
            agg[k] = agg.get(k, 0.0) + v
    return {k: v / n for k, v in agg.items()}


def evaluate_batched(policy: VLNPolicy, params, env: R2REnv,
                     cfg: PolicyConfig, limit: int | None = None,
                     batch_size: int = 8, mesh=None) -> Dict[str, float]:
    """:func:`evaluate` via lockstep-batched greedy rollouts, optionally
    sharded over an agent ('data',) mesh.  SR/SPL evaluation over
    hundreds of episodes is embarrassingly parallel across episodes —
    one policy call per decision step serves ``batch_size`` episodes,
    and the mesh splits that batch across devices.  The short final
    chunk is padded by repeating its last episode (padding rows'
    metrics are dropped), keeping one compiled batch shape.  Per-episode
    metrics are identical to :func:`evaluate`'s
    (tests/test_batched_rollout.py)."""
    n = min(len(env.episodes), limit or len(env.episodes))
    if mesh is not None:
        dcount = int(mesh.devices.shape[0])
        if batch_size % dcount:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"mesh size {dcount}")
        # replicate ONCE for the whole eval; run_episodes_batched's own
        # replicate_agent is then a no-op device_put (same sharding), so
        # the param tree is not re-uploaded per chunk
        from .parallel import replicate_agent
        params = replicate_agent(mesh, params)
    agg: Dict[str, float] = {}
    for lo in range(0, n, batch_size):
        idxs = list(range(lo, min(lo + batch_size, n)))
        real = len(idxs)
        idxs += [idxs[-1]] * (batch_size - real)   # pad, drop below
        metrics, _ = run_episodes_batched(policy, params, env, idxs, cfg,
                                          greedy=True, mesh=mesh)
        for m in metrics[:real]:
            for k, v in m.items():
                agg[k] = agg.get(k, 0.0) + v
    return {k: v / n for k, v in agg.items()}


def imitation_step_loss(policy: VLNPolicy, params, batch,
                        state_targets=None):
    """Cross-entropy to teacher actions for one decision step batch.

    batch: instruction (B, L), volume (B, nvox, C), memory (EpisodicMemory),
    cur_pos (B,3), cur_slot (B,), teacher (B,) int32.
    """
    obj_kw = {}
    if "obj_feats" in batch:
        obj_kw = dict(obj_feats=batch["obj_feats"],
                      obj_valid=batch["obj_valid"])
    out = policy.apply(params, batch["instruction"],
                       batch["instruction"] > 0, batch["volume"],
                       batch["memory"], batch["cur_pos"],
                       batch["cur_slot"], **obj_kw)
    logp = jax.nn.log_softmax(out.logits, axis=-1)
    nll = -jnp.take_along_axis(logp, batch["teacher"][:, None],
                               axis=1).mean()
    aux = 0.0
    if state_targets is not None:
        aux = jnp.mean((out.state_pred - state_targets) ** 2)
    ground = 0.0
    if out.obj_logits is not None and "gt_obj" in batch:
        ground = masked_grounding_ce(out.obj_logits, batch["gt_obj"])
    return (nll + 0.5 * aux + ground,
            dict(action_nll=nll, state_mse=aux, ground_nll=ground))
