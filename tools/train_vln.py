#!/usr/bin/env python
"""VLN agent imitation training over VER volumes.

Covers the paper's agent half (absent from the reference repo): teacher-
forced cross-entropy on shortest-path actions + volume-state auxiliary
loss, periodic greedy evaluation (SR / SPL / nav error / oracle SR).

Usage:
  python tools/train_vln.py --synthetic --steps 200           # rehearsal
  python tools/train_vln.py --data-dir data/r2r --ver data/ver.hdf5 \
      --connectivity data/connectivity                        # real R2R
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--connectivity", default=None)
    p.add_argument("--ver", default=None, help="VER hdf5 from get_occ")
    p.add_argument("--benchmark", default="R2R",
                   choices=["R2R", "R4R", "REVERIE"])
    p.add_argument("--objects", default=None,
                   help="REVERIE candidate objects pkl: "
                        "{token: {'ids': [...], 'feats': (N, C)}}; with "
                        "--synthetic, pass 'synthetic' to rehearse "
                        "grounding")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--eval-interval", type=int, default=100)
    p.add_argument("--eval-limit", type=int, default=8)
    p.add_argument("--sample-prob", type=float, default=0.5,
                   help="fraction of rollouts with sampled (student) "
                        "actions, DAgger-style; teacher labels either way")
    p.add_argument("--dagger-ramp", type=int, default=0,
                   help="linearly ramp the student-action fraction from 0 "
                        "to --sample-prob over this many steps (DUET's IL "
                        "warm-start -> DAgger schedule); 0 = constant")
    p.add_argument("--episode-batch", type=int, default=1,
                   help="roll this many episodes in lockstep per outer "
                        "iteration (one jitted policy call per step for "
                        "the whole batch; per-episode results identical "
                        "to sequential — tests/test_batched_rollout.py)")
    p.add_argument("--update-batch", type=int, default=8,
                   help="decision steps per optimizer update (rollout "
                        "steps are buffered and stacked — one jitted "
                        "update per batch instead of per step)")
    p.add_argument("--mesh", type=int, default=0,
                   help="data-parallel updates over N local devices "
                        "(params replicated, the stacked decision-step "
                        "batch sharded; math-identical — "
                        "tests/test_agent_mesh.py); --update-batch must "
                        "divide by N; rollouts stay single-device "
                        "(host-side episode stepping)")
    p.add_argument("--work-dir", default="work_dirs/vln")
    p.add_argument("--embed-dims", type=int, default=None)
    p.add_argument("--text-init", default=None,
                   help="msgpack from tools/convert_text_encoder.py; "
                        "grafts pretrained BERT weights into the "
                        "instruction branch (sets text_arch='bert')")
    p.add_argument("--bert-vocab", default=None,
                   help="BERT vocab.txt; tokenize instructions with "
                        "WordPiece so ids match --text-init embeddings")
    p.add_argument("--init-from-pretrain", default=None,
                   help="checkpoint dir from tools/pretrain_vln.py; loads "
                        "the pretrained policy subtree (MLM head dropped) "
                        "— the DUET-lineage pretrain->finetune recipe")
    p.add_argument("--crossmodal-init", default=None,
                   help="msgpack from tools/convert_crossmodal.py; grafts "
                        "pretrained DUET/LXMERT x-layers into the local/"
                        "global fusion blocks (sets fusion_arch='bert')")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def load_text_init(path):
    """Shared with tools/pretrain_vln.py — see agent/cli_setup.py."""
    from vln_ver_tpu.agent.cli_setup import load_text_init as _impl
    return _impl(path)


def main():
    args = parse_args()
    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import optax

    from vln_ver_tpu.agent import VLNPolicy, init_memory
    from vln_ver_tpu.agent.env import R2REnv
    from vln_ver_tpu.agent.pretrain import stack_records
    from vln_ver_tpu.agent.rollout import (evaluate, imitation_step_loss,
                                           run_episode,
                                           run_episodes_batched)

    os.makedirs(args.work_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    from vln_ver_tpu.agent.cli_setup import build_vln_setup, graft_pretrained
    setup = build_vln_setup(args)
    cfg, episodes, objects = setup.cfg, setup.episodes, setup.objects

    env = R2REnv(episodes, setup.graphs, setup.ver,
                 max_nodes=cfg.max_nodes, objects=objects)
    policy = VLNPolicy(cfg)

    obs = env.observe(env.reset(0))
    mem0 = init_memory(1, cfg.max_nodes, cfg.embed_dims)
    init_obj_kw = {}
    if objects is not None:
        init_obj_kw = dict(
            obj_feats=jnp.asarray(obs["obj_feats"])[None],
            obj_valid=jnp.asarray(obs["obj_valid"])[None])
    params = policy.init(
        jax.random.PRNGKey(args.seed),
        jnp.asarray(obs["instruction"])[None],
        jnp.asarray(obs["instruction"])[None] > 0,
        jnp.asarray(obs["volume"])[None], mem0,
        jnp.asarray(obs["cur_pos"])[None],
        jnp.asarray(obs["cur_slot"])[None], **init_obj_kw)
    if args.init_from_pretrain:
        # precedence: the pretrained checkpoint supersedes the raw
        # --text-init/--crossmodal-init param grafts (pretraining already
        # started from them and trained them further; see
        # tools/pretrain_vln.py, which takes the same flags).  The flags
        # still matter here: they set the architecture the restore
        # template must match.
        if args.text_init or args.crossmodal_init:
            print("note: --init-from-pretrain supersedes the --text-init/"
                  "--crossmodal-init param grafts; the flags only pin the "
                  "matching architecture (pass the same ones used for "
                  "pretrain_vln.py)")
        from vln_ver_tpu.agent.pretrain import extract_policy_params
        from vln_ver_tpu.utils.checkpoint import (latest_step,
                                                  restore_state)
        pdir = os.path.abspath(args.init_from_pretrain)
        pstep = latest_step(pdir)
        if pstep is None:
            raise SystemExit(f"no checkpoint under {pdir}")
        # restore against a matching pretrain-param template so orbax
        # validates shapes, then keep only the policy subtree
        from vln_ver_tpu.agent.pretrain import (VLNPretrainModel,
                                                init_pretrain_params)
        template = init_pretrain_params(VLNPretrainModel(cfg), env,
                                        args.seed,
                                        objects=objects is not None)
        pre = restore_state(pdir, pstep, template)
        params = jax.tree.map(jnp.asarray, extract_policy_params(pre))
        print(f"init-from-pretrain: {pdir} step {pstep}")
    elif setup.text_params is not None or setup.xmodal is not None:
        import flax.core
        params = flax.core.unfreeze(params)
        params["params"] = graft_pretrained(
            params["params"], cfg, setup.text_params, setup.xmodal)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"policy params: {n_params/1e6:.2f}M, episodes: {len(episodes)}")

    mesh = None
    if args.mesh:
        # DDP-equivalent updates (the reference's distributed core,
        # apis/mmdet_train.py:76-86): replicated params, sharded batch,
        # GSPMD gradient all-reduce (agent/parallel.py)
        from vln_ver_tpu.agent.parallel import (make_agent_mesh,
                                                replicate_agent)
        if args.update_batch % args.mesh:
            raise SystemExit(f"--update-batch {args.update_batch} must "
                             f"divide by --mesh {args.mesh}")
        mesh = make_agent_mesh(args.mesh)
        params = replicate_agent(mesh, params)
        print(f"data-parallel mesh: {args.mesh} devices")

    tx = optax.chain(optax.clip_by_global_norm(40.0), optax.adamw(args.lr))
    opt_state = tx.init(params)

    @jax.jit
    def update(params, opt_state, batch):
        def loss_fn(p):
            return imitation_step_loss(policy, p, batch)
        (loss, aux), grads = jax.value_and_grad(loss_fn,
                                                has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss, aux

    # stack_records (imported from agent.pretrain — the ONE copy of the
    # imitation/pretrain batch contract) turns buffered decision steps
    # into one update batch: one jitted update per ``update_batch`` steps
    # instead of per step (the jit sees a single static batch shape).

    logf = open(os.path.join(args.work_dir, "vln_log.jsonl"), "a")
    t0 = time.perf_counter()
    step = 0
    losses = []
    buffer = []
    roll_rng = jax.random.PRNGKey(args.seed + 7)
    while step < args.steps:
        p_sample = args.sample_prob
        if args.dagger_ramp > 0:
            p_sample *= min(1.0, step / args.dagger_ramp)
        sample = bool(rng.uniform() < p_sample)
        roll_rng, sub = jax.random.split(roll_rng)
        if args.episode_batch > 1:
            idxs = [int(rng.integers(len(episodes)))
                    for _ in range(args.episode_batch)]
            _, traces = run_episodes_batched(
                policy, params, env, idxs, cfg, greedy=not sample,
                rng=sub, collect_teacher=True)
            for t in traces:
                buffer.extend(t)
        else:
            ep_idx = int(rng.integers(len(episodes)))
            _, trace = run_episode(policy, params, env, ep_idx, cfg,
                                   greedy=not sample, rng=sub,
                                   collect_teacher=True)
            buffer.extend(trace)
        while len(buffer) >= args.update_batch and step < args.steps:
            chunk, buffer = (buffer[:args.update_batch],
                             buffer[args.update_batch:])
            ub = stack_records(chunk)
            if mesh is not None:
                from vln_ver_tpu.agent.parallel import shard_agent_batch
                ub = shard_agent_batch(mesh, ub)
            params, opt_state, loss, aux = update(params, opt_state, ub)
            losses.append(float(loss))
            step += len(chunk)
            if (step // args.update_batch) % 5 == 0:
                avg = float(np.mean(losses[-5:]))
                print(f"step {step}: nll={avg:.4f} "
                      f"({(time.perf_counter()-t0)/step:.2f}s/step)")
                logf.write(json.dumps(dict(step=step, loss=avg)) + "\n")
                logf.flush()
            if (step % args.eval_interval < args.update_batch
                    or step >= args.steps):
                m = evaluate(policy, params, env, cfg,
                             limit=args.eval_limit)
                m["step"] = step
                print("eval:", {k: round(float(v), 3)
                                for k, v in m.items()})
                logf.write(json.dumps(m) + "\n")
                logf.flush()

    from vln_ver_tpu.utils.checkpoint import save_state
    save_state(os.path.join(args.work_dir, "ckpt"), step, params)
    print(f"saved policy params at step {step}")
    print("done")


if __name__ == "__main__":
    main()
