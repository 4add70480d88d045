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
    """Read the converted BERT blob -> (PolicyConfig overrides, params).

    The position table is truncated to the chosen max_text_len so the
    grafted tree matches the module's declared param shape (flax validates
    stored params against init shapes; a 512-row BERT table would
    otherwise fail at apply)."""
    import numpy as _np

    import flax.serialization
    with open(path, "rb") as f:
        blob = flax.serialization.msgpack_restore(f.read())
    meta = {k: int(v) for k, v in blob["meta"].items()}
    max_text_len = min(meta["max_len"], 80)
    overrides = dict(
        text_arch="bert", vocab_size=meta["vocab_size"],
        text_layers=meta["num_layers"], text_ffn_dim=meta["ffn_dim"],
        embed_dims=meta["hidden"],
        max_text_len=max_text_len)
    params = dict(blob["params"])
    params["pos_embed"] = _np.ascontiguousarray(
        params["pos_embed"][:max_text_len])
    return overrides, params


def main():
    args = parse_args()
    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import optax

    from vln_ver_tpu.agent import PolicyConfig, VLNPolicy, init_memory
    from vln_ver_tpu.agent.env import R2REnv, make_synthetic_vln
    from vln_ver_tpu.agent.rollout import (evaluate, imitation_step_loss,
                                           run_episode,
                                           run_episodes_batched)

    os.makedirs(args.work_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    # load pretrained-text overrides FIRST: the tokenized instruction
    # length must match the (possibly truncated) position table
    text_overrides, text_params = (None, None)
    if args.text_init:
        text_overrides, text_params = load_text_init(args.text_init)
    text_len = (text_overrides["max_text_len"] if text_overrides else 80)

    xmodal = None
    if args.crossmodal_init:
        import flax.serialization
        with open(args.crossmodal_init, "rb") as f:
            xmodal = flax.serialization.msgpack_restore(f.read())

    if args.synthetic:
        dims = args.embed_dims or 64
        cfg = PolicyConfig(embed_dims=dims, num_heads=4, fusion_layers=2,
                           text_layers=2, ffn_dim=2 * dims, vocab_size=128,
                           max_text_len=16, max_nodes=16, bev_z=2,
                           bev_h=4, bev_w=4, num_query_tokens=4)
        bev_num = cfg.bev_z * cfg.bev_h * cfg.bev_w
        objects = None
        made = make_synthetic_vln(
            os.path.join(args.work_dir, "synvln"), num_scans=2,
            nodes_per_scan=9, num_episodes=16, bev_num=bev_num,
            embed_dims=dims, max_text_len=cfg.max_text_len,
            with_objects=args.objects == "synthetic")
        if args.objects == "synthetic":
            episodes, graphs, ver, objects = made
        else:
            episodes, graphs, ver = made
    else:
        from vln_ver_tpu.agent.data import (WordPieceVocab, load_graphs,
                                            load_r2r_split,
                                            load_ver_features)
        dims = args.embed_dims or 768
        vocab0 = (WordPieceVocab(args.bert_vocab)
                  if args.bert_vocab else None)
        episodes, vocab = load_r2r_split(args.data_dir, "train", vocab0,
                                         text_len, prefix=args.benchmark)
        cfg = PolicyConfig(embed_dims=dims, vocab_size=len(vocab))
        graphs = load_graphs(args.connectivity,
                             [e["scan"] for e in episodes])
        ver = load_ver_features(args.ver)
        objects = None
        if args.objects and args.objects != "synthetic":
            import pickle
            with open(args.objects, "rb") as f:
                objects = pickle.load(f)

    if text_overrides:
        import dataclasses as _dc
        cfg = _dc.replace(cfg, **text_overrides)
        print(f"text-init: BERT arch, "
              f"{text_overrides['text_layers']} layers, "
              f"hidden {text_overrides['embed_dims']}, "
              f"vocab {text_overrides['vocab_size']}, "
              f"max_text_len {text_overrides['max_text_len']}")
    if xmodal is not None:
        import dataclasses as _dc
        meta = {k: int(v) for k, v in xmodal["meta"].items()}
        if meta["hidden"] != cfg.embed_dims:
            raise SystemExit(
                f"--crossmodal-init hidden {meta['hidden']} != policy "
                f"embed_dims {cfg.embed_dims} (pair it with a matching "
                "--text-init)")
        cfg = _dc.replace(cfg, fusion_arch="bert",
                          fusion_layers=meta["num_layers"],
                          num_heads=meta["num_heads"],
                          ffn_dim=meta["ffn_dim"])
        print(f"crossmodal-init: LXMERT/DUET x-layers, "
              f"{meta['num_layers']} layers, ffn {meta['ffn_dim']}, "
              f"{meta['num_heads']} heads")

    env = R2REnv(episodes, graphs, ver, max_nodes=cfg.max_nodes,
                 objects=objects)
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
    if args.text_init:
        import flax.core
        params = flax.core.unfreeze(params)
        params["params"]["text_encoder"] = jax.tree.map(jnp.asarray,
                                                        text_params)
    if xmodal is not None:
        import flax.core
        params = flax.core.unfreeze(params)
        for i in range(cfg.fusion_layers):
            params["params"][f"local_block_{i}"] = jax.tree.map(
                jnp.asarray, xmodal["local"][f"block_{i}"])
            params["params"][f"global_block_{i}"] = jax.tree.map(
                jnp.asarray, xmodal["global"][f"block_{i}"])
    if args.init_from_pretrain:
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
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"policy params: {n_params/1e6:.2f}M, episodes: {len(episodes)}")

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

    def stack_records(recs):
        """Stack buffered decision steps into one update batch: one jitted
        update per ``update_batch`` steps instead of per step (the jit
        sees a single static batch shape)."""
        obs0 = recs[0]["obs"]
        batch = dict(
            instruction=jnp.stack(
                [jnp.asarray(r["obs"]["instruction"]) for r in recs]),
            volume=jnp.stack(
                [jnp.asarray(r["obs"]["volume"]) for r in recs]),
            memory=jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0),
                *[r["memory"] for r in recs]),
            cur_pos=jnp.stack(
                [jnp.asarray(r["obs"]["cur_pos"]) for r in recs]),
            cur_slot=jnp.asarray(
                [r["obs"]["cur_slot"] for r in recs], jnp.int32),
            teacher=jnp.asarray([r["teacher"] for r in recs], jnp.int32))
        if "obj_feats" in obs0:
            batch["obj_feats"] = jnp.stack(
                [jnp.asarray(r["obs"]["obj_feats"]) for r in recs])
            batch["obj_valid"] = jnp.stack(
                [jnp.asarray(r["obs"]["obj_valid"]) for r in recs])
            batch["gt_obj"] = jnp.asarray(
                [r["obs"]["gt_obj"] for r in recs], jnp.int32)
        return batch

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
            params, opt_state, loss, aux = update(
                params, opt_state, stack_records(chunk))
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
