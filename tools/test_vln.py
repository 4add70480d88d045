#!/usr/bin/env python
"""VLN agent evaluation CLI: greedy rollouts, SR / SPL / NE / oracle SR.

Usage:
  python tools/test_vln.py --checkpoint work_dirs/vln/ckpt --synthetic
  python tools/test_vln.py --checkpoint ... --data-dir data/r2r \
      --connectivity data/connectivity --ver work_dirs/ver.hdf5 \
      [--split val_unseen] [--benchmark R2R|R4R|REVERIE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--connectivity", default=None)
    p.add_argument("--ver", default=None)
    p.add_argument("--split", default="val_unseen")
    p.add_argument("--benchmark", default="R2R",
                   choices=["R2R", "R4R", "REVERIE"])
    p.add_argument("--objects", default=None,
                   help="REVERIE candidate-objects pkl, or 'synthetic'")
    p.add_argument("--bert-vocab", default=None,
                   help="BERT vocab.txt for checkpoints trained with "
                        "--bert-vocab (else the train split's vocab is "
                        "rebuilt for tokenization)")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--embed-dims", type=int, default=None)
    p.add_argument("--work-dir", default="work_dirs/vln")
    p.add_argument("--batch", type=int, default=None,
                   help="lockstep-batched eval: episodes per policy call "
                        "(rollout.evaluate_batched; default: per-episode)")
    p.add_argument("--mesh", type=int, default=None,
                   help="shard the eval batch over N local devices "
                        "(('data',) agent mesh; implies --batch, default "
                        "N episodes per call)")
    return p.parse_args()


def main():
    args = parse_args()
    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from vln_ver_tpu.agent import PolicyConfig, VLNPolicy, init_memory
    from vln_ver_tpu.agent.env import R2REnv, make_synthetic_vln
    from vln_ver_tpu.agent.rollout import evaluate
    from vln_ver_tpu.utils.checkpoint import latest_step, restore_state

    if args.synthetic:
        dims = args.embed_dims or 64
        cfg = PolicyConfig(embed_dims=dims, num_heads=4, fusion_layers=2,
                           text_layers=2, ffn_dim=2 * dims, vocab_size=128,
                           max_text_len=16, max_nodes=16, bev_z=2,
                           bev_h=4, bev_w=4, num_query_tokens=4)
        objects = None
        made = make_synthetic_vln(
            os.path.join(args.work_dir, "synvln"), num_scans=2,
            nodes_per_scan=9, num_episodes=16,
            bev_num=cfg.bev_z * cfg.bev_h * cfg.bev_w,
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
        # tokenize with the TRAINING vocab (ids are corpus-frequency
        # dependent): rebuilding one from the eval split would index the
        # restored embedding rows with wrong token ids — shape-mismatch
        # at restore when sizes differ, silent garbage when they don't
        vocab0 = (WordPieceVocab(args.bert_vocab) if args.bert_vocab
                  else load_r2r_split(args.data_dir, "train", None, 80,
                                      prefix=args.benchmark)[1])
        episodes, vocab = load_r2r_split(args.data_dir, args.split,
                                         vocab0, 80,
                                         prefix=args.benchmark)
        cfg = PolicyConfig(embed_dims=dims, vocab_size=len(vocab))
        graphs = load_graphs(args.connectivity,
                             [e["scan"] for e in episodes])
        ver = load_ver_features(args.ver)
        objects = None
        if args.objects and args.objects != "synthetic":
            import pickle
            with open(args.objects, "rb") as f:
                objects = pickle.load(f)

    env = R2REnv(episodes, graphs, ver, max_nodes=cfg.max_nodes,
                 objects=objects)
    policy = VLNPolicy(cfg)
    obs = env.observe(env.reset(0))
    mem = init_memory(1, cfg.max_nodes, cfg.embed_dims)
    params = policy.init(
        jax.random.PRNGKey(0), jnp.asarray(obs["instruction"])[None],
        jnp.asarray(obs["instruction"])[None] > 0,
        jnp.asarray(obs["volume"])[None], mem,
        jnp.asarray(obs["cur_pos"])[None],
        jnp.asarray(obs["cur_slot"])[None],
        **(dict(obj_feats=jnp.asarray(obs["obj_feats"])[None],
                obj_valid=jnp.asarray(obs["obj_valid"])[None])
           if objects is not None else {}))
    step = latest_step(args.checkpoint)
    if step is None:
        raise FileNotFoundError(f"no ckpt under {args.checkpoint}")
    params = restore_state(args.checkpoint, step, params)
    print(f"restored policy step {step}")

    if args.mesh or args.batch:
        from vln_ver_tpu.agent.parallel import make_agent_mesh
        from vln_ver_tpu.agent.rollout import evaluate_batched

        mesh = make_agent_mesh(args.mesh) if args.mesh else None
        batch = args.batch or args.mesh
        metrics = evaluate_batched(policy, params, env, cfg,
                                   limit=args.limit, batch_size=batch,
                                   mesh=mesh)
    else:
        metrics = evaluate(policy, params, env, cfg, limit=args.limit)
    print(json.dumps({k: round(float(v), 4) for k, v in metrics.items()}))


if __name__ == "__main__":
    main()
