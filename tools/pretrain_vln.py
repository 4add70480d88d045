#!/usr/bin/env python
"""VLN pretraining CLI: DUET-lineage proxy tasks over offline episodes.

Trains the cross-modal policy stack with MLM + SAP (+ REVERIE object
grounding) on offline teacher trajectories BEFORE imitation finetuning —
the pretrain stage the paper's R2R numbers depend on (arXiv 2403.14158
§3.5; capability implied by the reference README's results table).

Usage:
  python tools/pretrain_vln.py --synthetic --steps 300          # rehearsal
  python tools/pretrain_vln.py --data-dir data/r2r --ver data/ver.hdf5 \
      --connectivity data/connectivity --steps 20000            # real R2R

Then finetune from it:
  python tools/train_vln.py ... --init-from-pretrain work_dirs/vln_pre/ckpt
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
                   help="REVERIE candidate objects pkl (or 'synthetic')")
    p.add_argument("--steps", type=int, default=300,
                   help="optimizer updates")
    p.add_argument("--batch", type=int, default=16,
                   help="decision steps per update")
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--mask-id", type=int, default=1,
                   help="[MASK] token id (1 = <unk> for the plain vocab; "
                        "pass the vocab's [MASK] id with --bert-vocab)")
    p.add_argument("--bert-vocab", default=None)
    p.add_argument("--embed-dims", type=int, default=None)
    p.add_argument("--work-dir", default="work_dirs/vln_pre")
    p.add_argument("--log-interval", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import optax

    from vln_ver_tpu.agent import PolicyConfig
    from vln_ver_tpu.agent.env import R2REnv, make_synthetic_vln
    from vln_ver_tpu.agent.pretrain import (VLNPretrainModel,
                                            collect_teacher_trace,
                                            init_pretrain_params,
                                            pretrain_loss, stack_records)

    os.makedirs(args.work_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)

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
        mask_id = args.mask_id
    else:
        from vln_ver_tpu.agent.data import (WordPieceVocab, load_graphs,
                                            load_r2r_split,
                                            load_ver_features)
        dims = args.embed_dims or 768
        vocab0 = (WordPieceVocab(args.bert_vocab)
                  if args.bert_vocab else None)
        episodes, vocab = load_r2r_split(args.data_dir, "train", vocab0,
                                         80, prefix=args.benchmark)
        cfg = PolicyConfig(embed_dims=dims, vocab_size=len(vocab))
        graphs = load_graphs(args.connectivity,
                             [e["scan"] for e in episodes])
        ver = load_ver_features(args.ver)
        mask_id = (vocab.stoi.get("[MASK]", args.mask_id)
                   if args.bert_vocab else args.mask_id)
        objects = None
        if args.objects and args.objects != "synthetic":
            import pickle
            with open(args.objects, "rb") as f:
                objects = pickle.load(f)

    env = R2REnv(episodes, graphs, ver, max_nodes=cfg.max_nodes,
                 objects=objects)
    model = VLNPretrainModel(cfg)
    params = init_pretrain_params(model, env, args.seed,
                                  objects=objects is not None)
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"pretrain params: {n/1e6:.2f}M, episodes: {len(episodes)}, "
          f"mask_id: {mask_id}")

    # offline teacher trajectories, collected once (DUET pretrains on a
    # fixed offline dataset)
    records = []
    for i in range(len(episodes)):
        records.extend(collect_teacher_trace(env, i, cfg))
    print(f"offline dataset: {len(records)} decision steps from "
          f"{len(episodes)} episodes")

    tx = optax.chain(optax.clip_by_global_norm(40.0),
                     optax.adamw(args.lr))
    opt_state = tx.init(params)

    @jax.jit
    def update(params, opt_state, batch, key):
        def loss_fn(p):
            return pretrain_loss(model, p, batch, key, mask_id=mask_id)
        (loss, parts), grads = jax.value_and_grad(loss_fn,
                                                  has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state2, loss,
                parts)

    key = jax.random.PRNGKey(args.seed + 11)
    logf = open(os.path.join(args.work_dir, "pretrain_log.jsonl"), "a")
    t0 = time.perf_counter()
    for step in range(1, args.steps + 1):
        idx = rng.integers(0, len(records), args.batch)
        batch = stack_records([records[i] for i in idx])
        key, sub = jax.random.split(key)
        params, opt_state, loss, parts = update(params, opt_state, batch,
                                                sub)
        if step % args.log_interval == 0 or step == args.steps:
            m = {k: round(float(v), 4) for k, v in parts.items()}
            m.update(step=step, loss=round(float(loss), 4),
                     sec_per_step=round(
                         (time.perf_counter() - t0) / step, 3))
            print(f"step {step}: {m}")
            logf.write(json.dumps(m) + "\n")
            logf.flush()

    from vln_ver_tpu.utils.checkpoint import save_state
    save_state(os.path.join(args.work_dir, "ckpt"), args.steps, params)
    print(f"saved pretrain params at step {args.steps}")
    print("done")


if __name__ == "__main__":
    main()
