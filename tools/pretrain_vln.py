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
    p.add_argument("--text-init", default=None,
                   help="msgpack from tools/convert_text_encoder.py; "
                        "pretraining starts from BERT text weights "
                        "(DUET's recipe); pass the same flag to "
                        "train_vln.py --init-from-pretrain")
    p.add_argument("--crossmodal-init", default=None,
                   help="msgpack from tools/convert_crossmodal.py; "
                        "pretraining starts from LXMERT/DUET x-layers")
    p.add_argument("--embed-dims", type=int, default=None)
    p.add_argument("--mesh", type=int, default=0,
                   help="data-parallel updates over N local devices "
                        "(params replicated, the decision-step batch "
                        "sharded; math-identical to single-device — "
                        "tests/test_agent_mesh.py); --batch must divide "
                        "by N")
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

    from vln_ver_tpu.agent.cli_setup import (build_vln_setup,
                                             graft_pretrained)
    from vln_ver_tpu.agent.env import R2REnv
    from vln_ver_tpu.agent.pretrain import (VLNPretrainModel,
                                            collect_teacher_trace,
                                            init_pretrain_params,
                                            pretrain_loss, stack_records)

    os.makedirs(args.work_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    setup = build_vln_setup(args)
    cfg, episodes, objects = setup.cfg, setup.episodes, setup.objects
    mask_id = setup.mask_id
    special_ids = setup.special_ids

    env = R2REnv(episodes, setup.graphs, setup.ver,
                 max_nodes=cfg.max_nodes, objects=objects)
    model = VLNPretrainModel(cfg)
    params = init_pretrain_params(model, env, args.seed,
                                  objects=objects is not None)
    if setup.text_params is not None or setup.xmodal is not None:
        import flax.core
        params = flax.core.unfreeze(params)
        params["params"]["policy"] = graft_pretrained(
            params["params"]["policy"], cfg, setup.text_params,
            setup.xmodal)
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

    mesh = None
    if args.mesh:
        # the reference's distributed core is DDP training
        # (apis/mmdet_train.py:76-86) — same recipe here via GSPMD:
        # replicated params, batch sharded over 'data', gradient
        # all-reduce inserted by XLA (agent/parallel.py)
        from vln_ver_tpu.agent.parallel import (make_agent_mesh,
                                                replicate_agent)
        if args.batch % args.mesh:
            raise SystemExit(f"--batch {args.batch} must divide by "
                             f"--mesh {args.mesh}")
        mesh = make_agent_mesh(args.mesh)
        params = replicate_agent(mesh, params)
        print(f"data-parallel mesh: {args.mesh} devices")

    tx = optax.chain(optax.clip_by_global_norm(40.0),
                     optax.adamw(args.lr))
    opt_state = tx.init(params)

    @jax.jit
    def update(params, opt_state, batch, key):
        def loss_fn(p):
            return pretrain_loss(model, p, batch, key, mask_id=mask_id,
                                 special_ids=special_ids)
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
        if mesh is not None:
            from vln_ver_tpu.agent.parallel import shard_agent_batch
            batch = shard_agent_batch(mesh, batch)
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
