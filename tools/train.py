#!/usr/bin/env python
"""Training CLI.

TPU-native replacement for the reference's tools/train.py +
apis/mmdet_train.py: one jitted train step (forward + Hungarian + losses +
backward + AdamW) pjit-sharded over a (data, view) mesh; orbax checkpoints;
the reference's mmcv-style config files drive everything.

Usage:
  python tools/train.py configs/verformer/vocc.py --work-dir work_dirs/vocc \
      [--synthetic] [--max-steps N] [--batch-size B]
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
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="+", default=None,
                   help="dotted config overrides: key.subkey=value")
    p.add_argument("--work-dir", default="work_dirs/default")
    p.add_argument("--synthetic", action="store_true",
                   help="generate a synthetic dataset if ann files missing")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--log-interval", type=int, default=None,
                   help="default: the config's log_config.interval "
                        "(vocc.py:286), else 50")
    p.add_argument("--ckpt-interval", type=int, default=1000)
    p.add_argument("--async-ckpt", action="store_true",
                   help="overlap checkpoint serialization/disk I/O with "
                        "training (orbax AsyncCheckpointer); the "
                        "device->host snapshot is still taken at the "
                        "save step")
    p.add_argument("--eval-interval", type=int, default=0,
                   help="run val-split eval every N steps (0 = off)")
    p.add_argument("--eval-limit", type=int, default=32,
                   help="cap eval-tick viewpoints (0 = full val split; "
                        "use 0 or a large value with --save-best — the "
                        "reference eval hook runs the full split)")
    p.add_argument("--occ-thresholds", type=float, nargs="+",
                   default=[0.25],
                   help="occupancy decode thresholds for the eval tick "
                        "(same surface as tools/test.py; metrics get "
                        "@thr suffixes when more than one)")
    p.add_argument("--save-best", default=None,
                   help="eval metric to track (e.g. miou, mAP_0.25); the "
                        "best checkpoint is kept at ckpt_best/ (the "
                        "reference's eval-hook save_best, "
                        "eval_hooks.py:89-90)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--remat", action="store_true",
                   help="rematerialize encoder layers in the backward pass "
                        "(larger batches at the 36-view shape; numerically "
                        "identical)")
    p.add_argument("--mesh", type=str, default=None,
                   help="mesh shape 'data,view' or 'slice,data,view' "
                        "(default: all devices dp); 3 values build the "
                        "multi-slice hybrid mesh (DCN slice axis)")
    p.add_argument("--tp-model", type=int, default=1,
                   help="tensor-parallel model-axis size: builds a "
                        "(data, view, model) mesh and shards large param "
                        "matrices + AdamW moments over 'model'")
    return p.parse_args()


def main():
    args = parse_args()
    if args.save_best and 0 < args.eval_limit < 256:
        print(f"WARNING: --save-best {args.save_best!r} with "
              f"--eval-limit {args.eval_limit}: best-checkpoint "
              "selection on a small eval subset is noise-driven; the "
              "reference eval hook scores the FULL val split "
              "(eval_hooks.py:76-82). Pass --eval-limit 0 for real runs.")
    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    from vln_ver_tpu.parallel.multihost import initialize_if_needed
    initialize_if_needed()
    import jax

    from vln_ver_tpu.config import (build_train_config, build_ver_config,
                                    load_config)
    from vln_ver_tpu.config.api import dataset_kwargs
    from vln_ver_tpu.data import MP3DDataset, make_synthetic_dataset
    from vln_ver_tpu.data.mp3d import iterate_batches
    from vln_ver_tpu.models import VoxelFormer
    from vln_ver_tpu.parallel import make_mesh, replicate, shard_batch
    from vln_ver_tpu.train import (TrainConfig, create_train_state,
                                   make_train_step, staged_batches)
    from vln_ver_tpu.train.state import make_lr_schedule, param_count
    from vln_ver_tpu.utils.checkpoint import (latest_step, restore_state,
                                              save_state)

    cfg = load_config(args.config)
    from vln_ver_tpu.config.api import apply_cfg_options
    cfg = apply_cfg_options(cfg, args.cfg_options)
    ver = build_ver_config(cfg, **({"remat_encoder": True}
                                   if args.remat else {}))
    os.makedirs(args.work_dir, exist_ok=True)

    ds_kw = dataset_kwargs(cfg, "train")
    ann = ds_kw["ann_file"]
    root = ds_kw["data_root"]
    if not os.path.exists(ann):
        if not args.synthetic:
            raise FileNotFoundError(
                f"{ann} not found; pass --synthetic to generate data")
        os.makedirs(root or "data/mp3d", exist_ok=True)
        ann = make_synthetic_dataset(root or "data/mp3d", num_scans=2,
                                     viewpoints_per_scan=4,
                                     num_cams=ver.num_cams,
                                     feat_hw=ver.feat_h,
                                     feat_dim=ver.in_channels,
                                     occ_dims=(ver.occ_zdim, ver.occ_ydim,
                                               ver.occ_xdim),
                                     pc_range=ver.pc_range)
    dataset = MP3DDataset(ann, root, voxel_num=ver.voxel_num,
                          occupancy_classes=ver.occupancy_classes,
                          num_cams=ver.num_cams, feat_hw=ver.feat_h)

    batch_size = args.batch_size or max(
        cfg.get("data", {}).get("samples_per_gpu", 1) * len(jax.devices()),
        1)
    steps_per_epoch = max(len(dataset) // batch_size, 1)
    tc = build_train_config(cfg, steps_per_epoch)
    total_steps = args.max_steps or tc.total_steps

    mesh_shape = None
    if args.mesh:
        mesh_shape = tuple(int(x) for x in args.mesh.split(","))
    if args.tp_model > 1:
        from vln_ver_tpu.parallel import make_tp_mesh
        n = len(jax.devices())
        view = mesh_shape[1] if mesh_shape and len(mesh_shape) > 1 else 1
        data = (mesh_shape[0] if mesh_shape
                else n // (view * args.tp_model))
        mesh = make_tp_mesh(data=data, model=args.tp_model, view=view)
    elif mesh_shape and len(mesh_shape) == 3:
        from vln_ver_tpu.parallel import make_multislice_mesh
        mesh = make_multislice_mesh(*mesh_shape)
    else:
        mesh = make_mesh(mesh_shape)

    batch_shards = (dict(mesh.shape).get("slice", 1)
                    * dict(mesh.shape)["data"])
    if batch_size % batch_shards:
        raise SystemExit(
            f"--batch-size {batch_size} must be divisible by the mesh's "
            f"batch shards (slice*data = {batch_shards})")

    model = VoxelFormer(ver)
    sample = dataset[0]
    init_feats = np.asarray(sample["features"])[None]
    params = model.init(jax.random.PRNGKey(args.seed), init_feats,
                        sample["world2pixel"][None],
                        sample["origin_shift"][None])
    state = create_train_state(model, params, tc)
    print(f"model params: {param_count(params)/1e6:.1f}M; "
          f"devices: {len(jax.devices())}; mesh: {mesh.shape}; "
          f"batch: {batch_size}; steps/epoch: {steps_per_epoch}")

    start_step = 0
    ckpt_dir = os.path.abspath(os.path.join(args.work_dir, "ckpt"))
    if args.resume:
        step = latest_step(ckpt_dir)
        if step is not None:
            state = restore_state(ckpt_dir, step, state)
            start_step = int(state.step)
            print(f"resumed from step {start_step}")

    if args.tp_model > 1:
        from vln_ver_tpu.parallel import shard_state
        state = shard_state(mesh, state)
    else:
        state = replicate(mesh, state)
    step_fn = make_train_step(ver, tc)
    sched = make_lr_schedule(tc)
    rng = jax.random.PRNGKey(args.seed + 1)

    # honor the reference's log_config (interval + TextLogger/Tensorboard
    # hooks, vocc.py:286-291): jsonl+stdout are the TextLogger equivalent;
    # a TensorboardLoggerHook entry turns on the native event writer
    log_cfg = cfg.get("log_config", {}) or {}
    log_interval = args.log_interval or int(log_cfg.get("interval", 50))
    tb_writer = None
    hooks = log_cfg.get("hooks", []) or []
    if any("Tensorboard" in str(h.get("type", "")) for h in hooks
           if isinstance(h, dict)):
        from vln_ver_tpu.utils.tensorboard import SummaryWriter
        tb_writer = SummaryWriter(os.path.join(args.work_dir, "tf_logs"))
        print(f"tensorboard events -> {tb_writer.path}")

    # checkpoint metadata parity (reference tools/train.py:238-248 embeds
    # config text + CLASSES in checkpoints)
    os.makedirs(ckpt_dir, exist_ok=True)
    with open(args.config) as f:
        _cfg_text = f.read()
    with open(os.path.join(ckpt_dir, "meta.json"), "w") as f:
        json.dump({"config": _cfg_text,
                   "CLASSES": list(cfg.get("class_names", ())
                                   or cfg.get("data", {}).get(
                                       "train", {}).get("classes", ()))},
                  f)

    async_saver = None
    if args.async_ckpt:
        from vln_ver_tpu.utils.checkpoint import AsyncSaver
        async_saver = AsyncSaver()

    # Preemption safety: TPU-pod/GKE preemption delivers SIGTERM with a
    # short grace window.  Finish the in-flight step, write a synchronous
    # checkpoint, and exit 0 so --resume continues from here — the
    # reference's torch.distributed.launch job just dies (epoch-granular
    # checkpoints only, vocc.py:293).  SIGINT keeps its default
    # KeyboardInterrupt for interactive runs.
    import signal
    _got_signal: list = []
    signal.signal(signal.SIGTERM,
                  lambda sig, frame: _got_signal.append(sig))

    if len(dataset) < batch_size:
        raise SystemExit(f"dataset ({len(dataset)} samples) smaller than "
                         f"--batch-size {batch_size} (drop_last would "
                         "yield zero batches per epoch)")
    log_path = os.path.join(args.work_dir, "train_log.jsonl")
    logf = open(log_path, "a")
    t0 = time.perf_counter()
    step = start_step
    stop_at_step = None
    # --resume continues the DATA ORDER too: derive the epoch (shuffle
    # seed) and the within-epoch position from the restored step, so a
    # preempted run doesn't replay epoch 0's batches (the reference's
    # mmcv resume restores the epoch counter the same way).  Exact
    # because drop_last=True makes every epoch yield exactly
    # steps_per_epoch batches (the dataset-size guard above rules out
    # the max(..., 1) clamp ever applying).
    epoch = start_step // steps_per_epoch
    skip_batches = start_step % steps_per_epoch
    best_metric = float("-inf")
    val_ds = None
    val_kw = {}
    import jax.numpy as jnp
    upload_cast = (jnp.dtype(ver.dtype)
                   if jnp.dtype(ver.dtype).itemsize < 4 else None)
    with mesh:
        while step < total_steps:
            # deterministic per-epoch shuffle (the reference's
            # DistributedGroupSampler semantics, group_sampler.py:14-110)
            order = np.random.default_rng(
                args.seed + epoch).permutation(len(dataset))
            if skip_batches:
                order = order[skip_batches * batch_size:]
                skip_batches = 0
            epoch += 1

            def _place(b):
                # runs on the transfer thread: upload batch k+1 while
                # batch k's step is in flight (train.feed.staged_batches;
                # same placement math the loop used inline).  bf16
                # configs pre-cast the features before the host->device
                # transfer — the encoder's first touch is that exact
                # cast in-graph, so the math is bit-identical
                # (tests/test_train_step.py) while the dominant upload
                # halves (the ver_writer "auto" rule).
                b.pop("token", None)
                if upload_cast is not None:
                    b["features"] = np.asarray(
                        b["features"]).astype(upload_cast)
                return shard_batch(mesh, b)

            for sharded in staged_batches(
                    iterate_batches(dataset, batch_size, indices=order,
                                    drop_last=True), _place):
                if step >= total_steps:
                    break
                state, metrics = step_fn(state, sharded,
                                         jax.random.fold_in(rng, step))
                step += 1
                if _got_signal and stop_at_step is None:
                    # Multi-process: the orbax save is a cross-process
                    # collective keyed on the step path, but with async
                    # dispatch each process's python step counter may
                    # differ by a step when the signal lands — agree on
                    # max(step) across processes and keep stepping until
                    # every process reaches it, so all of them call
                    # save_state with the SAME step.
                    stop_at_step = step
                    if jax.process_count() > 1:
                        from jax.experimental import multihost_utils
                        stop_at_step = int(multihost_utils
                                           .process_allgather(
                                               np.int64(step)).max())
                    print(f"signal {_got_signal[0]}: will checkpoint at "
                          f"step {stop_at_step} and exit (resume with "
                          f"--resume)")
                if stop_at_step is not None and step >= stop_at_step:
                    if async_saver is not None:
                        async_saver.wait()
                    save_state(ckpt_dir, step, state)
                    logf.flush()
                    print(f"signal checkpoint saved at step {step}")
                    return
                if step % log_interval == 0 or step == total_steps:
                    m = {k: float(v) for k, v in metrics.items()}
                    if m.get("sca_overflow", 0) > 0:
                        save_state(ckpt_dir, step, state)
                        raise SystemExit(
                            f"sca_query_capacity overflow at step {step}: "
                            f"{int(m['sca_overflow'])} visible queries "
                            "beyond capacity in the worst camera slot — "
                            "the sparse lift silently dropped them. "
                            "Validate the dataset with "
                            "tools/check_query_capacity.py and raise "
                            "model.sca_query_capacity (checkpoint saved).")
                    m.update(step=step, lr=float(sched(step)),
                             sec_per_step=(time.perf_counter() - t0)
                             / max(step - start_step, 1))
                    logf.write(json.dumps(m) + "\n")
                    logf.flush()
                    if tb_writer is not None:
                        tb_writer.add_scalars(
                            {f"train/{k}": v for k, v in m.items()}, step)
                        tb_writer.flush()
                    print(f"step {step}: loss={m['loss']:.4f} "
                          f"cls={m.get('loss_cls', 0):.4f} "
                          f"bbox={m.get('loss_bbox', 0):.4f} "
                          f"occ={m.get('loss_occupancy', 0):.4f} "
                          f"({m['sec_per_step']:.2f}s/step)")
                if step % args.ckpt_interval == 0 or step == total_steps:
                    if async_saver is not None:
                        async_saver.save(ckpt_dir, step, state)
                    else:
                        save_state(ckpt_dir, step, state)
                if args.eval_interval and (step % args.eval_interval == 0
                                           or step == total_steps):
                    from vln_ver_tpu.evaluation.runner import evaluate_model
                    # hoisted: construct the val dataset (HDF5 open, cache
                    # warm) once, not per eval tick
                    if val_ds is None:
                        val_kw = dataset_kwargs(cfg, "val") or \
                            dataset_kwargs(cfg, "test")
                        if val_kw and os.path.exists(val_kw["ann_file"]):
                            val_ds = MP3DDataset(
                                val_kw["ann_file"], val_kw["data_root"],
                                voxel_num=ver.voxel_num,
                                occupancy_classes=ver.occupancy_classes,
                                num_cams=ver.num_cams, feat_hw=ver.feat_h)
                    if val_ds is not None:
                        # reuse the training mesh so eval ticks also use
                        # every local chip (batch = one sample per data
                        # shard; evaluate_model pads short batches).
                        # Pass the LIVE params: evaluate_model detects
                        # they are already on the mesh and skips the
                        # replicate, so TP-sharded params stay sharded.
                        em = evaluate_model(
                            model, state.params, val_ds,
                            occ_thresholds=tuple(args.occ_thresholds),
                            limit=args.eval_limit or None,
                            classes=val_kw.get("classes", ()),
                            batch_size=batch_shards, mesh=mesh)
                        em["step"] = step
                        keep = {k: round(float(v), 4)
                                for k, v in em.items()
                                if k.startswith(("mAP", "mAR", "miou",
                                                 "iou", "occ_", "step"))}
                        print("eval:", keep)
                        logf.write(json.dumps(keep) + "\n")
                        logf.flush()
                        if tb_writer is not None:
                            tb_writer.add_scalars(
                                {f"val/{k}": v for k, v in keep.items()},
                                step)
                            tb_writer.flush()
                        # multi-threshold evals suffix metric keys with
                        # @thr — resolve --save-best against the FIRST
                        # listed threshold's variant (the user's primary)
                        best_key = args.save_best
                        if best_key and best_key not in em:
                            first = (f"{best_key}"
                                     f"@{args.occ_thresholds[0]:.2f}")
                            cands = [k for k in em
                                     if k.startswith(best_key + "@")]
                            best_key = (first if first in em
                                        else (cands[0] if cands else None))
                            if best_key is None:
                                print(f"warning: --save-best "
                                      f"{args.save_best!r} matches no "
                                      f"eval metric {sorted(keep)}")
                        if best_key is not None:
                            cur = float(em[best_key])
                            if cur > best_metric:
                                best_metric = cur
                                save_state(os.path.join(
                                    args.work_dir, "ckpt_best"), step,
                                    state)
                                print(f"new best {args.save_best}="
                                      f"{cur:.4f} at step {step}")
    if async_saver is not None:
        async_saver.wait()   # flush any in-flight checkpoint write
    print("done")


if __name__ == "__main__":
    main()
