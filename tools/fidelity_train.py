"""Full-size training-dynamics fidelity (vocc.py dimensions, 3 steps).

Runs N jitted train steps (forward + scipy host matching + reference
losses + backward + clip-300 + AdamW, the vocc.py:261-270 recipe) from a
converted torch-oracle init, and the identical recipe through torch
autograd (tests/oracle_voxelformer.oracle_train_steps), on identical
batches at the REAL vocc.py shape (208.8M params, 6 cams, 900 queries,
504k occupancy voxels).  Prints the per-step total-loss diff and the
parameter-drift agreement (relative L2 — see
tests/test_train_dynamics_parity.py for why element-wise max is not a
meaningful metric under Adam's step-1 sign normalization).

CPU-only (the host matcher needs pure_callback), slow (~tens of minutes
on the 1-core host); the CI-speed version is
tests/test_train_dynamics_parity.py.  Results are recorded in
docs/performance.md ("training-dynamics fidelity").
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

from vln_ver_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--max-gt", type=int, default=6)
    args = p.parse_args()

    import dataclasses

    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from oracle_voxelformer import OracleVoxelFormer, oracle_train_steps
    from vln_ver_tpu import geometry
    from vln_ver_tpu.convert import convert_state_dict
    from vln_ver_tpu.models import VERConfig, VoxelFormer
    from vln_ver_tpu.train import (TrainConfig, create_train_state,
                                   make_train_step)
    from vln_ver_tpu.train.state import make_lr_schedule

    cfg = dataclasses.replace(
        VERConfig(), dropout_rate=0.0, deform_impl="gather",
        occ_layout="ref")
    torch.manual_seed(0)
    t0 = time.time()
    oracle = OracleVoxelFormer(cfg)
    with torch.no_grad():
        for prm in oracle.parameters():
            prm.add_(torch.randn_like(prm) * 0.02)
    sd0 = {k: v.detach().numpy().copy()
           for k, v in oracle.state_dict().items()}
    params0, skipped = convert_state_dict(sd0, cfg)
    print(f"[{time.time()-t0:.0f}s] oracle built + converted "
          f"({len(sd0)} keys, {len(skipped)} skipped)")

    mg = args.max_gt

    def make_batch(seed):
        r = np.random.default_rng(seed)
        feats = r.standard_normal(
            (1, cfg.num_cams, cfg.feat_h, cfg.feat_w,
             cfg.in_channels)).astype(np.float32)
        w2p = np.stack([geometry.make_pinhole_world2pixel(
            90.0, deg, [0.0, -0.2, 1.2])
            for deg in np.linspace(0, 300, cfg.num_cams)])[None].astype(
                np.float32)
        shift = np.zeros((1, 3), np.float32)
        gt = np.zeros((1, mg, 9), np.float32)
        gt[..., 0:2] = r.uniform(-4, 4, (1, mg, 2))
        gt[..., 2] = r.uniform(0.0, 1.5, (1, mg))
        gt[..., 3:6] = r.uniform(0.3, 2.0, (1, mg, 3))
        gt[..., 6] = r.uniform(-np.pi, np.pi, (1, mg))
        labels = r.integers(0, cfg.num_classes, (1, mg)).astype(np.int32)
        valid = np.zeros((1, mg), bool)
        valid[0, : int(r.integers(1, mg + 1))] = True
        occ = r.integers(0, cfg.occupancy_classes + 1,
                         (1, cfg.voxel_num)).astype(np.int32)
        return dict(features=feats, world2pixel=w2p, origin_shift=shift,
                    gt_boxes=gt, gt_labels=labels, gt_valid=valid,
                    occ_dense=occ)

    batches = [make_batch(100 + i) for i in range(args.steps)]

    tc = TrainConfig(learning_rate=1e-4, weight_decay=0.01,
                     warmup_steps=0, total_steps=10**8,
                     grad_clip_norm=300.0, matcher="host")
    model = VoxelFormer(cfg)
    state = create_train_state(model, {"params": params0}, tc)
    step_fn = make_train_step(cfg, tc, donate=False)
    key = jax.random.PRNGKey(0)
    losses_j = []
    for i, b in enumerate(batches):
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        state, metrics = step_fn(state, jb, jax.random.fold_in(key, i))
        losses_j.append(float(metrics["loss"]))
        print(f"[{time.time()-t0:.0f}s] jax step {i}: "
              f"loss={losses_j[-1]:.6f}")
    final_j = jax.device_get(state.params["params"])

    def to_torch(b):
        return dict(
            mlvl_feats=torch.from_numpy(
                b["features"].transpose(1, 0, 2, 3, 4).reshape(
                    cfg.num_cams, 1, cfg.feat_h * cfg.feat_w,
                    cfg.in_channels).copy()),
            world2pixel=torch.from_numpy(b["world2pixel"]),
            origin_shift=torch.from_numpy(b["origin_shift"]),
            gt_boxes=torch.from_numpy(b["gt_boxes"]),
            gt_labels=torch.from_numpy(b["gt_labels"]).long(),
            gt_valid=torch.from_numpy(b["gt_valid"]),
            occ_dense=torch.from_numpy(b["occ_dense"]).long(),
        )

    sched = make_lr_schedule(tc)
    losses_t = oracle_train_steps(
        oracle, cfg, [to_torch(b) for b in batches],
        lr_fn=lambda s: float(sched(s)), weight_decay=tc.weight_decay,
        clip_norm=tc.grad_clip_norm)
    print(f"[{time.time()-t0:.0f}s] torch steps done")
    sdN = {k: v.detach().numpy().copy()
           for k, v in oracle.state_dict().items()}
    paramsN, _ = convert_state_dict(sdN, cfg)

    from vln_ver_tpu.utils.params import drift_rel_l2, flatten_params

    init = flatten_params(params0)
    fj = flatten_params(final_j)
    ft = flatten_params(paramsN)
    global_rel, worst = drift_rel_l2(init, fj, ft)

    print("per-step loss:")
    for i, (lj, lt) in enumerate(zip(losses_j, losses_t)):
        print(f"  step {i}: jax={lj:.6f} torch={lt:.6f} "
              f"rel={abs(lj-lt)/abs(lt):.2e}")
    print(f"param drift rel-L2: global {global_rel:.4f}, "
          f"worst leaf {worst[0]:.4f} ({worst[1]})")
    max_loss_rel = max(abs(a - b) / abs(b)
                       for a, b in zip(losses_j, losses_t))
    ok = max_loss_rel < 1e-3 and global_rel < 0.05
    print("TRAIN FIDELITY", "OK" if ok else "FAILED",
          f"(loss rel {max_loss_rel:.2e}, drift relL2 {global_rel:.4f})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
