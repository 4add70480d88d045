"""Full-size reference-fidelity measurement (vocc.py dimensions).

Instantiates the torch oracle of the reference VoxelFormer (exact module
tree / state_dict names, tests/oracle_voxelformer.py), converts its weights
with vln_ver_tpu.convert, runs both models on identical inputs at the real
vocc.py shape (768 dims, 6 cams, 900 voxel queries, 504k occupancy voxels,
refine_occ) and prints the max-abs error of every head output.

This is the measured form of the north-star clause "occupancy volumes
bitwise-comparable within fp32 tolerance vs the reference".  CPU-only,
~minutes; the CI-speed version runs in tests/test_convert_voxelformer.py.
"""

from __future__ import annotations

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
    import numpy as np
    import torch
    import jax.numpy as jnp

    from oracle_voxelformer import OracleVoxelFormer
    from vln_ver_tpu import geometry
    from vln_ver_tpu.convert import convert_state_dict
    from vln_ver_tpu.models import VERConfig, VoxelFormer
    import dataclasses

    cfg = dataclasses.replace(
        VERConfig(), dropout_rate=0.0, deform_impl="gather",
        occ_layout="ref")
    torch.manual_seed(0)
    t0 = time.time()
    oracle = OracleVoxelFormer(cfg)
    with torch.no_grad():
        for p in oracle.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params, skipped = convert_state_dict(sd, cfg)
    print(f"[{time.time()-t0:.0f}s] oracle built + converted "
          f"({len(sd)} keys, {len(skipped)} skipped)")

    rng = np.random.default_rng(0)
    feats = rng.standard_normal(
        (1, cfg.num_cams, cfg.feat_h, cfg.feat_w,
         cfg.in_channels)).astype(np.float32)
    w2p = np.stack([geometry.make_pinhole_world2pixel(
        90.0, deg, [0.0, -0.2, 1.2])
        for deg in np.linspace(0, 300, cfg.num_cams)])[None].astype(
            np.float32)
    shift = np.zeros((1, 3), np.float32)

    with torch.no_grad():
        outs_t = oracle(
            torch.from_numpy(feats[0].reshape(
                cfg.num_cams, 1, cfg.feat_h * cfg.feat_w,
                cfg.in_channels)),
            torch.from_numpy(w2p), torch.from_numpy(shift))
    print(f"[{time.time()-t0:.0f}s] torch oracle forward done")

    model = VoxelFormer(cfg)
    outs_j = model.apply({"params": params}, jnp.asarray(feats),
                         jnp.asarray(w2p), jnp.asarray(shift),
                         deterministic=True)
    print(f"[{time.time()-t0:.0f}s] jax forward done")

    def err(a, b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        return float(np.abs(a - b).max()), float(
            np.abs(a - b).mean())

    bev = err(outs_j["bev_embed"],
              outs_t["bev_embed"].numpy().transpose(1, 0, 2))
    cls = err(outs_j["all_cls_scores"], outs_t["all_cls_scores"].numpy())
    box = err(outs_j["all_bbox_preds"], outs_t["all_bbox_preds"].numpy())
    occ = err(outs_j["occupancy_preds"],
              outs_t["occupancy_preds"].numpy())
    print(f"bev_embed       max {bev[0]:.3e} mean {bev[1]:.3e}")
    print(f"all_cls_scores  max {cls[0]:.3e} mean {cls[1]:.3e}")
    print(f"all_bbox_preds  max {box[0]:.3e} mean {box[1]:.3e}")
    print(f"occupancy_preds max {occ[0]:.3e} mean {occ[1]:.3e}")
    tol = 5e-4
    ok = all(m[0] < tol for m in (bev, cls, box, occ))
    print("FIDELITY", "OK" if ok else "FAILED", f"(tol {tol})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
