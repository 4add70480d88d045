"""Convert a reference (torch) VoxelFormer checkpoint to a native ckpt dir.

Maps the reference's ``state_dict`` (mmcv format, as written by reference
tools/train.py:238-248) onto our flax param tree and writes an orbax
checkpoint directory directly consumable by tools/test.py / tools/get_occ.py
``--checkpoint``.

Usage:
  python tools/convert_voxelformer.py configs/verformer/vocc.py \
      --torch-ckpt epoch_500.pth --out work_dirs/vocc_ref/ckpt

  # no released weights at hand: verify the conversion end-to-end against
  # a random-initialised torch oracle of the reference model
  python tools/convert_voxelformer.py configs/verformer/vocc.py --selftest

Note: checkpoints trained with the reference require ``occ_layout='ref'``
at inference (the reference's occupancy convs learn a scrambled channel/
voxel layout — models/head.py docstring); this tool stamps that into the
saved metadata and prints a reminder.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from vln_ver_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config", help="mmcv-style python config (vocc.py)")
    p.add_argument("--torch-ckpt", default=None,
                   help="reference .pth checkpoint path")
    p.add_argument("--out", default=None, help="output ckpt dir")
    p.add_argument("--selftest", action="store_true",
                   help="random-init torch oracle -> convert -> compare "
                        "outputs (no .pth needed)")
    p.add_argument("--cfg-options", nargs="*", default=None)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from vln_ver_tpu.config import (apply_cfg_options, build_ver_config,
                                    load_config)
    from vln_ver_tpu.convert import convert_state_dict, load_torch_checkpoint
    from vln_ver_tpu.models import VoxelFormer

    cfg = apply_cfg_options(load_config(args.config), args.cfg_options)
    ver = dataclasses.replace(build_ver_config(cfg), occ_layout="ref")

    if args.selftest:
        import torch
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests"))
        from oracle_voxelformer import OracleVoxelFormer
        from vln_ver_tpu import geometry

        small = dataclasses.replace(
            ver, num_cams=3, feat_h=6, feat_w=6, in_channels=64,
            embed_dims=64, num_heads=4, encoder_layers=2, decoder_layers=2,
            ffn_dim=128, num_query=12, occ_dims=8, bev_z=2, bev_h=5,
            bev_w=5, occupancy_size=(0.6, 0.6, 0.5), dropout_rate=0.0,
            deform_impl="gather")
        torch.manual_seed(0)
        oracle = OracleVoxelFormer(small)
        sd = {k: v.detach().numpy() for k, v in
              oracle.state_dict().items()}
        params, skipped = convert_state_dict(sd, small)
        rng = np.random.default_rng(0)
        feats = rng.standard_normal(
            (1, small.num_cams, small.feat_h, small.feat_w,
             small.in_channels)).astype(np.float32)
        w2p = np.stack([geometry.make_pinhole_world2pixel(
            90.0, deg, [0.0, -0.1, 1.0])
            for deg in (0.0, 120.0, 240.0)])[None].astype(np.float32)
        shift = np.zeros((1, 3), np.float32)
        outs_t = oracle(
            torch.from_numpy(feats[0].reshape(
                small.num_cams, 1, small.feat_h * small.feat_w,
                small.in_channels)),
            torch.from_numpy(w2p), torch.from_numpy(shift))
        model = VoxelFormer(small)
        outs_j = model.apply({"params": params}, jnp.asarray(feats),
                             jnp.asarray(w2p), jnp.asarray(shift),
                             deterministic=True)
        err = float(np.abs(
            np.asarray(outs_j["occupancy_preds"])
            - outs_t["occupancy_preds"].numpy()).max())
        bev_err = float(np.abs(
            np.asarray(outs_j["bev_embed"])
            - outs_t["bev_embed"].numpy().transpose(1, 0, 2)).max())
        print(f"selftest: occupancy maxerr {err:.2e}, bev maxerr "
              f"{bev_err:.2e}, skipped keys {len(skipped)}")
        assert err < 1e-4 and bev_err < 1e-4, "fidelity selftest FAILED"
        print("selftest OK")
        return

    if not args.torch_ckpt or not args.out:
        p.error("--torch-ckpt and --out are required (or use --selftest)")

    sd = load_torch_checkpoint(args.torch_ckpt)
    params, skipped = convert_state_dict(sd, ver)
    print(f"converted {sum(1 for _ in jax.tree.leaves(params))} tensors; "
          f"skipped {len(skipped)} reference keys "
          f"(backbone/neck/loss buffers)")

    from vln_ver_tpu.train.state import TrainConfig, create_train_state
    from vln_ver_tpu.utils.checkpoint import save_state

    model = VoxelFormer(ver)
    params = jax.tree.map(jnp.asarray, params)
    state = create_train_state(model, {"params": params}, TrainConfig())
    path = save_state(args.out, 0, state)
    with open(os.path.join(args.out, "convert_meta.json"), "w") as f:
        json.dump({"source": os.path.abspath(args.torch_ckpt),
                   "occ_layout": "ref",
                   "skipped_keys": skipped}, f, indent=1)
    print(f"wrote {path}\nNOTE: evaluate with occ_layout='ref' "
          "(--cfg-options model.occ_layout=ref or the stamped metadata).")


if __name__ == "__main__":
    main()
