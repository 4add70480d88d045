"""Export a native (orbax) VoxelFormer checkpoint as a reference .pth.

The reverse of tools/convert_voxelformer.py: maps our flax param tree
back onto the reference's ``state_dict`` names (mmcv checkpoint format,
``{'state_dict': ..., 'meta': ...}`` as the reference tools/train.py
writes, reference train.py:238-248) so a model trained here can be
loaded by the reference codebase — or any downstream torch consumer —
with ``load_state_dict(..., strict=False)`` (missing keys are only the
dead ``img_backbone``/``img_neck`` and loss buffers the reference
registers itself).

Usage:
  python tools/export_voxelformer.py configs/verformer/vocc.py \
      --checkpoint work_dirs/vocc/ckpt --out work_dirs/vocc_export.pth

Layout note: occupancy-upsampler weights are layout-faithful when the
model was trained with ``occ_layout='ref'`` (the reference's scrambled
channel/voxel layout — models/head.py docstring).  A model trained with
the default sane layout exports fine for every other tensor, but its
occupancy volume axis order differs from what the reference's reshape
expects; the tool stamps the layout into the checkpoint meta and warns.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from vln_ver_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config", help="mmcv-style python config (vocc.py)")
    p.add_argument("--checkpoint", required=True,
                   help="native ckpt dir (latest step exported)")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--step", type=int, default=None,
                   help="specific step (default: latest)")
    p.add_argument("--cfg-options", nargs="*", default=None)
    args = p.parse_args()

    import numpy as np
    import torch

    from vln_ver_tpu.config import (apply_cfg_options, build_ver_config,
                                    load_config)
    from vln_ver_tpu.convert import export_state_dict
    from vln_ver_tpu.utils.checkpoint import latest_step

    cfg = apply_cfg_options(load_config(args.config), args.cfg_options)
    ver = build_ver_config(cfg)

    step = args.step if args.step is not None else \
        latest_step(args.checkpoint)
    if step is None:
        raise FileNotFoundError(f"no ckpt under {args.checkpoint}")

    import orbax.checkpoint as ocp
    path = os.path.join(os.path.abspath(args.checkpoint),
                        f"step_{step:08d}")
    raw = ocp.PyTreeCheckpointer().restore(path)
    node = raw["params"] if isinstance(raw, dict) and "params" in raw \
        else raw
    if isinstance(node, dict) and "params" in node:
        node = node["params"]    # variables dict -> params collection

    sd = export_state_dict(node, ver)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
    meta = {"source": path, "framework": "vln_ver_tpu",
            "occ_layout": ver.occ_layout, "step": step,
            "config": os.path.abspath(args.config)}
    torch.save({"state_dict": tensors, "meta": meta}, args.out)
    n = sum(int(np.prod(v.shape)) for v in sd.values())
    print(f"exported {len(sd)} tensors ({n / 1e6:.1f}M params) "
          f"from step {step} -> {args.out}")
    if ver.occ_layout != "ref":
        print("WARNING: model uses occ_layout="
              f"'{ver.occ_layout}' (not the reference's scrambled "
              "layout); occupancy volumes decoded by the reference "
              "will have a different axis order. Train/convert with "
              "occ_layout='ref' for drop-in reference use.")


if __name__ == "__main__":
    main()
