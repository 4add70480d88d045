#!/usr/bin/env python
"""Print the fully-merged config and the resolved dataclass configs.

Analog of the reference's ``tools/misc/print_config.py`` (mmcv
Config.pretty_text): shows the post-``_base_``-merge, post-``--cfg-options``
config dict, then the VERConfig / TrainConfig it maps to — the actual
source of truth for the compiled programs.

Usage:
  python tools/print_config.py configs/verformer/vocc.py \
      [--cfg-options model.pts_bbox_head.only_occ=True]
"""

from __future__ import annotations

import argparse
import os
import pprint
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="+", default=None)
    p.add_argument("--steps-per-epoch", type=int, default=100,
                   help="used to resolve epoch-based schedule fields")
    args = p.parse_args()

    from vln_ver_tpu.config import build_train_config, build_ver_config
    from vln_ver_tpu.config.api import apply_cfg_options, load_config

    cfg = apply_cfg_options(load_config(args.config), args.cfg_options)
    print(f"# merged config: {args.config}")
    pprint.pprint(dict(cfg), width=100, sort_dicts=False)

    ver = build_ver_config(cfg)
    tc = build_train_config(cfg, args.steps_per_epoch)
    print("\n# resolved VERConfig")
    for k, v in sorted(vars(ver).items()):
        print(f"  {k} = {v}")
    print(f"\n# resolved TrainConfig (steps/epoch={args.steps_per_epoch})")
    for k, v in sorted(vars(tc).items()):
        print(f"  {k} = {v}")


if __name__ == "__main__":
    main()
