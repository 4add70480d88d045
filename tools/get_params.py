#!/usr/bin/env python
"""Parameter-count report (reference tools/analysis_tools/get_params.py).

Usage: python tools/get_params.py [configs/verformer/vocc.py]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import numpy as np

    from vln_ver_tpu.models import VERConfig, VoxelFormer
    from __graft_entry__ import _example_inputs

    if len(sys.argv) > 1:
        from vln_ver_tpu.config import build_ver_config, load_config
        cfg = build_ver_config(load_config(sys.argv[1]))
    else:
        cfg = VERConfig()
    model = VoxelFormer(cfg)
    feats, w2p, shift = _example_inputs(cfg, batch=1)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), feats, w2p, shift))
    flat = jax.tree_util.tree_flatten_with_path(shapes)[0]
    groups = {}
    total = 0
    for key, leaf in flat:
        n = int(np.prod(leaf.shape))
        total += n
        top = jax.tree_util.keystr(key).split("'")[1::2][:3]
        groups["/".join(top[:3])] = groups.get("/".join(top[:3]), 0) + n
    for name in sorted(groups, key=groups.get, reverse=True)[:20]:
        print(f"{groups[name]/1e6:8.2f}M  {name}")
    print(f"{total/1e6:8.2f}M  TOTAL")


if __name__ == "__main__":
    main()
