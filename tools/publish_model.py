#!/usr/bin/env python
"""Strip a training checkpoint to params-only for release.

Replacement for the reference tools/model_converters/publish_model.py:
drops the optimizer state, saves a params-only orbax checkpoint, and stamps
the filename with a content hash.

Usage: python tools/publish_model.py work_dirs/vocc/ckpt out_dir
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    from vln_ver_tpu.utils.checkpoint import latest_step

    ckpt_dir, out_dir = sys.argv[1], sys.argv[2]
    step = latest_step(ckpt_dir)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    state = ocp.PyTreeCheckpointer().restore(path)
    params = state["params"] if "params" in state else state

    hasher = hashlib.sha256()
    for leaf in jax.tree.leaves(params):
        hasher.update(np.ascontiguousarray(leaf).tobytes())
    digest = hasher.hexdigest()[:8]
    out = os.path.join(os.path.abspath(out_dir), f"ver_params-{digest}")
    ocp.PyTreeCheckpointer().save(out, params, force=True)
    # carry the training metadata (config text + CLASSES — reference
    # tools/train.py:238-248 embeds these in every checkpoint) alongside
    # the published params
    meta_src = os.path.join(os.path.abspath(ckpt_dir), "meta.json")
    if os.path.isfile(meta_src):
        import shutil
        shutil.copy(meta_src, out + ".meta.json")
    print(f"published {out} (step {step}, sha {digest})")


if __name__ == "__main__":
    main()
