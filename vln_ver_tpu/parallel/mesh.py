"""Device mesh + sharding rules.

The reference's only parallelism is NCCL data-parallel DDP
(apis/mmdet_train.py:76-86).  Here scaling is expressed as shardings over a
2-axis ``jax.sharding.Mesh``:

* ``data`` — batch (viewpoints); the DP axis.
* ``view`` — the camera axis; the reference's per-camera lift
  (spatial_cross_attention.py:137-173) is a sum-then-normalise over cameras,
  which commutes with ``psum``, so sharding cameras over ICI is a drop-in
  (SURVEY.md §5.7).  GSPMD inserts the reduction automatically when the
  masked-dense SCA sums over the camera axis.

Parameters and optimizer state are replicated (the model is O(100M) params);
gradients are globally reduced by GSPMD because the loss sums over the
sharded batch axis.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              devices=None) -> Mesh:
    """Build a (data, view) mesh.  Default: all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, (shape, n)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=("data", "view"))


# PartitionSpec per batch key: batch axis over 'data', camera axis over
# 'view' where present.
_BATCH_SPECS: Dict[str, P] = {
    "features": P("data", "view"),
    "world2pixel": P("data", "view"),
    "origin_shift": P("data"),
    "gt_boxes": P("data"),
    "gt_labels": P("data"),
    "gt_valid": P("data"),
    "gt_layout": P("data"),
    "layout_valid": P("data"),
    "occ_dense": P("data"),
}


def batch_pspecs(batch: Dict) -> Dict[str, P]:
    return {k: _BATCH_SPECS.get(k, P("data")) for k in batch
            if k != "token"}


def shard_batch(mesh: Mesh, batch: Dict) -> Dict:
    """device_put the batch with (data, view) shardings; 'token' stays host."""
    out = {}
    for k, v in batch.items():
        if k == "token":
            out[k] = v
            continue
        spec = _BATCH_SPECS.get(k, P("data"))
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
