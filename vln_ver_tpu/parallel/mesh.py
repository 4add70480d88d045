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


def make_multislice_mesh(num_slices: int, data: int, view: int = 1,
                         devices=None) -> Mesh:
    """(slice, data, view) mesh for multi-slice pods: the ``slice`` axis
    crosses DCN, ``data``/``view`` ride ICI within a slice.

    Shardings put the batch over ``(slice, data)`` jointly, so the only
    cross-slice traffic is the gradient all-reduce (once per step, DCN-
    friendly); all per-sample collectives (camera psum for the SCA lift)
    stay on ICI.  On real multi-slice hardware the device order comes from
    ``mesh_utils.create_hybrid_device_mesh`` (slice-major); on
    single-process backends (CPU tests) a plain reshape is used.
    """
    devices = devices if devices is not None else jax.devices()
    assert num_slices * data * view == len(devices), (
        num_slices, data, view, len(devices))
    arr = None
    if getattr(devices[0], "slice_index", None) is not None:
        from jax.experimental import mesh_utils
        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, data, view),
            dcn_mesh_shape=(num_slices, 1, 1), devices=devices)
    if arr is None:
        arr = np.asarray(devices).reshape(num_slices, data, view)
    return Mesh(arr, axis_names=("slice", "data", "view"))


# Per-batch-key axis layout: batch axis over the data axes (('slice',)
# 'data'), camera axis over 'view' where present.
_VIEW_KEYS = ("features", "world2pixel")


def _spec(key: str, mesh: Mesh) -> P:
    batch_axes = (("slice", "data") if "slice" in mesh.axis_names
                  else "data")
    if key in _VIEW_KEYS:
        return P(batch_axes, "view")
    return P(batch_axes)


def _is_host_value(v) -> bool:
    """Non-numeric batch entries (tokens, prev-frame ids, ...) stay host."""
    if isinstance(v, (str, bytes)):
        return True
    if isinstance(v, (list, tuple)):
        return any(isinstance(x, (str, bytes)) for x in v)
    return False


def batch_pspecs(batch: Dict, mesh: Optional[Mesh] = None) -> Dict[str, P]:
    if mesh is None:  # legacy call sites: 2-axis (data, view) mesh
        return {k: (P("data", "view") if k in _VIEW_KEYS else P("data"))
                for k, v in batch.items() if not _is_host_value(v)}
    return {k: _spec(k, mesh) for k, v in batch.items()
            if not _is_host_value(v)}


def shard_batch(mesh: Mesh, batch: Dict) -> Dict:
    """device_put the batch with batch/view shardings; string-valued
    entries (token, prev, ...) stay on host."""
    out = {}
    for k, v in batch.items():
        if _is_host_value(v):
            out[k] = v
            continue
        out[k] = jax.device_put(v, NamedSharding(mesh, _spec(k, mesh)))
    return out


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
