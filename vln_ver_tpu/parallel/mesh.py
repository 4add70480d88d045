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
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if None not in slice_ids and len(slice_ids) > 1:
        # real multi-slice hardware: slice-major placement so `slice` is
        # the DCN axis.  (Multi-process CPU also exposes slice_index, but
        # as a single value — the reshape fallback below handles it.)
        if len(slice_ids) != num_slices:
            # a plain-reshape fallback here would interleave DCN links
            # inside the 'data' axis and silently route every per-sample
            # collective over DCN — refuse instead
            raise ValueError(
                f"num_slices={num_slices} but the devices span "
                f"{len(slice_ids)} hardware slices "
                f"{sorted(slice_ids)}; pass num_slices="
                f"{len(slice_ids)} so the 'slice' axis is the DCN axis")
        from jax.experimental import mesh_utils
        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, data, view),
            dcn_mesh_shape=(num_slices, 1, 1), devices=devices)
    if arr is None:
        arr = np.asarray(devices).reshape(num_slices, data, view)
    return Mesh(arr, axis_names=("slice", "data", "view"))


# Per-batch-key axis layout: batch axis over the data axes (('slice',)
# 'data'), camera axis over 'view' where present.  "images" is the fused
# image->VER path's raw uint8 views (B, cams, H, W, 3) — camera-sharded
# like the features they replace.
_VIEW_KEYS = ("features", "world2pixel", "images")


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


def parse_eval_mesh(arg: str) -> Mesh:
    """CLI '--mesh data[,view]' for the eval/get_occ tools: builds a
    (data, view) mesh from this process's LOCAL devices — under
    jax.distributed the dataset is already sharded per process
    (multihost.shard_indices), so the per-batch mesh must span only the
    chips this process can address."""
    shape = tuple(int(x) for x in arg.split(","))
    if len(shape) == 1:
        shape = (shape[0], 1)
    if len(shape) != 2:
        raise ValueError(
            f"--mesh wants 'data' or 'data,view', got {arg!r}")
    devices = jax.local_devices()
    n = shape[0] * shape[1]
    if n > len(devices):
        raise ValueError(
            f"--mesh {arg}: needs {n} devices, this process has "
            f"{len(devices)}")
    # subset meshes are legitimate (eval on 2 of 4 chips) — slice,
    # don't trip make_mesh's exact-cover assert
    return make_mesh(shape, devices=devices[:n])


def data_axis_size(mesh: Mesh) -> int:
    """Product of the batch-carrying axes (('slice',) 'data') — the
    granularity batch dims must divide for ``shard_batch``."""
    return int(np.prod([s for n, s in zip(mesh.axis_names,
                                          mesh.devices.shape)
                        if n in ("slice", "data")]))


def pad_and_shard(mesh: Mesh, batch: Dict, pad_to: int):
    """Pad every array's batch dim to exactly ``pad_to`` by repeating the
    last row, then ``shard_batch``.  Returns ``(sharded, real)`` where
    ``real`` is the unpadded row count — callers must drop rows >= real.

    Padding to one fixed size (not just the next ``data_axis_size``
    multiple) keeps a single compiled program: through the axon tunnel a
    second full-size compile for a short final batch costs minutes.
    """
    real = next(v.shape[0] for v in batch.values()
                if not _is_host_value(v))
    assert real <= pad_to, (real, pad_to)
    assert pad_to % data_axis_size(mesh) == 0, (
        pad_to, data_axis_size(mesh))
    if real < pad_to:
        batch = {k: v if _is_host_value(v) else np.concatenate(
            [np.asarray(v)] + [np.asarray(v[-1:])] * (pad_to - real))
            for k, v in batch.items()}
    return shard_batch(mesh, batch), real


def params_on_mesh(mesh: Mesh, tree) -> bool:
    """True if the tree's leaves are jax.Arrays already laid out on this
    mesh's devices (e.g. live tensor-parallel train params) — replicating
    such a tree would defeat the sharding (and can OOM a TP model)."""
    leaves = jax.tree.leaves(tree)
    if not leaves or not isinstance(leaves[0], jax.Array):
        return False
    try:
        return set(leaves[0].sharding.device_set) == set(
            mesh.devices.flat)
    except Exception:
        return False
