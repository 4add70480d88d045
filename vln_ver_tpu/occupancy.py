"""Sparse <-> dense occupancy conversion and prediction decoding.

The VER occupancy grid is ``occ_zdim x occ_ydim x occ_xdim`` (35 x 120 x 120
at the default 0.1 m resolution) flattened z-major, then y, then x.  Ground
truth and predictions are exchanged sparsely as ``(M, 2)`` int arrays of
``(flat_index, class)`` pairs; class ``occupancy_classes`` (= 16) denotes
empty space (reference mp3docc_dataset.py:505-509, 579-584).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Default VER occupancy grid (vocc.py:9,14 -> head:144-146).
OCC_DIMS = (35, 120, 120)  # (z, y, x)
OCC_CLASSES = 16


def dense_from_sparse_np(sparse: np.ndarray, voxel_num: int,
                         empty_class: int = OCC_CLASSES) -> np.ndarray:
    """(M, 2) (index, class) pairs -> (voxel_num,) dense class array (host).

    Mirrors mp3docc_dataset.get_voxel_prediction (:579-584).
    """
    dense = np.full(voxel_num, empty_class, dtype=np.int32)
    if len(sparse):
        idx = sparse[:, 0].astype(np.int64)
        # bounds-check like the native kernel (ver_host.cc drops
        # out-of-range indices): raw fancy indexing would WRAP negative
        # indices into the wrong voxel or raise on overflow — same
        # input must yield the same labels with or without the toolchain
        k = (idx >= 0) & (idx < voxel_num)
        dense[idx[k]] = sparse[:, 1][k]
    return dense


def sparse_from_dense_np(dense: np.ndarray,
                         empty_class: int = OCC_CLASSES) -> np.ndarray:
    """(voxel_num,) dense classes -> (M, 2) sparse (index, class) pairs."""
    idx = np.nonzero(dense != empty_class)[0]
    return np.stack([idx, dense[idx].astype(np.int64)], axis=-1)


def dense_from_sparse(indices: jnp.ndarray, classes: jnp.ndarray,
                      voxel_num: int,
                      empty_class: int = OCC_CLASSES) -> jnp.ndarray:
    """Jittable scatter of padded sparse GT into a dense label array.

    ``indices`` may be padded with negative values (ignored).  Replaces the
    in-step host scatter ``gt_occupancy[occ_gt[:,0]] = occ_gt[:,1]``
    (voxelformer_occupancy_head.py:1326-1331) with a static-shape scatter:
    invalid rows are redirected out of bounds and dropped.
    """
    dense = jnp.full((voxel_num,), empty_class, dtype=jnp.int32)
    valid = indices >= 0
    idx = jnp.where(valid, indices, voxel_num)  # OOB rows get dropped
    return dense.at[idx].set(classes.astype(jnp.int32), mode="drop")


def decode_occupancy_focal(logits: jnp.ndarray,
                           threshold: float = 0.25) -> jnp.ndarray:
    """Dense class decode for sigmoid (focal-loss) training.

    The reference appends a constant ``threshold`` column to the sigmoid
    scores and argmaxes, so a voxel is non-empty iff its best class score
    exceeds the threshold (head:1513-1520).  Returns ``(N,)`` int32 classes
    with ``num_classes`` = empty.
    """
    scores = jax.nn.sigmoid(logits)
    best = jnp.max(scores, axis=-1)
    cls = jnp.argmax(scores, axis=-1)
    empty = logits.shape[-1]
    return jnp.where(best > threshold, cls, empty).astype(jnp.int32)


def decode_occupancy_ce(logits: jnp.ndarray) -> jnp.ndarray:
    """Dense class decode for softmax (ce-loss) training (head:1527-1533).

    In ce mode the head emits ``occupancy_classes`` channels whose LAST
    channel is empty (the reference keeps voxels with
    ``argmax < occupancy_classes - 1``); argmax directly.
    """
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def decode_occupancy(logits: jnp.ndarray, threshold: float = 0.25,
                     loss_type: str = "focal_loss") -> jnp.ndarray:
    """Loss-type dispatch mirroring the reference's
    ``get_occupancy_prediction`` (head:1504-1536)."""
    if loss_type == "ce_loss":
        return decode_occupancy_ce(logits)
    if loss_type == "focal_loss":
        return decode_occupancy_focal(logits, threshold)
    raise NotImplementedError(f"occ_loss_type {loss_type!r}")


def occupancy_num_classes(occupancy_classes: int,
                          loss_type: str = "focal_loss") -> int:
    """Total class count INCLUDING empty for metric histograms: focal mode
    emits ``occupancy_classes`` real channels with empty appended as id
    ``occupancy_classes``; ce mode's channel set already contains empty as
    its last channel."""
    return (occupancy_classes if loss_type == "ce_loss"
            else occupancy_classes + 1)
