"""ctypes bindings for the native host-runtime library (native/ver_host.cc).

Auto-builds the shared library with the in-tree Makefile on first use and
falls back to numpy silently if no toolchain is available — native code is
an accelerator for the host data path, never a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libver_host.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            src = os.path.join(_NATIVE_DIR, "ver_host.cc")
            stale = (os.path.exists(_LIB_PATH)
                     and os.path.exists(src)
                     and os.path.getmtime(_LIB_PATH)
                     < os.path.getmtime(src))
            if not os.path.exists(_LIB_PATH) or stale:
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.ver_dense_from_sparse.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.c_int32]
            lib.ver_collate_f32.argtypes = [
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int32]
            lib.ver_confusion_hist.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def dense_from_sparse(sparse: np.ndarray, voxel_num: int,
                      empty_class: int) -> np.ndarray:
    """(M, 2) int (index, class) -> (voxel_num,) int32 dense labels."""
    lib = _load()
    if lib is None:
        from .occupancy import dense_from_sparse_np
        return dense_from_sparse_np(sparse, voxel_num, empty_class)
    sparse = np.ascontiguousarray(sparse, dtype=np.int64)
    out = np.empty(voxel_num, dtype=np.int32)
    idx = sparse[:, 0] if len(sparse) else np.zeros(0, np.int64)
    cls = sparse[:, 1] if len(sparse) else np.zeros(0, np.int64)
    idx = np.ascontiguousarray(idx)
    cls = np.ascontiguousarray(cls)
    lib.ver_dense_from_sparse(
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cls.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(sparse), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        voxel_num, empty_class)
    return out


def collate_f32(arrays) -> np.ndarray:
    """Stack equal-shape fp32 arrays along a new axis 0 (threaded memcpy)."""
    lib = _load()
    arrays = [np.ascontiguousarray(a, dtype=np.float32) for a in arrays]
    if lib is None:
        return np.stack(arrays)
    # ragged input must fail LOUDLY on both paths: np.stack raises, but
    # the native memcpy would read arrays[0].size elements out of bounds
    # from a smaller buffer (silent garbage or a segfault)
    shape0 = arrays[0].shape
    if any(a.shape != shape0 for a in arrays[1:]):
        raise ValueError(
            f"collate_f32: ragged shapes "
            f"{sorted({a.shape for a in arrays})}")
    n = len(arrays)
    elems = int(arrays[0].size)
    out = np.empty((n,) + arrays[0].shape, dtype=np.float32)
    ptrs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
          for a in arrays])
    lib.ver_collate_f32(
        ptrs, n, elems,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        min(8, n))
    return out


def confusion_hist(pred: np.ndarray, gt: np.ndarray,
                   n_classes: int) -> np.ndarray:
    """(N,) pred/gt int -> (n_classes, n_classes) int64 histogram."""
    lib = _load()
    if lib is None:
        # bounds-check BOTH pred and gt, exactly like the native path
        # (ver_host.cc ver_confusion_hist) — an out-of-range pred must be
        # dropped, not spill into the next gt row / overflow the bincount
        k = ((gt >= 0) & (gt < n_classes)
             & (pred >= 0) & (pred < n_classes))
        return np.bincount(
            n_classes * gt[k].astype(np.int64) + pred[k],
            minlength=n_classes ** 2).reshape(n_classes, n_classes)
    pred = np.ascontiguousarray(pred, dtype=np.int32)
    gt = np.ascontiguousarray(gt, dtype=np.int32)
    hist = np.zeros(n_classes * n_classes, dtype=np.int64)
    lib.ver_confusion_hist(
        pred.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        gt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pred.size, n_classes,
        hist.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return hist.reshape(n_classes, n_classes)
