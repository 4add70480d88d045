"""Native host-runtime library: build + parity vs numpy fallbacks."""

import numpy as np
import pytest

from vln_ver_tpu import native
from vln_ver_tpu.occupancy import dense_from_sparse_np


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_dense_from_sparse_parity(lib_ok):
    rng = np.random.default_rng(0)
    n, voxel_num = 5000, 504000
    idx = rng.choice(voxel_num, n, replace=False)
    cls = rng.integers(0, 16, n)
    sparse = np.stack([idx, cls], -1)
    got = native.dense_from_sparse(sparse, voxel_num, 16)
    exp = dense_from_sparse_np(sparse, voxel_num, 16)
    np.testing.assert_array_equal(got, exp)


def test_dense_from_sparse_empty_and_oob(lib_ok):
    got = native.dense_from_sparse(np.zeros((0, 2), np.int64), 100, 16)
    assert (got == 16).all()
    sparse = np.array([[150, 3], [-1, 4], [5, 7]])
    got = native.dense_from_sparse(sparse, 100, 16)
    assert got[5] == 7 and (got != 3).all() and (got != 4).all()


def test_collate_parity(lib_ok):
    rng = np.random.default_rng(1)
    arrays = [rng.standard_normal((6, 14, 14, 32)).astype(np.float32)
              for _ in range(5)]
    got = native.collate_f32(arrays)
    np.testing.assert_array_equal(got, np.stack(arrays))


def test_confusion_hist_parity(lib_ok):
    rng = np.random.default_rng(2)
    gt = rng.integers(0, 17, 100000).astype(np.int32)
    pred = rng.integers(0, 17, 100000).astype(np.int32)
    got = native.confusion_hist(pred, gt, 17)
    k = (gt >= 0) & (gt < 17)
    exp = np.bincount(17 * gt[k].astype(np.int64) + pred[k],
                      minlength=17 * 17).reshape(17, 17)
    np.testing.assert_array_equal(got, exp)


def test_confusion_hist_oob_parity_native_vs_fallback(monkeypatch):
    """Out-of-range PRED entries must be dropped identically by the native
    path (ver_host.cc bounds-checks both pred and gt) and the numpy
    fallback — pred == n_classes must not spill into the next gt row nor
    overflow the bincount reshape."""
    gt = np.array([0, 16, 5, 16], np.int32)
    pred = np.array([17, 16, -1, 17], np.int32)
    exp = np.zeros((17, 17), np.int64)
    exp[16, 16] = 1
    if native.available():
        np.testing.assert_array_equal(
            native.confusion_hist(pred, gt, 17), exp)
    monkeypatch.setattr(native, "_load", lambda: None)  # force fallback
    np.testing.assert_array_equal(
        native.confusion_hist(pred, gt, 17), exp)
