import numpy as np

from vln_ver_tpu.evaluation import SSCMetrics
from vln_ver_tpu.evaluation.indoor_eval import (average_precision, box3d_iou,
                                                indoor_eval)


def test_ssc_metrics_perfect_prediction():
    m = SSCMetrics(17)
    gt = np.array([0, 1, 2, 16, 16, 5])
    m.add_batch(gt, gt)
    stats = m.get_stats()
    assert stats["precision"] == 1.0 and stats["recall"] == 1.0
    assert stats["iou"] == 100.0
    np.testing.assert_allclose(stats["iou_ssc"][[0, 1, 2, 5]], 100.0,
                               atol=1e-3)


def test_ssc_metrics_completion_counts():
    m = SSCMetrics(3)  # 2 classes + empty(2)
    gt = np.array([0, 0, 1, 2])
    pred = np.array([0, 2, 1, 0])   # one FN (gt 0 -> empty), one FP
    m.add_batch(pred, gt)
    s = m.get_stats()
    # tp=2 (two non-empty correct-as-nonempty), fp=1, fn=1
    assert abs(s["precision"] - 2 / 3) < 1e-9
    assert abs(s["recall"] - 2 / 3) < 1e-9
    assert abs(s["iou"] - 100.0 * 2 / 4) < 1e-9


def test_ssc_metrics_visible_mask():
    m = SSCMetrics(3)
    gt = np.array([0, 1])
    pred = np.array([1, 1])
    m.add_batch(pred, gt, visible_mask=np.array([0, 1]))
    s = m.get_stats()
    assert s["precision"] == 1.0  # masked-out wrong voxel ignored


def test_confusion_hist_device_matches_host():
    """The on-device scatter histogram must reproduce SSCMetrics'
    accumulation EXACTLY (counts are integers) — with and without a
    visibility mask."""
    from vln_ver_tpu.evaluation.ssc_metrics import confusion_hist_device
    import jax

    rng = np.random.default_rng(0)
    n = 17
    pred = rng.integers(0, n, (3, 5000)).astype(np.int32)
    # include OUT-OF-RANGE gt (negative ignore labels and >= n): the
    # host path filters them; the device scatter must not wrap them
    # (negative flat indices normalize NumPy-style before 'drop')
    gt = rng.integers(-2, n + 3, (3, 5000)).astype(np.int32)
    vis = rng.integers(0, 2, (3, 5000)).astype(np.int32)

    for weight in (np.ones_like(vis), vis):
        host = SSCMetrics(n)
        for i in range(3):
            host.add_batch(pred[i], gt[i],
                           visible_mask=None if weight is not vis
                           else vis[i])
        dev = np.asarray(jax.jit(
            confusion_hist_device, static_argnums=3)(
                pred, gt, weight, n))
        np.testing.assert_array_equal(dev.astype(np.float64), host.hist)


def test_box3d_iou_identical_and_disjoint():
    b = np.array([0, 0, 0, 2, 2, 2, 0.3])
    assert abs(box3d_iou(b, b) - 1.0) < 1e-6
    b2 = b.copy()
    b2[0] = 10
    assert box3d_iou(b, b2) == 0.0


def test_box3d_iou_axis_aligned_half_overlap():
    b1 = np.array([0, 0, 0, 2, 2, 2, 0.0])
    b2 = np.array([1, 0, 0, 2, 2, 2, 0.0])
    # inter 1x2x2=4; union 8+8-4=12
    assert abs(box3d_iou(b1, b2) - 4 / 12) < 1e-6


def test_box3d_iou_rotation_invariance():
    b1 = np.array([0, 0, 0, 2, 1, 1, 0.7])
    b2 = np.array([0, 0, 0, 2, 1, 1, 0.7 + np.pi])  # same box, flipped
    assert abs(box3d_iou(b1, b2) - 1.0) < 1e-5


def test_average_precision_perfect():
    r = np.array([0.5, 1.0])
    p = np.array([1.0, 1.0])
    assert abs(average_precision(r, p) - 1.0) < 1e-9


def test_indoor_eval_end_to_end():
    gt = [{"boxes": np.array([[0, 0, 0, 2, 2, 2, 0.0],
                              [5, 5, 0, 1, 1, 1, 0.0]]),
           "labels": np.array([0, 1])}]
    pred = [{"boxes": np.array([[0.1, 0, 0, 2, 2, 2, 0.0],
                                [5, 5, 0, 1, 1, 1, 0.0],
                                [-5, -5, 0, 1, 1, 1, 0.0]]),
             "labels": np.array([0, 1, 1]),
             "scores": np.array([0.9, 0.8, 0.7])}]
    m = indoor_eval(gt, pred, iou_thresholds=(0.25, 0.5),
                    classes=("a", "b"))
    assert m["a_AP_0.25"] == 1.0
    assert m["b_AP_0.25"] == 1.0  # false positive ranked below the match
    assert m["mAP_0.25"] == 1.0
    assert m["mAP_0.50"] == 1.0


def test_indoor_eval_duplicate_detection_is_fp():
    """VOC matching semantics (reference indoor_eval.py:125-143): each
    detection matches its ARGMAX GT over all GTs; if that GT is already
    taken the detection is FP — it must not greedily re-match a weaker
    second GT (which would inflate AP)."""
    gt = [{"boxes": np.array([[0, 0, 0, 2, 2, 2, 0.0],
                              [1.0, 0, 0, 2, 2, 2, 0.0]]),
           "labels": np.array([0, 0])}]
    # both detections sit exactly on GT-A (IoU 1.0 with A, 1/3 with B)
    pred = [{"boxes": np.array([[0, 0, 0, 2, 2, 2, 0.0],
                                [0, 0, 0, 2, 2, 2, 0.0]]),
             "labels": np.array([0, 0]),
             "scores": np.array([0.9, 0.8])}]
    m = indoor_eval(gt, pred, iou_thresholds=(0.25,), classes=("a",))
    # tp=[1,0] fp=[0,1], npos=2 -> area-AP 0.5 (greedy re-match gives 1.0)
    assert abs(m["a_AP_0.25"] - 0.5) < 1e-9


def test_indoor_eval_threshold_is_strict():
    """The reference marks TP only for iou_max > thresh (strict)."""
    gt = [{"boxes": np.array([[0, 0, 0, 2, 2, 2, 0.0]]),
           "labels": np.array([0])}]
    pred = [{"boxes": np.array([[1.0, 0, 0, 2, 2, 2, 0.0]]),  # IoU = 1/3
             "labels": np.array([0]), "scores": np.array([0.9])}]
    m = indoor_eval(gt, pred, iou_thresholds=(1 / 3,), classes=("a",))
    assert m["a_AP_0.33"] == 0.0
