"""NMS-free / layout decode vs transcriptions of the reference coders
(core/bbox/coders/nms_free_coder.py, layout_coder.py)."""

import numpy as np

import jax.numpy as jnp

from vln_ver_tpu.boxes import denormalize_bbox
from vln_ver_tpu.coders import decode_boxes, decode_layouts


def _ref_threshold_mask(scores: np.ndarray, thr: float) -> np.ndarray:
    """Transcription of nms_free_coder.py:64-74 (the 0.9x lowering loop;
    the <0.01 escape is checked BEFORE the mask each iteration)."""
    mask = scores > thr
    tmp = thr
    while mask.sum() == 0:
        tmp *= 0.9
        if tmp < 0.01:
            return scores > -1
        mask = scores >= tmp
    return mask


def _rand_sample(rng, nq=40, nc=5):
    cls = rng.standard_normal((nq, nc)).astype(np.float32)
    box = rng.standard_normal((nq, 10)).astype(np.float32) * 0.3
    return cls, box


def test_decode_boxes_matches_reference_topk():
    rng = np.random.default_rng(0)
    cls, box = _rand_sample(rng)
    out = decode_boxes(jnp.asarray(cls), jnp.asarray(box), max_num=12,
                       num_classes=5,
                       post_center_range=(-99, -99, -99, 99, 99, 99))
    # reference decode_single: flat sigmoid top-k, labels = idx % C
    scores = 1 / (1 + np.exp(-cls.astype(np.float64))).reshape(-1)
    order = np.argsort(-scores)[:12]
    np.testing.assert_allclose(np.asarray(out.scores), scores[order],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.labels), order % 5)
    exp_boxes = np.asarray(denormalize_bbox(jnp.asarray(box[order // 5])))
    np.testing.assert_allclose(np.asarray(out.bboxes), exp_boxes,
                               rtol=1e-5)
    assert bool(np.asarray(out.valid).all())


def test_score_threshold_fallback_matches_reference_loop():
    """The jittable closed form of the reference's lower-by-0.9x loop must
    agree with a literal transcription across regimes: something passes
    outright; nothing passes until lowering; threshold so high the 0.01
    escape keeps everything."""
    rng = np.random.default_rng(1)
    for case, thr in [("passes", 0.3), ("lowers", 0.9),
                      ("keep_all", 0.999999), ("tiny_thr", 0.005)]:
        for seed in range(6):
            r = np.random.default_rng(hash((case, seed)) % (2 ** 32))
            cls, box = _rand_sample(r)
            if case == "lowers":
                cls -= 4.0       # all sigmoid scores below ~0.02
            if case == "keep_all":
                cls -= 12.0      # scores ~ 1e-5: lowering hits 0.01 first
            out = decode_boxes(
                jnp.asarray(cls), jnp.asarray(box), max_num=12,
                num_classes=5,
                post_center_range=(-99, -99, -99, 99, 99, 99),
                score_threshold=thr)
            scores = np.asarray(out.scores)
            exp = _ref_threshold_mask(scores, thr)
            np.testing.assert_array_equal(
                np.asarray(out.valid), exp,
                err_msg=f"{case} seed {seed} thr {thr}")
            assert np.asarray(out.valid).any(), "never zero candidates"


def test_decode_layouts_never_truncates():
    """LayoutCoder.decode_single never slices (its max_num is dead code):
    all layout queries must be decoded, however many."""
    rng = np.random.default_rng(2)
    preds = rng.standard_normal((16, 10)).astype(np.float32) * 0.3
    out = decode_layouts(jnp.asarray(preds))
    assert out.bboxes.shape[0] == 16
    exp = np.asarray(denormalize_bbox(jnp.asarray(preds)))
    np.testing.assert_allclose(np.asarray(out.bboxes), exp, rtol=1e-5)
