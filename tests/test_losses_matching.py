import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from scipy.optimize import linear_sum_assignment

from vln_ver_tpu import losses, matching


def torch_sigmoid_focal(logits, labels, num_classes, weight=None,
                        alpha=0.25, gamma=2.0, avg_factor=None):
    """mmdet py_sigmoid_focal_loss semantics, written from its definition."""
    t = torch.zeros(logits.shape[0], num_classes)
    valid = labels < num_classes
    t[torch.arange(logits.shape[0])[valid], labels[valid]] = 1.0
    p = logits.sigmoid()
    pt = (1 - p) * t + p * (1 - t)
    fw = (alpha * t + (1 - alpha) * (1 - t)) * pt.pow(gamma)
    loss = F.binary_cross_entropy_with_logits(
        logits, t, reduction="none") * fw
    if weight is not None:
        loss = loss * weight[:, None]
    total = loss.sum()
    return total / max(avg_factor, 1.0)


def test_focal_loss_matches_mmdet_semantics():
    rng = np.random.default_rng(0)
    n, c = 64, 17
    logits = rng.standard_normal((n, c)).astype(np.float32)
    labels = rng.integers(0, c + 1, n)  # includes background (=c)
    w = rng.uniform(0.5, 1.5, n).astype(np.float32)
    got = float(losses.sigmoid_focal_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w),
        avg_factor=jnp.asarray(10.0), loss_weight=2.0))
    exp = 2.0 * float(torch_sigmoid_focal(
        torch.from_numpy(logits), torch.from_numpy(labels), c,
        torch.from_numpy(w), avg_factor=10.0))
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_focal_cost_matches_mmdet_semantics():
    rng = np.random.default_rng(1)
    nq, c, g = 20, 17, 5
    logits = rng.standard_normal((nq, c)).astype(np.float32)
    gt = rng.integers(0, c, g)
    got = np.asarray(losses.focal_loss_cost(jnp.asarray(logits),
                                            jnp.asarray(gt), weight=2.0))
    p = 1 / (1 + np.exp(-logits))
    eps = 1e-12
    neg = -np.log(1 - p + eps) * 0.75 * p ** 2
    pos = -np.log(p + eps) * 0.25 * (1 - p) ** 2
    exp = (pos[:, gt] - neg[:, gt]) * 2.0
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-6)


def test_l1_loss_nan_target_filtering():
    pred = jnp.ones((4, 3))
    target = jnp.asarray([[0.0, 0, 0], [np.nan, 0, 0], [0, 0, 0],
                          [0, 0, 0]])
    w = jnp.ones((4, 3))
    got = float(losses.weighted_l1_loss(pred, target, w,
                                        jnp.asarray(1.0)))
    # row with nan contributes zero: 3 rows * 3 * |1-0| = 9
    np.testing.assert_allclose(got, 9.0)


def _random_cost(nq, ng, seed, n_pad=0):
    rng = np.random.default_rng(seed)
    cost = rng.standard_normal((nq, ng + n_pad)).astype(np.float32) * 5
    if n_pad:
        cost[:, ng:] = matching.BIG_COST
    return cost


def test_hungarian_host_matches_scipy():
    cost = _random_cost(20, 6, 0, n_pad=2)
    got = np.asarray(matching.hungarian_host(jnp.asarray(cost)))
    rows, cols = linear_sum_assignment(cost)
    exp = np.full(8, -1, np.int32)
    exp[cols] = rows
    np.testing.assert_array_equal(got, exp)


def test_hungarian_auction_total_cost_optimal():
    for seed in range(5):
        cost = _random_cost(30, 8, seed, n_pad=4)
        # pad like train/objective._match_layer: just above the real max
        # (a BIG_COST pad inflates the auction's spread-scaled eps ~1e5x
        # and silently destroys real-column optimality — and makes any
        # total-cost tolerance proportional to `exact` vacuous)
        cost[:, 8:] = cost[:, :8].max() + 1.0
        got = np.asarray(matching.hungarian_auction(jnp.asarray(cost)))
        assert (got >= 0).all()
        assert len(np.unique(got)) == len(got)  # one-to-one
        rows, cols = linear_sum_assignment(cost)
        exact = cost[rows, cols].sum()
        ours = cost[got, np.arange(len(got))].sum()
        # auction is eps-optimal; compare with an ABSOLUTE tolerance
        assert ours <= exact + 0.05, (ours, exact)


def test_hungarian_auction_contested_gts_near_real_pad():
    """Regression: GTs that all prefer the same few queries must still
    match (eps-)optimally in the presence of padded columns.  With the
    old BIG_COST padding the spread-scaled eps (~3e3) made the auction
    misassign most contested GTs (real-cost excess ~0.3-0.5/sample)."""
    rng = np.random.default_rng(0)
    nq, ng, n_pad = 100, 4, 28
    base = rng.uniform(5.0, 6.0, (nq, ng)).astype(np.float32)
    # all four GTs strongly prefer queries 0..3, with distinct margins
    for g in range(ng):
        base[:ng, g] = 1.0 + 0.01 * np.arange(ng) + 0.1 * g
    cost = np.concatenate(
        [base, np.full((nq, n_pad), base.max() + 1.0, np.float32)], axis=1)
    got = np.asarray(matching.hungarian_auction(jnp.asarray(cost)))
    rows, cols = linear_sum_assignment(cost)
    exp = np.full(cost.shape[1], -1, np.int32)
    exp[cols] = rows
    real_exact = cost[exp[:ng], np.arange(ng)].sum()
    real_ours = cost[got[:ng], np.arange(ng)].sum()
    assert real_ours <= real_exact + 0.05, (real_ours, real_exact)


def test_build_detr_targets():
    matched = jnp.asarray([3, 7, 0, 5])
    valid = jnp.asarray([True, True, False, False])
    gt_labels = jnp.asarray([2, 9, 1, 1])
    gt_boxes = jnp.arange(4 * 9, dtype=jnp.float32).reshape(4, 9)
    labels, tgts, w = matching.build_detr_targets(
        matched, valid, gt_labels, gt_boxes, num_query=10, num_classes=17)
    labels = np.asarray(labels)
    assert labels[3] == 2 and labels[7] == 9
    assert (labels[[0, 5]] == 17).all()  # invalid gts ignored
    assert np.asarray(w)[[3, 7]].sum() == 2 and np.asarray(w).sum() == 2
    np.testing.assert_allclose(np.asarray(tgts)[3], np.arange(9))


def test_auction_rectangular_more_columns_than_rows():
    """max_gt > num_query (the tiny-config shape): the auction must
    terminate early via the transposed solve and match scipy's
    rectangular optimum on the assigned pairs — regression: the forward
    auction could never reach zero unassigned columns, burning the full
    iteration cap on EVERY call."""
    import time

    from scipy.optimize import linear_sum_assignment

    from vln_ver_tpu.matching import hungarian_auction

    rng = np.random.default_rng(3)
    nq, ng = 12, 32
    cost = rng.uniform(0, 10, (nq, ng)).astype(np.float32)
    out = np.asarray(hungarian_auction(jnp.asarray(cost)))
    assert out.shape == (ng,)
    assigned = np.nonzero(out >= 0)[0]
    assert len(assigned) == nq                      # every row used
    assert len(set(out[assigned])) == nq            # distinct rows
    got = float(cost[out[assigned], assigned].sum())
    r, c = linear_sum_assignment(cost)
    want = float(cost[r, c].sum())
    assert got <= want + 1e-2 * max(1.0, abs(want)), (got, want)
