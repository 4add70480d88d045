"""Hungarian assignment for DETR-style set matching.

Two interchangeable solvers over the same padded-cost contract:

* ``hungarian_host`` — exact ``scipy.optimize.linear_sum_assignment`` via
  ``jax.pure_callback`` (the reference moves the cost matrix to CPU and
  calls scipy per decoder layer — hungarian_assigner_3d.py:124-133; here
  the callback keeps the step jittable).  NOTE: the axon TPU PJRT backend
  does not support host callbacks, so this solver is CPU-only; it serves as
  the exactness oracle in tests.
* ``hungarian_auction`` — fully in-graph Jacobi auction algorithm
  (``lax.while_loop``) with a FIXED eps (spread-derived) and an
  iteration cap; eps-optimal on typical cost matrices, collective-free
  and TPU-native — the default matcher inside the pjit'd train step.
  (No eps-scaling phases: adversarially near-tied costs can hit the
  cap, in which case unconverged columns return -1 and are dropped by
  build_detr_targets — the scipy host solver is the exactness oracle.)

Contract: ``cost`` is ``(num_query, max_gt)`` with invalid (padded) GT
columns filled with a constant JUST ABOVE the real maximum (see
train/objective.py:_match_layer — the pad value does not change the real
assignment, but the auction's eps scales with the global cost spread, so
an astronomically large pad destroys its eps-optimality on the real
columns).  With ``num_query >= max_gt`` every GT column gets a distinct
query row; with FEWER queries than padded columns the auction solves the
transposed (rectangular) problem — ``num_query`` columns matched at
minimum cost, the rest returned unmatched (-1) — which still covers
every VALID GT as long as the real GT count is <= num_query.  The
caller masks out padded columns afterwards.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BIG_COST = 1e8


def _scipy_assign(cost: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment
    rows, cols = linear_sum_assignment(cost)
    out = np.full(cost.shape[1], -1, dtype=np.int32)
    out[cols] = rows.astype(np.int32)
    return out


def hungarian_host(cost: jnp.ndarray) -> jnp.ndarray:
    """(num_query, max_gt) cost -> (max_gt,) matched query index per GT."""
    out_shape = jax.ShapeDtypeStruct((cost.shape[1],), jnp.int32)
    return jax.pure_callback(
        _scipy_assign, out_shape, cost.astype(jnp.float32),
        vmap_method="sequential")


@partial(jax.jit, static_argnames=("num_iters",))
def hungarian_auction(cost: jnp.ndarray, num_iters: int = 500,
                      eps_scale: float = 1e-3) -> jnp.ndarray:
    """In-graph Jacobi auction assignment (minimisation).

    GT columns are "persons" bidding for query rows ("objects").  With eps
    below the smallest meaningful cost gap the result matches the exact
    optimum; ties may resolve differently (same total cost).
    """
    nq, ng = cost.shape
    if ng > nq:
        # MORE columns than rows (e.g. tiny configs where max_gt >
        # num_query): a perfect column matching is impossible, so the
        # forward auction would never terminate (the ng - nq poorest
        # columns bid forever — previously this burned the full
        # iteration cap on EVERY call).  Solve the transposed problem —
        # rows bid for columns, perfect matching exists, standard
        # termination is eps-optimal — and convert back.
        col_of_row = hungarian_auction(cost.T, num_iters=num_iters,
                                       eps_scale=eps_scale)      # (nq,)
        rows_idx = jnp.arange(nq, dtype=jnp.int32)
        return jnp.full((ng,), -1, jnp.int32).at[
            jnp.where(col_of_row >= 0, col_of_row, ng)].set(
                rows_idx, mode="drop")
    value = -cost.astype(jnp.float32).T          # (ng, nq), maximise
    spread = jnp.maximum(jnp.max(value) - jnp.min(value), 1.0)
    eps = spread * eps_scale / (ng + 1)

    def body(state):
        it, _, prices, owner_of_row, row_of_col = state
        unassigned = row_of_col < 0                       # (ng,)
        net = value - prices[None, :]                     # (ng, nq)
        best = jnp.argmax(net, axis=1)                    # (ng,)
        w1 = jnp.max(net, axis=1)
        net2 = net.at[jnp.arange(ng), best].set(-jnp.inf)
        w2 = jnp.max(net2, axis=1)
        bid = prices[best] + (w1 - w2) + eps              # (ng,)
        bid = jnp.where(unassigned, bid, -jnp.inf)
        # per-row winner among bidders
        bids_mat = jnp.full((ng, nq), -jnp.inf).at[
            jnp.arange(ng), best].set(bid)
        row_best_bid = jnp.max(bids_mat, axis=0)          # (nq,)
        row_winner = jnp.argmax(bids_mat, axis=0)
        got_bid = jnp.isfinite(row_best_bid)
        # update prices
        prices = jnp.where(got_bid, row_best_bid, prices)
        # evict previous owners of rows that changed hands
        prev_owner = jnp.where(got_bid, owner_of_row, -1)
        evict = (prev_owner >= 0)
        row_of_col = row_of_col.at[jnp.where(evict, prev_owner, ng)].set(
            -1, mode="drop")
        owner_of_row = jnp.where(got_bid, row_winner, owner_of_row)
        # assign winners
        rows_idx = jnp.arange(nq)
        row_of_col = row_of_col.at[
            jnp.where(got_bid, row_winner, ng)].set(
                jnp.where(got_bid, rows_idx, -1), mode="drop")
        n_unassigned = jnp.sum(row_of_col < 0)
        return it + 1, n_unassigned, prices, owner_of_row, row_of_col

    def cond(state):
        # true early exit (typical convergence is tens of iterations; the
        # cap is a safety net) — integer outputs, nothing differentiates
        # through this loop.  ng <= nq holds here (the ng > nq case is
        # transposed above), so zero-unassigned is always reachable.
        return (state[1] > 0) & (state[0] < num_iters)

    init = (jnp.asarray(0), jnp.asarray(ng), jnp.zeros(nq),
            jnp.full(nq, -1, jnp.int32), jnp.full(ng, -1, jnp.int32))
    state = jax.lax.while_loop(cond, body, init)
    return state[4]


def build_detr_targets(matched_rows: jnp.ndarray,
                       gt_valid: jnp.ndarray,
                       gt_labels: jnp.ndarray,
                       gt_boxes: jnp.ndarray,
                       num_query: int,
                       num_classes: int):
    """Scatter matched GT into per-query targets.

    Args:
      matched_rows: (max_gt,) query index per GT (from a solver).
      gt_valid: (max_gt,) bool.
      gt_labels: (max_gt,) int.
      gt_boxes: (max_gt, D) target boxes (gravity frame, unnormalised).

    Returns:
      labels (num_query,) with ``num_classes`` for background,
      bbox_targets (num_query, D),
      bbox_weights (num_query,) 1.0 at matched queries.
    """
    # OOB -> dropped; also map negative rows (non-converged auction, the
    # iteration cap hit with columns still unassigned) out of bounds —
    # otherwise -1 wraps to query num_query-1 under mode="drop" and a GT is
    # silently assigned to the last query.
    rows = jnp.where(gt_valid & (matched_rows >= 0), matched_rows,
                     num_query)
    labels = jnp.full((num_query,), num_classes, jnp.int32)
    labels = labels.at[rows].set(gt_labels.astype(jnp.int32), mode="drop")
    d = gt_boxes.shape[-1]
    bbox_targets = jnp.zeros((num_query, d), gt_boxes.dtype)
    bbox_targets = bbox_targets.at[rows].set(gt_boxes, mode="drop")
    bbox_weights = jnp.zeros((num_query,), jnp.float32)
    bbox_weights = bbox_weights.at[rows].set(1.0, mode="drop")
    return labels, bbox_targets, bbox_weights
