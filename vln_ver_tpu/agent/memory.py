"""Episodic memory: a fixed-capacity topological node bank.

DUET-style global map, static-shaped for jit: up to ``max_nodes`` visited /
frontier viewpoints, each with a pooled VER feature, a world position, and
status flags.  Updates are pure functions producing a new memory pytree, so
rollouts scan over steps inside one compiled program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class EpisodicMemory(NamedTuple):
    features: jnp.ndarray   # (B, max_nodes, C) pooled VER feature per node
    positions: jnp.ndarray  # (B, max_nodes, 3)
    valid: jnp.ndarray      # (B, max_nodes) bool — node exists
    visited: jnp.ndarray    # (B, max_nodes) bool — agent has stood here
    count: jnp.ndarray      # (B,) int32 number of valid nodes


def init_memory(batch: int, max_nodes: int, embed_dims: int) -> EpisodicMemory:
    return EpisodicMemory(
        features=jnp.zeros((batch, max_nodes, embed_dims)),
        positions=jnp.zeros((batch, max_nodes, 3)),
        valid=jnp.zeros((batch, max_nodes), bool),
        visited=jnp.zeros((batch, max_nodes), bool),
        count=jnp.zeros((batch,), jnp.int32),
    )


def memory_from_arrays(rows, host: bool = False) -> EpisodicMemory:
    """Build a batched memory from per-episode host arrays
    (``env.memory_arrays`` dicts) — the canonical rollout path: one host
    build + one transfer per step, correct under env slot recycling
    (see R2REnv.memory_arrays).  ``update_memory`` below remains the
    incremental in-graph primitive.

    ``host=True`` keeps numpy leaves (no device transfer) — for trace
    recording, where fetching the just-uploaded struct back with
    ``device_get`` would cost a pointless round trip per step."""
    import numpy as np
    conv = (lambda x: x) if host else jnp.asarray
    valid = np.stack([r["valid"] for r in rows])
    return EpisodicMemory(
        features=conv(np.stack([r["features"] for r in rows])),
        positions=conv(np.stack([r["positions"] for r in rows])),
        valid=conv(valid),
        visited=conv(np.stack([r["visited"] for r in rows])),
        count=conv(valid.sum(-1).astype(np.int32)),
    )


def update_memory(mem: EpisodicMemory,
                  node_idx: jnp.ndarray,
                  feature: jnp.ndarray,
                  position: jnp.ndarray,
                  mark_visited: jnp.ndarray,
                  write_mask: jnp.ndarray | None = None) -> EpisodicMemory:
    """Write/refresh one node per batch element.

    node_idx (B,) int32 slot; feature (B, C); position (B, 3);
    mark_visited (B,) bool.  Slots are environment-assigned (stable per
    viewpoint id) so revisits refresh features instead of duplicating.
    ``write_mask`` (B,) bool makes rows with False a no-op — used by
    lockstep batched rollouts where episodes register different node
    counts per step.
    """
    b = jnp.arange(mem.features.shape[0])
    wm = (jnp.ones((mem.features.shape[0],), bool)
          if write_mask is None else write_mask)
    feats = mem.features.at[b, node_idx].set(jnp.where(
        wm[:, None], feature.astype(mem.features.dtype),
        mem.features[b, node_idx]))
    pos = mem.positions.at[b, node_idx].set(jnp.where(
        wm[:, None], position.astype(mem.positions.dtype),
        mem.positions[b, node_idx]))
    newly = ~mem.valid[b, node_idx] & wm
    valid = mem.valid.at[b, node_idx].set(mem.valid[b, node_idx] | wm)
    visited = mem.visited.at[b, node_idx].set(
        mem.visited[b, node_idx] | (mark_visited & wm))
    count = mem.count + newly.astype(jnp.int32)
    return EpisodicMemory(feats, pos, valid, visited, count)
