"""Lightweight profiling helpers.

Replaces the reference's ``run_time`` decorator (models/utils/bricks.py:7-19
— cuda.synchronize + running-mean print) with device-honest equivalents:
``timer`` forces completion via a scalar fetch (the remote axon backend does
not block in block_until_ready), and ``trace`` wraps ``jax.profiler`` for
deep dives.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax
import numpy as np
import jax.numpy as jnp

_means: Dict[str, list] = defaultdict(lambda: [0.0, 0])


def force_completion(tree) -> float:
    """Reduce a pytree to a host float, forcing device completion."""
    total = 0.0
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "dtype"):
            total += float(jnp.sum(jnp.asarray(leaf, jnp.float32)))
    return total


@contextlib.contextmanager
def timer(name: str, result_tree=None, verbose: bool = True):
    """Time a block; if ``result_tree`` is a callable, it is invoked after
    the block to obtain the outputs whose completion to force."""
    t0 = time.perf_counter()
    yield
    if result_tree is not None:
        tree = result_tree() if callable(result_tree) else result_tree
        force_completion(tree)
    dt = time.perf_counter() - t0
    acc = _means[name]
    acc[0] += dt
    acc[1] += 1
    if verbose:
        print(f"[timer] {name}: {dt*1000:.1f} ms "
              f"(mean {acc[0]/acc[1]*1000:.1f} ms over {acc[1]})")


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def grad_report(grads, limit: int = 10) -> list:
    """Names of parameters with all-zero gradients — the reference's
    GradChecker hook semantics (models/hooks/hooks.py:5-12).

    ONE device fetch for the whole tree: a per-leaf ``bool(jnp.any(g))``
    would pay one dispatch + host round trip per parameter leaf —
    minutes for hundreds of leaves at the axon backend's tens-of-ms
    RTT."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    nonzero = np.asarray(jnp.stack(
        [jnp.any(jnp.asarray(g)) for _, g in flat]))
    zero = [jax.tree_util.keystr(k)
            for (k, _), nz in zip(flat, nonzero) if not bool(nz)]
    return zero[:limit]
