"""Multi-host utilities.

Replaces the reference's NCCL/dist machinery: ``jax.distributed`` for
process bring-up (vs torch.distributed.launch, tools/dist_train.sh),
contiguous block sharding for eval splits (vs
samplers/distributed_sampler.py:36-39) and
``multihost_utils.process_allgather`` for eval-result collection (vs the
tmpdir-pickle + dist.barrier dance in apis/test.py:202-246).

Bring-up contract: set ``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``
and ``JAX_PROCESS_ID`` in each process's environment and call
``initialize_if_needed()`` BEFORE any other jax use (all CLI tools do).
Single-process runs (no coordinator env) are a no-op.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

_initialized = False


def initialize_if_needed() -> None:
    """Bring up jax.distributed when launched under a multi-process
    coordinator (env-driven; must run before first device use)."""
    global _initialized
    if _initialized:
        return
    _initialized = True
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    import jax
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_ID"]))


def process_index() -> int:
    import jax
    return jax.process_index()


def process_count() -> int:
    import jax
    return jax.process_count()


def shard_indices(n: int) -> range:
    """Contiguous block split per process — the reference's deterministic
    eval sampler semantics (samplers/distributed_sampler.py:36-39).  The
    last process gets the (possibly shorter) tail."""
    per = -(-n // process_count())
    lo = min(process_index() * per, n)
    return range(lo, min(lo + per, n))


def shard_size(n: int) -> int:
    """Max per-process shard size for ``shard_indices(n)`` (the padding
    target for ``allgather_results``)."""
    return -(-n // process_count())


def allgather_results(local: np.ndarray, per: int) -> List[np.ndarray]:
    """Gather per-process result arrays to every host.

    Args:
      local: ``(k, ...)`` array of this process's results (``k`` may be 0
        and differ per process, ``k <= per``); the trailing shape must be
        identical everywhere.
      per: common padding target (``shard_size(n)``).

    Returns the concatenated rows of every process in (process, index)
    order with padding removed — so the result is index-aligned with the
    unsharded dataset when shards came from ``shard_indices``.
    Single-process: identity.
    """
    local = np.asarray(local)
    if process_count() == 1:
        return [local[i] for i in range(len(local))]
    if len(local) > per:
        raise ValueError(f"local count {len(local)} exceeds pad target "
                         f"{per}")
    from jax.experimental import multihost_utils
    padded = np.zeros((per,) + local.shape[1:], local.dtype)
    padded[:len(local)] = local
    counts = multihost_utils.process_allgather(
        np.asarray(len(local), np.int32))
    gathered = multihost_utils.process_allgather(padded)
    return [np.asarray(gathered[p][i])
            for p in range(process_count())
            for i in range(int(counts[p]))]


def allreduce_sum(array: np.ndarray) -> np.ndarray:
    """Sum a fixed-shape host array over processes (metric histograms)."""
    if process_count() == 1:
        return np.asarray(array)
    from jax.experimental import multihost_utils
    return np.asarray(
        multihost_utils.process_allgather(np.asarray(array))).sum(axis=0)
