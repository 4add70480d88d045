"""Multi-host utilities.

Replaces the reference's NCCL/dist machinery: ``jax.distributed`` for
process bring-up (vs torch.distributed.launch, tools/dist_train.sh) and
``multihost_utils.process_allgather`` for eval-result collection (vs the
pickle-file + dist.barrier dance in apis/test.py:202-246).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import numpy as np


def initialize_if_needed() -> None:
    """Bring up jax.distributed when launched under a multi-process
    coordinator (no-op single-process)."""
    import os
    if os.environ.get("JAX_COORDINATOR_ADDRESS") and \
            jax.process_count() == 1:
        jax.distributed.initialize()


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def shard_indices(n: int) -> range:
    """Contiguous block split per process — the reference's deterministic
    eval sampler semantics (samplers/distributed_sampler.py:36-39)."""
    per = -(-n // jax.process_count())
    lo = jax.process_index() * per
    return range(lo, min(lo + per, n))


def allgather_results(local: Sequence[np.ndarray]) -> List[np.ndarray]:
    """Gather per-process result lists to every host.  Single-process:
    identity.  Multi-process: pads to a common count and allgathers via
    multihost_utils (DCN), replacing the tmpdir-pickle collection."""
    if jax.process_count() == 1:
        return list(local)
    from jax.experimental import multihost_utils
    stacked = np.stack(local)
    gathered = multihost_utils.process_allgather(stacked)
    return [g for proc in gathered for g in proc]
