"""Orbax checkpointing (params + optimizer state + step).

Replaces the reference's mmcv CheckpointHook/resume machinery
(vocc.py:293, apis/mmdet_train.py:196-199) with the same cadence semantics.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def _to_host(state):
    """Fully materialise the state on host so checkpoints stay
    MESH-AGNOSTIC: a checkpoint written from a TP/multislice-sharded
    state restores onto any mesh shape (or none).

    Single-process arrays — replicated or sharded across local devices —
    are fully addressable and ``device_get`` assembles them.  On a
    multi-process mesh (jax.distributed) the global arrays are NOT fully
    addressable and ``device_get`` raises, so the global value is
    gathered with ``process_allgather`` instead (a collective: every
    process must reach save_state together, which the train loop's
    lockstep already guarantees)."""
    def get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            return multihost_utils.process_allgather(x, tiled=True)
        if hasattr(x, "addressable_data") or hasattr(x, "device"):
            return jax.device_get(x)
        return x

    return jax.tree.map(get, state)


def save_state(ckpt_dir: str, step: int, state) -> str:
    # Under jax.distributed every process holds the same gathered host
    # state and ALL must call save — orbax's Checkpointer syncs
    # internally ('Checkpointer:save_start') and writes replicated
    # numpy leaves from the primary process only, so this neither races
    # nor duplicates bytes.
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    _checkpointer().save(path, _to_host(state), force=True)
    return path


class AsyncSaver:
    """Non-blocking checkpoint writes (orbax ``AsyncCheckpointer``).

    The device→host snapshot still happens at ``save()`` time (the next
    train step mutates/donates the state buffers), but serialization and
    disk I/O overlap with subsequent steps instead of stalling the loop —
    at 208.8M fp32 params + AdamW moments a blocking save writes ~2.5 GB.
    The reference's mmcv ``CheckpointHook`` blocks training for the full
    write (apis/mmdet_train.py checkpoint_config cadence, vocc.py:293).

    ``wait()`` (or context-manager exit) must run before the process
    exits or a restore of the in-flight step is attempted.
    """

    def __init__(self):
        import orbax.checkpoint as ocp
        self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())

    def save(self, ckpt_dir: str, step: int, state) -> str:
        path = os.path.join(os.path.abspath(ckpt_dir),
                            f"step_{step:08d}")
        # _to_host is a collective under jax.distributed; orbax's own
        # multihost sync then coordinates the write (primary-only for
        # replicated numpy leaves) — see save_state.
        self._ckptr.save(path, _to_host(state), force=True)
        return path

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.wait()
        return False


_STEP_RE = re.compile(r"^step_(\d+)$")


def latest_step(ckpt_dir: str) -> Optional[int]:
    """Largest COMPLETED step in ``ckpt_dir``.

    Only exact ``step_NNNNNNNN`` names count: orbax writes in-flight (or
    crash-orphaned) checkpoints under ``step_*.orbax-checkpoint-tmp-*``
    sibling dirs — routine while an :class:`AsyncSaver` write overlaps
    training — and those must be skipped, not crash resume/export."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(m.group(1)) for d in os.listdir(ckpt_dir)
             if (m := _STEP_RE.match(d))]
    return max(steps) if steps else None


def restore_state(ckpt_dir: str, step: Optional[int], target):
    if step is None:
        # callers pass latest_step() straight in; an empty/missing ckpt
        # dir must be a clear error, not a NoneType format crash
        raise FileNotFoundError(
            f"no completed checkpoint (step_NNNNNNNN) under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    return _checkpointer().restore(path, item=target)
