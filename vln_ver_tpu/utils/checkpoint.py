"""Orbax checkpointing (params + optimizer state + step).

Replaces the reference's mmcv CheckpointHook/resume machinery
(vocc.py:293, apis/mmdet_train.py:196-199) with the same cadence semantics.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_state(ckpt_dir: str, step: int, state) -> str:
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    # fully materialise on host to keep checkpoints mesh-agnostic
    host_state = jax.tree.map(
        lambda x: jax.device_get(x) if hasattr(x, "addressable_data")
        or hasattr(x, "device") else x, state)
    _checkpointer().save(path, host_state, force=True)
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
             if d.startswith("step_")]
    return max(steps) if steps else None


def restore_state(ckpt_dir: str, step: int, target):
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    return _checkpointer().restore(path, item=target)
