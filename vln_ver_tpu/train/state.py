"""Optimizer / schedule / train-state construction.

Recipe parity with the reference (vocc.py:261-293): AdamW lr 1e-4,
weight-decay 0.01, linear warmup (ratio 1/3) for ``warmup_steps``, cosine
annealing to ``lr * min_lr_ratio`` (1e-3), global-norm gradient clip 300.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    warmup_steps: int = 1000
    total_steps: int = 100_000
    warmup_ratio: float = 1.0 / 3.0
    min_lr_ratio: float = 1e-3
    grad_clip_norm: float = 300.0
    matcher: str = "auction"   # 'auction' (in-graph) | 'host' (scipy)


def make_lr_schedule(tc: TrainConfig) -> optax.Schedule:
    warmup = optax.linear_schedule(
        init_value=tc.learning_rate * tc.warmup_ratio,
        end_value=tc.learning_rate,
        transition_steps=max(tc.warmup_steps, 1))
    cosine = optax.cosine_decay_schedule(
        init_value=tc.learning_rate,
        decay_steps=max(tc.total_steps - tc.warmup_steps, 1),
        alpha=tc.min_lr_ratio)
    return optax.join_schedules([warmup, cosine], [tc.warmup_steps])


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip_norm),
        optax.adamw(make_lr_schedule(tc), b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=tc.weight_decay),
    )


class TrainState(train_state.TrainState):
    pass


def create_train_state(model: Any, params, tc: TrainConfig) -> TrainState:
    return TrainState.create(apply_fn=model.apply, params=params,
                             tx=make_optimizer(tc))


def param_count(params) -> int:
    return int(sum(jnp.size(x) for x in jax.tree.leaves(params)))
