"""Optimizer / schedule / train-state construction.

Recipe parity with the reference (vocc.py:261-293): AdamW lr 1e-4,
weight-decay 0.01, linear warmup (ratio 1/3) for ``warmup_steps``, cosine
annealing to ``lr * min_lr_ratio`` (1e-3), global-norm gradient clip 300.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

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
    # mmcv lr hooks with by_epoch=True (the reference's default) anneal
    # the cosine in EPOCH-granular steps; 0 keeps a smooth per-iter
    # anneal (mmcv by_epoch=False)
    steps_per_epoch: int = 0
    matcher: str = "auction"   # 'auction' (in-graph) | 'host' (scipy)
    # single-pass clip+AdamW (identical math to the optax chain, proven
    # bit-exact in tests/test_fused_opt.py).  Measured on chip at 208M
    # params (tools/probe_opt.py): optax chain 11.75 ms, fused 11.68 ms —
    # XLA already fuses the staged optax transforms to the HBM floor, so
    # this stays OFF by default (keeps the optax opt-state structure for
    # checkpoints); the option remains for structure-simplified states.
    fused_opt: bool = False


def make_lr_schedule(tc: TrainConfig) -> optax.Schedule:
    """mmcv CosineAnnealingLrUpdaterHook + linear warmup, exactly:

    * the cosine anneals over ALL ``total_steps`` (warmup included), in
      epoch-granular progress when ``steps_per_epoch`` is set (mmcv
      ``by_epoch=True``, the reference's default — lr is constant within
      an epoch);
    * warmup multiplies the CURRENT annealed lr:
      ``lr = regular(t) * (1 - (1 - t/warmup)*(1 - warmup_ratio))``
      (mmcv ``get_warmup_lr``), i.e. it warms toward the already-annealed
      value, not toward the peak.

    (The previous optax ``join_schedules(linear, cosine_decay)`` warmed
    to the full peak and annealed over only the remaining steps — ~1%
    high at warmup end and up to ~10% high mid-run vs vocc.py:272-280.)
    """
    base = tc.learning_rate
    min_lr = base * tc.min_lr_ratio
    warm = max(tc.warmup_steps, 1)
    spe = tc.steps_per_epoch
    total = max(tc.total_steps, 1)

    def sched(step):
        t = jnp.asarray(step, jnp.float32)
        prog = (jnp.floor(t / spe) * spe / total) if spe > 0 else t / total
        # clamp: stepping past total_steps (--max-steps overriding the
        # config, or a long resume) must hold lr at min_lr, not anneal
        # back up the cosine (mmcv never evaluates past max progress)
        prog = jnp.minimum(prog, 1.0)
        # mmcv annealing_cos(start=base, end=min_lr, factor=prog)
        regular = min_lr + 0.5 * (base - min_lr) * (
            jnp.cos(jnp.pi * prog) + 1.0)
        k = (1.0 - t / warm) * (1.0 - tc.warmup_ratio)
        return jnp.where(t < tc.warmup_steps, regular * (1.0 - k),
                         regular)

    return sched


class FusedClipAdamWState(NamedTuple):
    count: Any
    mu: Any
    nu: Any


def make_fused_clip_adamw(tc: TrainConfig) -> optax.GradientTransformation:
    """``chain(clip_by_global_norm, adamw(schedule, wd))`` in ONE per-leaf
    pass.

    The optax chain runs clip -> scale_by_adam -> add_decayed_weights ->
    scale_by_learning_rate as separate tree_maps whose intermediates XLA
    materializes in HBM; on 208.8M fp32 params that costs ~3x the
    read-g,m,v,p / write-m,v,u floor.  This computes the identical update
    (same clip trigger, bias correction, decay and sign conventions —
    bit-checked against the chain in tests/test_fused_opt.py) inside one
    ``jax.tree.map`` so XLA fuses each leaf into a single HBM pass.
    """
    sched = make_lr_schedule(tc)
    b1, b2, eps = 0.9, 0.999, 1e-8
    wd, clip = tc.weight_decay, tc.grad_clip_norm

    def init(params):
        return FusedClipAdamWState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        assert params is not None, "fused adamw needs params (weight decay)"
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(x))
                             for x in jax.tree.leaves(grads)))
        # optax.clip_by_global_norm: g * clip / maximum(gnorm, clip)
        scale = clip / jnp.maximum(gnorm, clip)
        count_inc = optax.safe_int32_increment(state.count)
        lr = sched(state.count)
        bc1 = 1 - b1 ** count_inc.astype(jnp.float32)
        bc2 = 1 - b2 ** count_inc.astype(jnp.float32)

        def leaf(g, mu, nu, p):
            g = g * scale
            mu2 = b1 * mu + (1 - b1) * g
            nu2 = b2 * nu + (1 - b2) * jnp.square(g)
            upd = (mu2 / bc1) / (jnp.sqrt(nu2 / bc2) + eps) + wd * p
            return mu2, nu2, (-lr * upd).astype(p.dtype)

        out = jax.tree.map(leaf, grads, state.mu, state.nu, params)
        is3 = lambda t: isinstance(t, tuple) and len(t) == 3  # noqa: E731
        mu2 = jax.tree.map(lambda t: t[0], out, is_leaf=is3)
        nu2 = jax.tree.map(lambda t: t[1], out, is_leaf=is3)
        updates = jax.tree.map(lambda t: t[2], out, is_leaf=is3)
        return updates, FusedClipAdamWState(count_inc, mu2, nu2)

    return optax.GradientTransformation(init, update)


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    if tc.fused_opt:
        return make_fused_clip_adamw(tc)
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
