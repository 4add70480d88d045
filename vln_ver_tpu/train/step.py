"""Jitted train / eval steps.

One XLA program per mode (SURVEY.md §7 design stance): ``make_train_step``
returns a function (state, batch, rng) -> (state, metrics) that runs
forward + losses + backward + AdamW update in a single compilation; under a
mesh the same function pjit-shards over the batch axis (see
vln_ver_tpu.parallel).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..models.config import VERConfig
from .objective import compute_losses
from .state import TrainConfig, TrainState


def make_train_step(cfg: VERConfig, tc: TrainConfig,
                    donate: bool = True,
                    out_sharding=None) -> Callable:
    """``out_sharding`` (a ``jax.sharding.Sharding``) pins every output
    leaf — the updated state and the metrics — to one sharding.  Without
    it GSPMD may shard some optimizer-moment outputs differently from the
    (replicated) inputs, so the step's signature changes after the first
    call: plain jit silently recompiles once, but an AOT-compiled
    executable (``.lower().compile()``, used by the multi-process tests
    to control the Gloo rendezvous) rejects the call.  Pass the state's
    intended sharding (e.g. replicated) to keep the signature stable."""
    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        def loss_fn(params):
            outs = state.apply_fn(
                params, batch["features"], batch["world2pixel"],
                batch["origin_shift"], deterministic=False,
                rngs={"dropout": rng})
            loss_dict = compute_losses(cfg, outs, batch, matcher=tc.matcher)
            total = sum(loss_dict.values())
            return total, (loss_dict, outs["sca_overflow"])

        (total, (loss_dict, overflow)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics = dict(loss_dict)
        metrics["loss"] = total
        metrics["grad_norm"] = optax_global_norm(grads)
        # in-graph guard on the capacity-bounded sparse lift: visible
        # queries beyond sca_query_capacity in the worst (batch, camera)
        # slot — nonzero means dropped contributions (the reference's
        # rebatch never drops); tools/train.py fails fast on it
        metrics["sca_overflow"] = overflow
        return new_state, metrics

    kw = {}
    if out_sharding is not None:
        kw["out_shardings"] = (out_sharding, out_sharding)
    return jax.jit(train_step, donate_argnums=(0,) if donate else (),
                   **kw)


def optax_global_norm(tree) -> jnp.ndarray:
    # thin alias so the metric and the clip transform share optax's
    # definition of the global norm
    import optax
    return optax.global_norm(tree)
