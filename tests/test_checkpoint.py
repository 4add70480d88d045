import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_train_step import TINY, _init
from vln_ver_tpu.train import make_train_step
from vln_ver_tpu.utils.checkpoint import (AsyncSaver, latest_step,
                                          restore_state, save_state)


def test_checkpoint_roundtrip(tmp_path):
    _, state, batch, tc = _init()
    step = make_train_step(TINY, tc, donate=False)
    state, _ = step(state, batch, jax.random.PRNGKey(0))

    ckpt = str(tmp_path / "ckpt")
    save_state(ckpt, int(state.step), state)
    assert latest_step(ckpt) == 1

    _, fresh, _, _ = _init()
    restored = restore_state(ckpt, 1, fresh)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training continues from the restored state
    restored, metrics = step(restored, batch, jax.random.PRNGKey(1))
    assert int(restored.step) == 2
    assert np.isfinite(float(metrics["loss"]))


def test_async_checkpoint_matches_sync(tmp_path):
    """AsyncSaver writes the same restorable checkpoint as save_state,
    and the snapshot is taken at save() time — mutating the state
    afterwards (as the next train step does) must not corrupt it."""
    _, state, batch, tc = _init()
    step = make_train_step(TINY, tc, donate=False)
    state, _ = step(state, batch, jax.random.PRNGKey(0))

    sync_dir = str(tmp_path / "sync")
    async_dir = str(tmp_path / "async")
    save_state(sync_dir, 1, state)
    with AsyncSaver() as saver:
        saver.save(async_dir, 1, state)
        # advance training while the write is (potentially) in flight
        state, _ = step(state, batch, jax.random.PRNGKey(1))
    assert latest_step(async_dir) == 1

    _, fresh_a, _, _ = _init()
    _, fresh_b, _, _ = _init()
    ra = restore_state(async_dir, 1, fresh_a)
    rb = restore_state(sync_dir, 1, fresh_b)
    for a, b in zip(jax.tree.leaves(ra.params), jax.tree.leaves(rb.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ra.opt_state),
                    jax.tree.leaves(rb.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_step_skips_orbax_tmp_dirs(tmp_path):
    """An in-flight (or crash-orphaned) orbax tmp dir next to completed
    checkpoints — routine while an AsyncSaver write overlaps training —
    must be skipped, not crash resume/export with a ValueError."""
    d = tmp_path / "ckpt"
    d.mkdir()
    (d / "step_00000041").mkdir()
    (d / "step_00000042.orbax-checkpoint-tmp-1234").mkdir()
    (d / "step_42.orbax-checkpoint-tmp").mkdir()
    assert latest_step(str(d)) == 41
    (d / "step_00000042").mkdir()
    assert latest_step(str(d)) == 42


def test_bf16_train_step_finite():
    cfg = dataclasses.replace(TINY, dtype=jnp.bfloat16)
    _, state, batch, tc = _init(cfg)
    step = make_train_step(cfg, tc, donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # params remain fp32 master copies
    assert all(x.dtype == jnp.float32
               for x in jax.tree.leaves(state.params))
