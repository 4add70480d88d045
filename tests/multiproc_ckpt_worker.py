"""Worker for tests/test_multiprocess_ckpt.py.

One of 2 ``jax.distributed`` CPU processes (4 local virtual devices each)
holding a TP-sharded train state over the JOINT 8-device (data, view,
model) mesh — the leaves are global jax.Arrays that are NOT fully
addressable, the exact case where a bare ``device_get`` in checkpoint
save raises.  Saves via utils.checkpoint (process_allgather + one-writer
+ barrier), restores, and asserts the round trip preserves every leaf;
then re-shards the restored state onto a DIFFERENT mesh shape and runs a
step (resume-on-new-topology, the semantics of vocc.py:293 resume).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_LOCAL = 4


def main(ckpt_dir: str) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={N_LOCAL}")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from vln_ver_tpu.parallel.multihost import initialize_if_needed
    initialize_if_needed()
    assert jax.device_count() == 2 * N_LOCAL, jax.device_count()

    import numpy as np

    from tests.multiproc_train_worker import build_setup, MESH_SHAPE
    from vln_ver_tpu.parallel import make_tp_mesh, shard_batch
    from vln_ver_tpu.parallel.tensor import shard_state, tp_fraction
    from vln_ver_tpu.train import (TrainConfig, create_train_state,
                                   make_train_step)
    from vln_ver_tpu.utils.checkpoint import (latest_step, restore_state,
                                              save_state)

    cfg, model, params, batches = build_setup()
    tc = TrainConfig(warmup_steps=1, total_steps=10)
    state = create_train_state(model, params, tc)

    # TP over the joint mesh: (data=2, view=2, model=2) -> leaves are
    # global jax.Arrays spanning both processes (non-fully-addressable)
    mesh = make_tp_mesh(2, 2, view=2)
    sharded = shard_state(mesh, state, min_size=1 << 8)
    assert tp_fraction(sharded.params, mesh) > 0.5
    leaf = jax.tree.leaves(sharded.params)[0]
    assert not leaf.is_fully_addressable, "test must cover the hard case"

    save_state(ckpt_dir, 0, sharded)
    assert latest_step(ckpt_dir) == 0

    fresh = create_train_state(model, params, tc)
    restored = restore_state(ckpt_dir, 0, fresh)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resume on a DIFFERENT mesh: plain (data, view) DP, no model axis
    from vln_ver_tpu.parallel import make_mesh, replicate
    mesh2 = make_mesh(MESH_SHAPE)
    step = make_train_step(cfg, tc, donate=False)
    with mesh2:
        resumed, metrics = step(replicate(mesh2, restored),
                                shard_batch(mesh2, batches[0]),
                                jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"])), metrics
    assert int(resumed.step) == 1
    print(f"proc {jax.process_index()}: ckpt roundtrip ok "
          f"loss={float(metrics['loss']):.4f}")


if __name__ == "__main__":
    main(sys.argv[1])
