"""Data-parallel agent updates (agent/parallel.py) vs single-device.

The agent trainers' --mesh flag replicates params and shards the stacked
decision-step batch over a 1-axis 'data' mesh (the DDP recipe the
reference applies to training, apis/mmdet_train.py:76-86).  Both agent
objectives are global means/sums over the batch axis, so the sharded
step must be MATH-IDENTICAL — including the MLM random masking, which
JAX's partitionable threefry generates identically for a sharded shape.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vln_ver_tpu.agent.memory import init_memory
from vln_ver_tpu.agent.parallel import (make_agent_mesh, replicate_agent,
                                        shard_agent_batch)
from vln_ver_tpu.agent.policy import PolicyConfig, VLNPolicy
from vln_ver_tpu.agent.pretrain import (VLNPretrainModel, mask_tokens,
                                        pretrain_loss)
from vln_ver_tpu.agent.rollout import imitation_step_loss

PCFG = PolicyConfig(embed_dims=32, num_heads=4, fusion_layers=1,
                    text_layers=1, ffn_dim=64, vocab_size=50,
                    max_text_len=10, max_nodes=4, bev_z=2, bev_h=3,
                    bev_w=3, num_query_tokens=2, dropout_rate=0.0)


def _batch(bsz=8, seed=0):
    rng = np.random.default_rng(seed)
    nvox = PCFG.bev_z * PCFG.bev_h * PCFG.bev_w
    instr = rng.integers(2, PCFG.vocab_size,
                         (bsz, PCFG.max_text_len)).astype(np.int32)
    instr[:, -3:] = 0   # pad tail
    return dict(
        instruction=jnp.asarray(instr),
        volume=jnp.asarray(rng.standard_normal(
            (bsz, nvox, PCFG.embed_dims)).astype(np.float32)),
        memory=init_memory(bsz, PCFG.max_nodes, PCFG.embed_dims),
        cur_pos=jnp.asarray(rng.standard_normal(
            (bsz, 3)).astype(np.float32)),
        cur_slot=jnp.zeros((bsz,), jnp.int32),
        # teacher = STOP (always valid): memory starts empty, so node
        # actions are -1e9-masked and a random teacher would park the SAP
        # loss at ~1e9, drowning the real signal the parity check is for
        teacher=jnp.zeros((bsz,), jnp.int32))


needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 cpu devices")


@needs8
def test_pretrain_update_mesh_parity():
    model = VLNPretrainModel(PCFG)
    batch = _batch()
    masked, targets, sel = mask_tokens(jax.random.PRNGKey(0),
                                       batch["instruction"],
                                       PCFG.vocab_size)
    params = model.init(jax.random.PRNGKey(0), batch, masked, targets,
                        sel, deterministic=True)
    tx = optax.chain(optax.clip_by_global_norm(40.0), optax.adamw(1e-4))

    @jax.jit
    def update(params, opt_state, batch, key):
        def loss_fn(p):
            return pretrain_loss(model, p, batch, key, mask_id=1)
        (loss, parts), grads = jax.value_and_grad(loss_fn,
                                                  has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss, parts

    key = jax.random.PRNGKey(7)
    p1, l1, parts1 = update(params, tx.init(params), batch, key)

    mesh = make_agent_mesh(8)
    p2, l2, parts2 = update(replicate_agent(mesh, params),
                            tx.init(replicate_agent(mesh, params)),
                            shard_agent_batch(mesh, batch), key)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    for k in parts1:
        np.testing.assert_allclose(float(parts2[k]), float(parts1[k]),
                                   rtol=1e-6, err_msg=k)
    # Attention key biases are softmax-invariant (q.(k+b) adds the same
    # constant to every logit), so their TRUE gradient is exactly zero;
    # what autodiff produces is cancellation roundoff whose bit pattern
    # depends on the psum order, and AdamW normalizes that noise to an
    # O(lr) step.  Compare every other leaf strictly; for key biases
    # assert the post-update drift stays at the lr-noise floor.
    f1 = jax.tree_util.tree_flatten_with_path(p1)[0]
    f2 = jax.tree.leaves(p2)
    for (path, a), b in zip(f1, f2):
        name = jax.tree_util.keystr(path)
        a, b = np.asarray(a), np.asarray(b)
        if name.endswith("['key']['bias']"):
            np.testing.assert_allclose(b, a, atol=3e-4, err_msg=name)
        else:
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-7,
                                       err_msg=name)


@needs8
def test_imitation_loss_mesh_parity():
    policy = VLNPolicy(PCFG)
    batch = _batch(seed=3)
    params = policy.init(
        jax.random.PRNGKey(0), batch["instruction"],
        batch["instruction"] > 0, batch["volume"], batch["memory"],
        batch["cur_pos"], batch["cur_slot"])

    f = jax.jit(lambda p, b: imitation_step_loss(policy, p, b)[0])
    l1 = float(f(params, batch))
    mesh = make_agent_mesh(8)
    l2 = float(f(replicate_agent(mesh, params),
                 shard_agent_batch(mesh, batch)))
    np.testing.assert_allclose(l2, l1, rtol=1e-6)


@needs8
def test_shard_rejects_indivisible_batch():
    mesh = make_agent_mesh(8)
    with pytest.raises(ValueError, match="not divisible"):
        shard_agent_batch(mesh, _batch(bsz=6))
