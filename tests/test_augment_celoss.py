import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from vln_ver_tpu import losses
from vln_ver_tpu.augment import grid_mask_features


def test_softmax_ce_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((50, 17)).astype(np.float32)
    labels = rng.integers(0, 17, 50)
    got = float(losses.softmax_ce_loss(jnp.asarray(logits),
                                       jnp.asarray(labels),
                                       avg_factor=jnp.asarray(10.0)))
    exp = float(F.cross_entropy(torch.from_numpy(logits),
                                torch.from_numpy(labels),
                                reduction="sum")) / 10.0
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_ce_loss_objective_variant():
    from tests.test_train_step import TINY, _init
    cfg = dataclasses.replace(TINY, occ_loss_type="ce_loss")
    # note: with ce_loss the head still emits occupancy_classes channels;
    # the empty label is clamped to the last channel (reference decode
    # treats channel C-1 as empty)
    from vln_ver_tpu.train import compute_losses
    model, state, batch, _ = _init(cfg)
    outs = model.apply(state.params, batch["features"],
                       batch["world2pixel"], batch["origin_shift"])
    ld = compute_losses(cfg, outs, batch)
    assert np.isfinite(float(ld["loss_occupancy"]))


def test_grid_mask_zeroes_patches():
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((4, 2, 14, 14, 8)),
                        jnp.float32)
    out = grid_mask_features(jax.random.PRNGKey(0), feats, prob=1.0)
    out = np.asarray(out)
    # some patches zeroed, all cams/channels of a zeroed patch zeroed
    zero_patches = (np.abs(out).sum(axis=(1, 4)) == 0)
    assert zero_patches.any()
    assert not zero_patches.all()
    # with prob=0 nothing changes
    out0 = grid_mask_features(jax.random.PRNGKey(0), feats, prob=0.0)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(feats))
