"""Train-step tests: loss computation, gradient flow, toy overfit, and
multi-device sharding on the virtual CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_ver_tpu import geometry
from vln_ver_tpu.models import VERConfig, VoxelFormer
from vln_ver_tpu.parallel import make_mesh, replicate, shard_batch
from vln_ver_tpu.train import (TrainConfig, compute_losses,
                               create_train_state, make_train_step)

TINY = VERConfig(
    bev_z=2, bev_h=4, bev_w=4,
    occupancy_size=(1.5, 1.5, 0.4375),
    num_cams=2, feat_h=4, feat_w=4, in_channels=32,
    embed_dims=32, num_heads=4, encoder_layers=1, decoder_layers=2,
    ffn_dim=64, num_query=12, num_layout_query=3, occ_dims=16,
)
MAX_GT = 5


def _toy_batch(b=2, cfg=TINY, seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal(
        (b, cfg.num_cams, cfg.feat_h, cfg.feat_w, cfg.in_channels)
    ).astype(np.float32)
    w2p = np.stack([
        np.stack([
            geometry.make_pinhole_world2pixel(
                90.0, (360 / cfg.num_cams) * i, (0, 0, 0))
            for i in range(cfg.num_cams)]) for _ in range(b)])
    gt_boxes = np.zeros((b, MAX_GT, 9), np.float32)
    gt_boxes[:, :, 3:6] = 1.0
    gt_boxes[:, :2, 0] = rng.uniform(-3, 3, (b, 2))
    gt_boxes[:, :2, 1] = rng.uniform(-3, 3, (b, 2))
    gt_valid = np.zeros((b, MAX_GT), bool)
    gt_valid[:, :2] = True
    occ = rng.integers(0, cfg.occupancy_classes + 1,
                       (b, cfg.voxel_num)).astype(np.int32)
    return {
        "features": feats,
        "world2pixel": w2p.astype(np.float32),
        "origin_shift": np.zeros((b, 3), np.float32),
        "gt_boxes": gt_boxes,
        "gt_labels": rng.integers(0, cfg.num_classes,
                                  (b, MAX_GT)).astype(np.int32),
        "gt_valid": gt_valid,
        "gt_layout": np.tile(
            np.asarray([0, 0, 0, 8, 8, 3, 0, 0, 0], np.float32),
            (b, 1, 1)),
        "layout_valid": np.ones((b, 1), bool),
        "occ_dense": occ,
    }


def _init(cfg=TINY, tc=None):
    model = VoxelFormer(cfg)
    batch = _toy_batch(cfg=cfg)
    params = model.init(jax.random.PRNGKey(0), batch["features"],
                        batch["world2pixel"], batch["origin_shift"])
    tc = tc or TrainConfig(warmup_steps=2, total_steps=50)
    state = create_train_state(model, params, tc)
    return model, state, batch, tc


def test_loss_keys_and_finiteness():
    model, state, batch, _ = _init()
    outs = model.apply(state.params, batch["features"],
                       batch["world2pixel"], batch["origin_shift"])
    losses = compute_losses(TINY, outs, batch)
    expect = {"loss_cls", "loss_bbox", "loss_occupancy", "loss_flow",
              "d0.loss_cls", "d0.loss_bbox"}
    assert expect <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_train_step_decreases_loss():
    _, state, batch, tc = _init()
    step = make_train_step(TINY, tc, donate=False)
    rng = jax.random.PRNGKey(0)
    first = None
    last = None
    for i in range(12):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
        if first is None:
            first = float(metrics["loss"])
        last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_all_params_receive_gradients():
    model, state, batch, tc = _init()

    def loss_fn(params):
        outs = model.apply(params, batch["features"], batch["world2pixel"],
                           batch["origin_shift"])
        return sum(compute_losses(TINY, outs, batch).values())

    grads = jax.grad(loss_fn)(state.params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    zero = [jax.tree_util.keystr(k) for k, g in flat
            if not np.any(np.asarray(g))]
    # the reference relies on find_unused_parameters=True for dead branches;
    # here the only legitimately grad-less params are the unused layout
    # embedding and positional encoding (inert on the active path)
    allowed = ("query_layout_embedding", "positional_encoding")
    unexpected = [k for k in zero if not any(a in k for a in allowed)]
    assert not unexpected, unexpected


def test_remat_encoder_matches_no_remat():
    """remat_encoder is a pure memory/compute trade: loss and grads must be
    numerically identical (same program, recomputed activations)."""
    model, state, batch, _ = _init()
    cfg_r = dataclasses.replace(TINY, remat_encoder=True)
    model_r = VoxelFormer(cfg_r)

    def loss_fn(m, cfg):
        def f(params):
            outs = m.apply(params, batch["features"], batch["world2pixel"],
                           batch["origin_shift"])
            return sum(compute_losses(cfg, outs, batch).values())
        return f

    # same param tree (remat must not rename/move params)
    params_r = model_r.init(jax.random.PRNGKey(0), batch["features"],
                            batch["world2pixel"], batch["origin_shift"])
    assert (jax.tree_util.tree_structure(params_r)
            == jax.tree_util.tree_structure(state.params))

    l0, g0 = jax.value_and_grad(loss_fn(model, TINY))(state.params)
    l1, g1 = jax.value_and_grad(loss_fn(model_r, cfg_r))(state.params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for (k0, a), (k1, b) in zip(
            jax.tree_util.tree_flatten_with_path(g0)[0],
            jax.tree_util.tree_flatten_with_path(g1)[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(k0))


def test_add_layout_loss():
    cfg = dataclasses.replace(TINY, add_layout=True)
    model, state, batch, _ = _init(cfg)
    outs = model.apply(state.params, batch["features"],
                       batch["world2pixel"], batch["origin_shift"])
    losses = compute_losses(cfg, outs, batch)
    assert "loss_layout" in losses
    assert np.isfinite(float(losses["loss_layout"]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 cpu devices")
def test_train_step_on_mesh():
    _, state, batch, tc = _init()
    mesh = make_mesh((4, 2))
    state = replicate(mesh, state)
    sharded = shard_batch(mesh, {k: np.repeat(v, 2, axis=0)
                                 for k, v in batch.items()})
    step = make_train_step(TINY, tc, donate=False)
    with mesh:
        new_state, metrics = step(state, sharded,
                                  jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # replicated params stay replicated after the update
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 cpu devices")
def test_train_step_multislice_matches_flat_mesh():
    """(slice, data, view) hybrid mesh: batch sharded over (slice, data)
    jointly must give the same step as the flat (data, view) mesh — the
    layout changes which axis the gradient reduce crosses (DCN vs ICI),
    not the math."""
    from vln_ver_tpu.parallel import make_multislice_mesh

    _, state, batch, tc = _init()
    big = {k: np.repeat(v, 2, axis=0) for k, v in batch.items()}
    step = make_train_step(TINY, tc, donate=False)

    mesh_flat = make_mesh((4, 2))
    with mesh_flat:
        _, m_flat = step(replicate(mesh_flat, state),
                         shard_batch(mesh_flat, big),
                         jax.random.PRNGKey(0))

    mesh_3d = make_multislice_mesh(num_slices=2, data=2, view=2)
    assert mesh_3d.axis_names == ("slice", "data", "view")
    with mesh_3d:
        new_state, m_3d = step(replicate(mesh_3d, state),
                               shard_batch(mesh_3d, big),
                               jax.random.PRNGKey(0))
    assert np.isfinite(float(m_3d["loss"]))
    np.testing.assert_allclose(float(m_3d["loss"]),
                               float(m_flat["loss"]), rtol=1e-5)
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 cpu devices")
def test_train_step_tensor_parallel_matches_replicated():
    """TP: parameter matrices sharded over a 'model' axis must give the
    same step as fully replicated params (GSPMD inserts the collectives)."""
    from vln_ver_tpu.parallel import make_tp_mesh, shard_batch

    _, state, batch, tc = _init()
    big = {k: np.repeat(v, 2, axis=0) for k, v in batch.items()}
    step = make_train_step(TINY, tc, donate=False)

    mesh_flat = make_mesh((4, 2))
    with mesh_flat:
        _, m_ref = step(replicate(mesh_flat, state),
                        shard_batch(mesh_flat, big), jax.random.PRNGKey(0))

    mesh_tp = make_tp_mesh(data=2, model=4, view=1)
    # tiny test model -> tiny threshold so the rule actually bites
    from vln_ver_tpu.parallel.tensor import shard_state
    sharded_state = shard_state(mesh_tp, state, min_size=128)
    with mesh_tp:
        new_state, m_tp = step(sharded_state, shard_batch(mesh_tp, big),
                               jax.random.PRNGKey(0))
    assert np.isfinite(float(m_tp["loss"]))
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_ref["loss"]),
                               rtol=1e-4)
    # the rule sharded a substantial fraction of parameter bytes
    from vln_ver_tpu.parallel.tensor import param_pspec
    from jax.sharding import PartitionSpec as P
    leaves = jax.tree.leaves(state.params)
    n_sharded = sum(int(np.prod(x.shape)) for x in leaves
                    if param_pspec(x, 4, min_size=128) != P())
    assert n_sharded / sum(int(np.prod(x.shape)) for x in leaves) > 0.3


def test_lr_schedule_matches_mmcv_semantics():
    """make_lr_schedule vs a direct transcription of mmcv's
    CosineAnnealingLrUpdaterHook (+LrUpdaterHook.get_warmup_lr, 'linear'):
    cosine progress spans ALL total_steps (epoch-granular under
    by_epoch=True), and warmup multiplies the CURRENT annealed lr."""
    import numpy as np

    from vln_ver_tpu.train.state import TrainConfig, make_lr_schedule

    base, min_ratio, wratio = 1e-4, 1e-3, 1.0 / 3.0
    spe, epochs, warm_ep = 50, 20, 3
    tc = TrainConfig(learning_rate=base, warmup_steps=warm_ep * spe,
                     total_steps=epochs * spe, warmup_ratio=wratio,
                     min_lr_ratio=min_ratio, steps_per_epoch=spe)
    sched = make_lr_schedule(tc)

    def mmcv_lr(it):
        # CosineAnnealingLrUpdaterHook.get_lr with by_epoch=True
        progress, max_progress = it // spe, epochs
        target = base * min_ratio
        cos_out = np.cos(np.pi * (progress / max_progress)) + 1
        regular = target + 0.5 * (base - target) * cos_out
        if it < tc.warmup_steps:      # get_warmup_lr('linear')
            k = (1 - it / tc.warmup_steps) * (1 - wratio)
            return (1 - k) * regular
        return regular

    for it in [0, 1, 25, 49, 50, 149, 150, 151, 500, 999]:
        # rtol 1e-5: the schedule evaluates in fp32
        np.testing.assert_allclose(float(sched(it)), mmcv_lr(it),
                                   rtol=1e-5, err_msg=f"iter {it}")
    # smooth per-iter variant (by_epoch=False): progress uses the iter
    tc2 = TrainConfig(learning_rate=base, warmup_steps=0,
                      total_steps=1000, min_lr_ratio=min_ratio,
                      steps_per_epoch=0)
    s2 = make_lr_schedule(tc2)
    exp = base * min_ratio + 0.5 * (base - base * min_ratio) * (
        np.cos(np.pi * 0.5) + 1)
    np.testing.assert_allclose(float(s2(500)), exp, rtol=1e-6)


def test_param_pspec_shards_largest_divisible_axis():
    """The TP rule shards the LARGEST model-divisible axis (module
    docstring contract): a (4096, 8) kernel on an 8-way model axis must
    shard the 4096 rows, not leave one scalar column per device; square
    kernels keep the features-axis (last) tie-break."""
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from vln_ver_tpu.parallel.tensor import param_pspec

    assert param_pspec(np.zeros((4096, 8)), 8) == P("model", None)
    assert param_pspec(np.zeros((8, 4096)), 8) == P(None, "model")
    assert param_pspec(np.zeros((512, 512)), 8) == P(None, "model")
    assert param_pspec(np.zeros((512, 513)), 8) == P("model", None)
    assert param_pspec(np.zeros((7, 9)), 8) == P()          # indivisible
    assert param_pspec(np.zeros((64,)), 8) == P()           # 1-D
    assert param_pspec(np.zeros((16, 16)), 8) == P()        # below min


def test_bf16_precast_feature_upload_is_bit_identical():
    """tools/train.py's transfer thread pre-casts features to the bf16
    compute dtype BEFORE the host->device upload (halving the dominant
    transfer).  The encoder's first touch of the features is that exact
    cast in-graph, so the train step must be BIT-identical either way —
    loss, metrics, and every updated parameter."""
    cfg = dataclasses.replace(TINY, dtype=jnp.bfloat16)
    model, state, batch, tc = _init(cfg)
    step = make_train_step(cfg, tc, donate=False)
    pre = dict(batch, features=np.asarray(
        batch["features"]).astype(jnp.bfloat16))
    s1, m1 = step(state, batch, jax.random.PRNGKey(3))
    s2, m2 = step(state, pre, jax.random.PRNGKey(3))
    assert float(m1["loss"]) == float(m2["loss"])
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_staged_batches_matches_inline_and_propagates_errors():
    """train.feed.staged_batches yields exactly place(b) for every batch
    in order (one-ahead threading must not reorder or drop), and a
    placement failure re-raises in the consumer."""
    import pytest

    from vln_ver_tpu.train import staged_batches

    items = list(range(7))
    out = list(staged_batches(iter(items), lambda x: x * 10))
    assert out == [x * 10 for x in items]
    assert list(staged_batches(iter([]), lambda x: x)) == []

    def boom(x):
        if x == 2:
            raise ValueError("bad batch")
        return x

    with pytest.raises(ValueError, match="bad batch"):
        list(staged_batches(iter(items), boom))


def test_lr_schedule_clamps_past_total_steps():
    """Stepping past total_steps (a --max-steps override or a long
    resume) must HOLD the lr at the cosine floor, not anneal back up the
    cosine (regression: prog > 1 made cos(pi*prog) rise again)."""
    from vln_ver_tpu.train.state import make_lr_schedule

    tc = TrainConfig(learning_rate=1e-3, warmup_steps=0,
                     total_steps=100, min_lr_ratio=1e-2,
                     steps_per_epoch=0)
    sched = make_lr_schedule(tc)
    floor = float(sched(100))
    np.testing.assert_allclose(floor, 1e-5, rtol=1e-5)
    for step in (101, 150, 200, 1000):
        np.testing.assert_allclose(float(sched(step)), floor, rtol=1e-6,
                                   err_msg=f"step {step}")
