#!/usr/bin/env python
"""Measure the int8 feature-upload mode: e2e dump rate AND output error.

The e2e product path (vln_ver_tpu/ver_writer.py) is transfer-bound on
this environment's tunnel (docs/performance.md): 36 ViT views are
10.8 MB/volume even as bf16, vs 1.4 MB of output.  ``input_cast="int8"``
quantizes the upload per (sample, camera, channel) — half the bytes
again — at the cost of exactness.  This probe answers both questions the
opt-in needs answered:

* throughput: pipelined dump volumes/s with the exact (compute-dtype)
  upload vs the int8 upload, same dataset, same session (the tunnel's
  rate moves day to day — only same-session deltas mean anything);
* fidelity: max/mean abs error of the int8-upload VER volumes vs the
  exact-upload volumes, normalized by the exact volumes' absmax.

Usage: python tools/probe_upload_quant.py [--volumes 16] [--batch 8]
       [--passes 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--volumes", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--passes", type=int, default=2,
                    help="timed passes per mode; best-of is reported "
                         "(single e2e passes swing with host scheduling)")
    ap.add_argument("--tiny", action="store_true",
                    help="shrunken model dims — CPU smoke test of the "
                         "probe's machinery, not a measurement")
    args = ap.parse_args()

    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import h5py
    import jax
    import jax.numpy as jnp

    from vln_ver_tpu.models import VERConfig, VoxelFormer
    from vln_ver_tpu.ver_writer import dump_volumes
    from bench import _e2e_dataset
    from __graft_entry__ import _example_inputs

    if args.tiny:
        cfg = VERConfig(num_cams=2, dtype=jnp.bfloat16,
                        bev_z=2, bev_h=4, bev_w=4,
                        occupancy_size=(1.5, 1.5, 0.4375),
                        feat_h=4, feat_w=4, embed_dims=32, in_channels=32,
                        ffn_dim=64, occ_dims=16, encoder_layers=1,
                        decoder_layers=2, num_query=12)
    else:
        cfg = VERConfig(num_cams=36, dtype=jnp.bfloat16,
                        sca_query_capacity=192)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tag = (f"e2e_c{cfg.num_cams}_f{cfg.feat_h}x{cfg.in_channels}"
           f"_n{args.volumes}")
    ds = _e2e_dataset(cfg, args.volumes,
                      os.path.join(here, ".bench_data", tag))

    model = VoxelFormer(cfg)
    feats, w2p, shift = _example_inputs(cfg, batch=1)
    params = model.init(jax.random.PRNGKey(0), feats, w2p, shift)

    @jax.jit
    def bev_only(params, feats, w2p, shift):
        outs = model.apply(params, feats, w2p, shift, deterministic=True,
                           only_bev=True)
        return outs["bev_embed"], outs["sca_overflow"]

    tmp = tempfile.mkdtemp(prefix="probe_quant_")
    rates = {}
    vols = {}
    for mode in ("auto", "int8"):
        out = os.path.join(tmp, f"{mode}.h5")
        # one untimed warm pass (compile/cache-load + page cache), then
        # timed passes, best-of (same discipline as bench.py's e2e)
        dump_volumes(bev_only, params, cfg, ds, out, batch_size=args.batch,
                     input_cast=mode)
        best = 0.0
        for _ in range(args.passes):
            os.remove(out)
            r = dump_volumes(bev_only, params, cfg, ds, out,
                             batch_size=args.batch, input_cast=mode)
            assert r["sca_overflow"] == 0, r
            best = max(best, r["volumes_per_sec"])
        rates[mode] = best
        with h5py.File(out, "r") as f:
            vols[mode] = {k: f[k][:] for k in f}
        print(f"{mode}: {best:.3f} volumes/s", file=sys.stderr)

    errs_max, errs_mean = [], []
    for k, ref in vols["auto"].items():
        got = vols["int8"][k]
        denom = float(np.abs(ref).max())
        errs_max.append(float(np.abs(ref - got).max()) / denom)
        errs_mean.append(float(np.abs(ref - got).mean()) / denom)

    line = {
        "e2e_vps_exact": round(rates["auto"], 4),
        "e2e_vps_int8": round(rates["int8"], 4),
        "speedup": round(rates["int8"] / rates["auto"], 4),
        "rel_err_max": round(max(errs_max), 6),
        "rel_err_mean": round(float(np.mean(errs_mean)), 6),
        "volumes": args.volumes, "batch": args.batch,
    }

    # ---- task-level error budget (VERDICT r4 weak #4): the 0.14%-class
    # volume error means nothing to a user until it is propagated through
    # the two consumers of the product artifact ----
    #
    # (a) occupancy decode: full forward with exact vs int8-dequantized
    #     uploads -> decoded voxel labels (the reference's
    #     get_occupancy_prediction semantics) -> label flip rate and SSC
    #     mIoU delta against the synthetic gt.
    # (b) the agent: a FIXED policy (random init — no trained checkpoint
    #     exists anywhere, reference included) consuming the exact vs
    #     int8 dumped volumes -> action-distribution total-variation
    #     distance and argmax action flips.
    from vln_ver_tpu.data.mp3d import iterate_batches
    from vln_ver_tpu.evaluation.ssc_metrics import SSCMetrics
    from vln_ver_tpu.occupancy import decode_occupancy, occupancy_num_classes
    from vln_ver_tpu.ver_writer import quantize_int8

    nclasses = occupancy_num_classes(cfg.occupancy_classes,
                                     cfg.occ_loss_type)

    @jax.jit
    def occ_labels(params, feats, w2p, shift):
        outs = model.apply(params, feats, w2p, shift, deterministic=True)
        return decode_occupancy(outs["occupancy_preds"], 0.25,
                                cfg.occ_loss_type)

    @jax.jit
    def occ_labels_int8(params, q, scale, w2p, shift):
        f = (q.astype(jnp.float32) * scale).astype(jnp.dtype(cfg.dtype))
        return occ_labels(params, f, w2p, shift)

    m_exact = SSCMetrics(nclasses)
    m_int8 = SSCMetrics(nclasses)
    flips = total = 0
    for batch in iterate_batches(ds, args.batch, drop_last=False):
        feats = np.asarray(batch["features"])
        w2p, shift = batch["world2pixel"], batch["origin_shift"]
        pe = np.asarray(occ_labels(
            params, feats.astype(jnp.dtype(cfg.dtype)), w2p, shift))
        q, scale = quantize_int8(feats)
        pq = np.asarray(occ_labels_int8(params, q, scale, w2p, shift))
        vis = np.asarray(batch["occ_visible"])
        gt = np.asarray(batch["occ_dense"])
        m_exact.add_batch(pe, gt, vis)
        m_int8.add_batch(pq, gt, vis)
        flips += int((pe != pq).sum())
        total += pe.size
    miou_exact = float(m_exact.get_stats()["miou"])
    miou_int8 = float(m_int8.get_stats()["miou"])
    line.update(
        occ_label_flip_rate=round(flips / total, 6),
        occ_miou_exact=round(miou_exact, 4),
        occ_miou_int8=round(miou_int8, 4),
        occ_miou_delta=round(miou_int8 - miou_exact, 4))
    print(f"occ decode: flip_rate={flips / total:.2e} "
          f"miou {miou_exact:.3f} -> {miou_int8:.3f}", file=sys.stderr)

    from vln_ver_tpu.agent import PolicyConfig, VLNPolicy, init_memory

    pcfg = PolicyConfig(embed_dims=cfg.embed_dims, bev_z=cfg.bev_z,
                        bev_h=cfg.bev_h, bev_w=cfg.bev_w,
                        dropout_rate=0.0)
    policy = VLNPolicy(pcfg)
    rng0 = np.random.default_rng(0)
    tokens = jnp.asarray(rng0.integers(
        2, pcfg.vocab_size, (1, 12)).astype(np.int32))
    # a memory with candidate nodes: all-invalid memory masks every
    # non-stop action, which would make the distribution volume-blind
    # (and the probe vacuous)
    n_valid = min(6, pcfg.max_nodes)
    mem = init_memory(1, pcfg.max_nodes, pcfg.embed_dims)._replace(
        features=jnp.asarray(rng0.standard_normal(
            (1, pcfg.max_nodes, pcfg.embed_dims)).astype(np.float32)),
        positions=jnp.asarray(rng0.standard_normal(
            (1, pcfg.max_nodes, 3)).astype(np.float32)),
        valid=jnp.asarray(np.arange(pcfg.max_nodes)[None] < n_valid),
        count=jnp.full((1,), n_valid, jnp.int32))
    pos = jnp.zeros((1, 3), jnp.float32)
    slot = jnp.zeros((1,), jnp.int32)
    any_vol = next(iter(vols["auto"].values()))
    pparams = policy.init(
        jax.random.PRNGKey(1), tokens, tokens > 0,
        jnp.asarray(any_vol.reshape(cfg.embed_dims, -1).T[None]),
        mem, pos, slot)

    # params must be an ARGUMENT: closing over the 82M-param tree bakes
    # ~330 MB of constants into the HLO, which the tunnel's compile
    # endpoint rejects (HTTP 413)
    @jax.jit
    def action_probs(p, vol):
        out = policy.apply(p, tokens, tokens > 0, vol, mem, pos, slot)
        return jax.nn.softmax(out.logits, axis=-1)

    tvs, act_flips = [], 0
    for k, ref in vols["auto"].items():
        pa = np.asarray(action_probs(pparams, jnp.asarray(
            ref.reshape(cfg.embed_dims, -1).T[None])))
        pb = np.asarray(action_probs(pparams, jnp.asarray(
            vols["int8"][k].reshape(cfg.embed_dims, -1).T[None])))
        tvs.append(0.5 * float(np.abs(pa - pb).sum()))
        act_flips += int(pa.argmax() != pb.argmax())
    line.update(
        agent_tv_max=round(max(tvs), 6),
        agent_tv_mean=round(float(np.mean(tvs)), 6),
        agent_action_flips=act_flips,
        agent_episodes=len(tvs))
    print(f"agent: tv max={max(tvs):.2e} mean={np.mean(tvs):.2e} "
          f"action flips {act_flips}/{len(tvs)}", file=sys.stderr)

    print(json.dumps(line))


if __name__ == "__main__":
    main()
