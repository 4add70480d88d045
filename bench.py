"""Benchmark: VER volume generation throughput on one chip.

Measures the north-star metric (BASELINE.json): volumes/sec/chip for the
36-view VER lift — the full get_occ inference path (encoder lift + DETR
decoder + coarse-to-fine occupancy head) on 36 ViT views per viewpoint.
Warmup + synced timing mirror the reference benchmark CLI
(tools/analysis_tools/benchmark.py:69-94).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so round 1 establishes
the baseline: vs_baseline is this run's value divided by the round-1
recorded value when available (BENCH_r1.json), else 1.0.
"""

from __future__ import annotations

import json
import os

import numpy as np


def main():
    import jax

    from vln_ver_tpu.utils.bench import scan_diff_time
    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # honor JAX_PLATFORMS (sitecustomize pins axon) + compile cache

    from vln_ver_tpu.models import VERConfig, VoxelFormer
    from __graft_entry__ import _example_inputs

    import jax.numpy as jnp

    # 36-view panorama variant (north-star workload); bf16 compute.
    # The capacity-bounded sparse lift (per-camera top-K visible queries)
    # is ON by default: K=256 safely covers the <=176 visible at this rig
    # (validated by tools/check_query_capacity.py; parity-tested exact in
    # tests/test_sparse_lift.py).  BENCH_QCAP=0 restores the dense lift
    # (92.3 vs 148.0 volumes/s, measured 2026-08-18).
    qcap = int(os.environ.get("BENCH_QCAP", "256"))
    cfg = VERConfig(num_cams=36, dtype=jnp.bfloat16,
                    sca_query_capacity=qcap)
    # defaults match the programs in the persistent compile cache.
    # batch sweep (min-of-3 scan-diff, on chip):
    #   dense lift:      4 -> 88.2, 8 -> 91.6, 16 -> 64.3 volumes/s
    #   sparse lift 256: 4 -> 146.5, 8 -> 148.0, 16 -> 141.0 volumes/s
    # The dense batch-16 regression was ATTRIBUTED (2026-08-17) to the
    # per-layer deform A-matrix working set (~1.6 GB) crossing its HBM
    # locality knee; the sparse lift shrinks that working set 3.5x, which
    # is why the knee (and the batch-4-vs-8 gap) collapse.  Batch 8 stays
    # the single-chip operating point; larger global batches belong on
    # the data-parallel mesh axis.
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    warmup = 3

    model = VoxelFormer(cfg)
    feats, w2p, shift = _example_inputs(cfg, batch=batch)
    params = model.init(jax.random.PRNGKey(0), feats[:1], w2p[:1],
                        shift[:1])

    # Remote-backend-honest timing: the axon tunnel neither blocks in
    # block_until_ready nor has negligible dispatch RTT, so we scan `iters`
    # forwards INSIDE one jit — serialized by a data dependency — and fetch
    # a single scalar.  Wall time then measures device compute, and the
    # one-off RTT is subtracted out by differencing two scan lengths.
    def run_n(n):
        @jax.jit
        def fn(params, feats, w2p, shift):
            def body(carry, _):
                f = feats + carry * jnp.bfloat16(0)
                outs = model.apply(params, f, w2p, shift,
                                   deterministic=True)
                s = (jnp.sum(outs["bev_embed"].astype(jnp.float32))
                     + jnp.sum(outs["occupancy_preds"].astype(jnp.float32)))
                return s.astype(jnp.bfloat16), ()
            s, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=n)
            return s
        return fn

    dt = scan_diff_time(run_n, (params, feats, w2p, shift), iters,
                        warmup=warmup)
    volumes_per_sec = batch / dt

    # second operating point (batch 4) recorded in the same JSON line so
    # operating-point moves can't masquerade as kernel wins round-over-
    # round (both programs live in the persistent compile cache).
    alt_batch = int(os.environ.get("BENCH_ALT_BATCH", "4"))
    alt_vps = None
    if alt_batch and alt_batch != batch:
        f4, w4, s4 = _example_inputs(cfg, batch=alt_batch)
        dt4 = scan_diff_time(run_n, (params, f4, w4, s4), iters,
                             warmup=warmup)
        alt_vps = alt_batch / dt4

    # vs_baseline = this run / round-1 recorded value.  The driver writes
    # BENCH_r01.json, BENCH_r02.json, ...; anchor to the EARLIEST round so
    # the ratio is a cumulative round-over-round progress signal.
    vs_baseline = 1.0
    import glob
    here = os.path.dirname(os.path.abspath(__file__))
    rounds = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    if rounds:
        try:
            with open(rounds[0]) as f:
                base = json.load(f)
            # driver schema: the bench line lives under "parsed"
            base = base.get("parsed", base)
            if base.get("value"):
                vs_baseline = volumes_per_sec / float(base["value"])
        except Exception:
            pass

    line = {
        "metric": "ver_volumes_per_sec_per_chip_36view",
        "value": round(volumes_per_sec, 4),
        "unit": "volumes/s",
        # round-over-round progress vs OUR round-1 number — NOT an A100
        # ratio (the A100 anchor argument lives in docs/performance.md)
        "vs_baseline": round(vs_baseline, 4),
        "batch": batch,
    }
    if alt_vps is not None:
        line[f"value_batch{alt_batch}"] = round(alt_vps, 4)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
