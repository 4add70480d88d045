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
    print(json.dumps({
        "e2e_vps_exact": round(rates["auto"], 4),
        "e2e_vps_int8": round(rates["int8"], 4),
        "speedup": round(rates["int8"] / rates["auto"], 4),
        "rel_err_max": round(max(errs_max), 6),
        "rel_err_mean": round(float(np.mean(errs_mean)), 6),
        "volumes": args.volumes, "batch": args.batch,
    }))


if __name__ == "__main__":
    main()
