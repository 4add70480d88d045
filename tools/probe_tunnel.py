#!/usr/bin/env python
"""Measure the axon tunnel's host<->device transfer bandwidth and RTT.

The end-to-end get_occ product path is TUNNEL-BANDWIDTH-bound in this
environment (docs/performance.md: ~10.8 MB up + 1.4 MB down per volume),
and its measured rate moved 2.46 -> 1.30 vol/s between sessions with zero
code change.  This probe attributes such swings: it times device_put
(upload) and np.asarray of a device array (download) at a few sizes,
plus a tiny round-trip for RTT, so an e2e delta can be checked against
the bandwidth the tunnel actually delivered that session.

Prints one JSON dict (MB/s per direction, per size, plus rtt_ms).
Warm-shape measurement (the per-shape completion-fetch program is compiled outside the timed loop) — safe to run any time the chip is idle.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes-mb", default="8,32,87",
                   help="payload sizes; 87 ~= one batch-8 bf16 feature "
                        "upload of the e2e dump loop")
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    from vln_ver_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax

    dev = jax.devices()[0]
    out = {"backend": jax.default_backend(), "device": str(dev)}

    # RTT: round-trip a scalar (the per-dispatch floor every host-loop
    # step pays on this backend)
    tiny = np.float32(1.0)
    ts = []
    for _ in range(max(5, args.repeats)):
        t0 = time.perf_counter()
        _ = np.asarray(jax.device_put(tiny, dev))
        ts.append(time.perf_counter() - t0)
    out["rtt_ms"] = round(min(ts) * 1e3, 2)

    rng = np.random.default_rng(0)
    for mb in (int(s) for s in args.sizes_mb.split(",")):
        n = mb * (1 << 20) // 2  # bf16 payload, matching the e2e loop
        # INCOMPRESSIBLE payload: a zeros buffer would flatter any
        # transport-level compression the tunnel applies
        host = rng.standard_normal((n,)).astype(np.float16)
        # warm the per-shape slice program OUTSIDE the timed loop: the
        # completion fetch below (darr[:1]) compiles a small gather per
        # payload shape, which would otherwise land in the first
        # repeat's upload time (and dominate it at --repeats 1)
        _ = np.asarray(jax.device_put(host, dev)[:1])
        up, down = [], []
        darr = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            darr = jax.device_put(host, dev)
            # device_put may return before the bytes land; a 1-element
            # fetch forces completion and adds only one RTT
            _ = np.asarray(darr[:1])
            up.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            _ = np.asarray(darr)
            down.append(time.perf_counter() - t0)
        out[f"up_{mb}mb_MBps"] = round(mb / min(up), 1)
        out[f"down_{mb}mb_MBps"] = round(mb / min(down), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
