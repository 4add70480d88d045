#!/usr/bin/env python
"""Compare two VER HDF5 dumps within fp32 tolerance.

The north star requires occupancy volumes "bitwise-comparable within fp32
tolerance" (BASELINE.json); this harness reports per-token and aggregate
max-abs / rel errors between two dumps (e.g. ours vs a reference export, or
two runs for determinism checks).

Usage: python tools/compare_ver.py a.hdf5 b.hdf5 [--rtol 1e-4] [--atol 1e-5]
Exit code 1 if any token exceeds tolerance.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("a")
    p.add_argument("b")
    p.add_argument("--rtol", type=float, default=1e-4)
    p.add_argument("--atol", type=float, default=1e-5)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args()

    import h5py

    bad = 0
    worst = (0.0, None)
    with h5py.File(args.a) as fa, h5py.File(args.b) as fb:
        keys_a, keys_b = set(fa.keys()), set(fb.keys())
        common = sorted(keys_a & keys_b)
        if keys_a ^ keys_b:
            print(f"key mismatch: only-in-a={len(keys_a - keys_b)} "
                  f"only-in-b={len(keys_b - keys_a)}")
        if args.limit:
            common = common[:args.limit]
        for k in common:
            va = fa[k][:].astype(np.float64)
            vb = fb[k][:].astype(np.float64)
            if va.shape != vb.shape:
                print(f"{k}: SHAPE {va.shape} vs {vb.shape}")
                bad += 1
                continue
            adiff = np.abs(va - vb)
            tol = args.atol + args.rtol * np.abs(vb)
            n_bad = int((adiff > tol).sum())
            mx = float(adiff.max()) if adiff.size else 0.0
            if mx > worst[0]:
                worst = (mx, k)
            if n_bad:
                print(f"{k}: {n_bad}/{va.size} out of tol, "
                      f"max abs {mx:.3e}")
                bad += 1
        print(f"compared {len(common)} tokens; {bad} out of tolerance; "
              f"worst max-abs {worst[0]:.3e} ({worst[1]})")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
