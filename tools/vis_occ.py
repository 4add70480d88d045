#!/usr/bin/env python
"""Voxel occupancy visualization (matplotlib, no mayavi).

Replacement for the reference tools/vis/vis_file.py: renders a sparse
occupancy npy (or a token from eval dumps) as a 3D voxel scatter with the
VER class palette, saved to PNG.

Usage:
  python tools/vis_occ.py occ.npy --out occ.png [--z 35 --y 120 --x 120]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# 16-class palette (a readable stand-in for the reference's mayavi LUT)
PALETTE = np.array([
    [0.85, 0.85, 0.85], [0.55, 0.27, 0.07], [0.50, 0.50, 0.50],
    [1.00, 0.65, 0.00], [0.55, 0.00, 0.00], [0.82, 0.71, 0.55],
    [0.58, 0.00, 0.83], [0.00, 0.50, 0.50], [0.53, 0.81, 0.92],
    [0.80, 0.36, 0.36], [0.00, 0.00, 0.55], [0.00, 0.60, 0.00],
    [0.25, 0.88, 0.82], [0.90, 0.90, 0.00], [0.70, 0.70, 0.90],
    [0.93, 0.51, 0.93]])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("npy", help="sparse (M,2) occupancy npy")
    p.add_argument("--out", default=None)
    p.add_argument("--z", type=int, default=35)
    p.add_argument("--y", type=int, default=120)
    p.add_argument("--x", type=int, default=120)
    p.add_argument("--max-points", type=int, default=60000)
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sparse = np.load(args.npy)
    idx = sparse[:, 0].astype(np.int64)
    cls = sparse[:, 1].astype(np.int64)
    z = idx // (args.y * args.x)
    rem = idx % (args.y * args.x)
    y = rem // args.x
    x = rem % args.x
    if len(idx) > args.max_points:
        sel = np.random.default_rng(0).choice(len(idx), args.max_points,
                                              replace=False)
        z, y, x, cls = z[sel], y[sel], x[sel], cls[sel]

    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(x, y, z, c=PALETTE[np.clip(cls, 0, 15)], s=2, marker="s",
               alpha=0.6)
    ax.set_box_aspect((args.x, args.y, args.z))
    ax.set_title(os.path.basename(args.npy))
    out = args.out or os.path.splitext(args.npy)[0] + ".png"
    fig.savefig(out, dpi=130, bbox_inches="tight")
    print(f"saved {out} ({len(x)} voxels)")


if __name__ == "__main__":
    main()
