#!/usr/bin/env python
"""Panoramic strip visualization of a viewpoint's per-view inputs.

Replacement for the reference tools/vis/paranomic.py (matplotlib cylinder
render of view images): lays the N per-heading views of one viewpoint out
as a horizontal panorama strip.  Works on raw images (a directory of view
PNGs/JPGs) or on ViT patch-feature energy maps from the feature HDF5.

Usage:
  python tools/vis_panorama.py --hdf5 data/feats.hdf5 --token scan_vp \
      --out pano.png
  python tools/vis_panorama.py --images view0.png view1.png ... --out pano.png
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hdf5", default=None)
    p.add_argument("--token", default=None, help="'{scan}_{vp}'")
    p.add_argument("--cam-id", type=int, default=1)
    p.add_argument("--num-views", type=int, default=6)
    p.add_argument("--images", nargs="+", default=None)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = []
    titles = []
    if args.images:
        import matplotlib.image as mpimg
        for path in args.images:
            panels.append(mpimg.imread(path))
            titles.append(os.path.basename(path))
    else:
        import h5py
        assert args.hdf5 and args.token, "--hdf5 and --token required"
        scan, vp = args.token.split("_")
        with h5py.File(args.hdf5, "r") as f:
            for deg in range(args.num_views):
                key = f"{scan}_{vp}_i{args.cam_id}_{deg}"
                feat = f[key][:, 1:, :]  # strip CLS
                hw = int(np.sqrt(feat.shape[1]))
                energy = np.linalg.norm(
                    feat.reshape(hw, hw, -1), axis=-1)
                panels.append(energy)
                titles.append(f"deg {deg}")

    fig, axes = plt.subplots(1, len(panels),
                             figsize=(3 * len(panels), 3.2))
    if len(panels) == 1:
        axes = [axes]
    for ax, img, title in zip(axes, panels, titles):
        ax.imshow(img, cmap=None if img.ndim == 3 else "viridis")
        ax.set_title(title, fontsize=9)
        ax.axis("off")
    fig.suptitle(args.token or "panorama")
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
