#!/usr/bin/env python
"""Training-log analysis over the jsonl logs written by tools/train.py.

Replacement for the reference tools/analysis_tools/analyze_logs.py:
summary statistics + optional loss-curve PNG.

Usage: python tools/analyze_logs.py work_dirs/vocc/train_log.jsonl
       [--plot out.png] [--keys loss loss_cls]
"""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("log")
    p.add_argument("--plot", default=None)
    p.add_argument("--keys", nargs="+", default=["loss"])
    args = p.parse_args()

    rows = []
    with open(args.log) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    if not rows:
        print("empty log")
        return
    steps = [r.get("step", i) for i, r in enumerate(rows)]
    print(f"{len(rows)} entries, steps {steps[0]}..{steps[-1]}")
    for k in args.keys:
        vals = [r[k] for r in rows if k in r]
        if not vals:
            continue
        print(f"{k}: first={vals[0]:.4f} last={vals[-1]:.4f} "
              f"min={min(vals):.4f} max={max(vals):.4f}")
    if "sec_per_step" in rows[-1]:
        print(f"sec/step (last): {rows[-1]['sec_per_step']:.3f}")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(8, 5))
        for k in args.keys:
            xs = [r["step"] for r in rows if k in r]
            ys = [r[k] for r in rows if k in r]
            if ys:
                ax.plot(xs, ys, label=k)
        ax.set_xlabel("step")
        ax.legend()
        ax.grid(alpha=0.3)
        fig.savefig(args.plot, dpi=120, bbox_inches="tight")
        print(f"saved {args.plot}")


if __name__ == "__main__":
    main()
