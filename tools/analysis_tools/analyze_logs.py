#!/usr/bin/env python
"""Training-log analysis (parity: reference
`tools/analysis_tools/analyze_logs.py:10` cal_train_time + plot_curve over
the jsonl train logs)."""
from __future__ import annotations

import argparse
import json

import numpy as np


def load_log(path: str):
    recs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                recs.append(json.loads(line))
    return recs


def cal_train_time(recs, skip_first: int = 1):
    times = np.asarray([r["time"] for r in recs[skip_first:] if "time" in r])
    if times.size == 0:
        print("no iteration timings found")
        return
    print(f"slowest iter: {times.max():.4f}s, fastest: {times.min():.4f}s, "
          f"mean: {times.mean():.4f}s +/- {times.std():.4f}")


def plot_curve(recs, keys, out=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    for k in keys:
        xs = [r["step"] for r in recs if k in r]
        ys = [r[k] for r in recs if k in r]
        plt.plot(xs, ys, label=k)
    plt.xlabel("step")
    plt.legend()
    plt.savefig(out or "curve.png", dpi=120)
    print(f"saved {out or 'curve.png'}")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="task", required=True)
    t = sub.add_parser("cal_train_time")
    t.add_argument("log")
    c = sub.add_parser("plot_curve")
    c.add_argument("log")
    c.add_argument("--keys", nargs="+", default=["loss"])
    c.add_argument("--out", default=None)
    args = p.parse_args()
    recs = load_log(args.log)
    if args.task == "cal_train_time":
        cal_train_time(recs)
    else:
        plot_curve(recs, args.keys, args.out)


if __name__ == "__main__":
    main()
