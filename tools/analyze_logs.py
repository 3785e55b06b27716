#!/usr/bin/env python
"""Plot / summarize training logs (reference
``tools/analysis_tools/analyze_logs.py``): loss curves and timing stats
from log.json files.

Usage:
    python tools/analyze_logs.py cal_train_time LOG_JSON [...]
    python tools/analyze_logs.py plot_curve LOG_JSON --keys loss --out x.png
"""
import argparse
import json


def load_entries(path):
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def cal_train_time(paths):
    for p in paths:
        entries = [e for e in load_entries(p)
                   if e.get("mode") == "train" and "time" in e]
        if not entries:
            print(f"{p}: no timing entries")
            continue
        times = [e["time"] for e in entries[1:]]  # skip warmup interval
        if not times:
            times = [entries[0]["time"]]
        import statistics
        print(f"{p}: mean {statistics.mean(times):.4f}s/iter, "
              f"min {min(times):.4f}, max {max(times):.4f}, "
              f"n={len(times)}")


def plot_curve(paths, keys, out):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    for p in paths:
        entries = [e for e in load_entries(p) if e.get("mode") == "train"]
        for k in keys:
            xs = [e["iter"] for e in entries if k in e]
            ys = [e[k] for e in entries if k in e]
            plt.plot(xs, ys, label=f"{p}:{k}")
    plt.xlabel("iter")
    plt.legend()
    plt.savefig(out)
    print(f"wrote {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("task", choices=["cal_train_time", "plot_curve"])
    ap.add_argument("logs", nargs="+")
    ap.add_argument("--keys", nargs="+", default=["loss"])
    ap.add_argument("--out", default="curve.png")
    args = ap.parse_args()
    if args.task == "cal_train_time":
        cal_train_time(args.logs)
    else:
        plot_curve(args.logs, args.keys, args.out)


if __name__ == "__main__":
    main()
