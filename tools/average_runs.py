#!/usr/bin/env python
"""Average final-eval metrics across split runs
(reference ``tools/average_runs.py``: reads the last eval entry of each
run's log.json and averages matching keys).

Usage: python tools/average_runs.py LOG_JSON [LOG_JSON ...]
"""
import argparse
import json
from collections import defaultdict


def last_eval_entry(path):
    last = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            entry = json.loads(line)
            if entry.get("mode") == "val":
                last = entry
    return last


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+")
    args = ap.parse_args()
    acc = defaultdict(list)
    for p in args.logs:
        entry = last_eval_entry(p)
        if entry is None:
            print(f"warning: no eval entry in {p}")
            continue
        for k, v in entry.items():
            if isinstance(v, (int, float)) and k not in ("iter", "time"):
                acc[k].append(v)
    for k in sorted(acc):
        vals = acc[k]
        print(f"{k}: {sum(vals) / len(vals):.4f}  (n={len(vals)})")


if __name__ == "__main__":
    main()
