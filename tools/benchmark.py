#!/usr/bin/env python
"""Inference FPS benchmark (reference
``tools/analysis_tools/benchmark.py:30-90``: warmup then steady-state
timing over the val set / synthetic batches)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=200)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=1)
    args = ap.parse_args()

    import jax
    import __graft_entry__ as g
    fn, fargs = g.entry()
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(*fargs))
    for _ in range(args.warmup):
        jax.block_until_ready(jfn(*fargs))
    t0 = time.perf_counter()
    n = 0
    while n < args.samples:
        out = jfn(*fargs)
        n += args.batch_size
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"fps: {n / dt:.2f} samples/s over {n} samples")


if __name__ == "__main__":
    main()
