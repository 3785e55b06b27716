"""Benchmark: PV-RCNN inference throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context: the reference PV-RCNN runs ~10 FPS at inference on the
GPUs of its era (OpenPCDet model zoo / mmdet3d benchmark methodology,
``tools/analysis_tools/benchmark.py:30-90``: warmup then steady-state
timing). vs_baseline = measured_fps / 10.0 until a measured reference
number replaces it. Later rounds will switch this to SSL train iters/sec
(BASELINE.json north star).
"""
import json
import os
import time

import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    import __graft_entry__ as g

    fn, args = g.entry()
    jfn = jax.jit(fn)
    # compile + warmup
    out = jfn(*args)
    jax.block_until_ready(out)

    # chained timing: each iteration's input depends on the previous
    # output, so async dispatch can't overlap or dedupe executions
    # (block_until_ready alone under-measures on tunneled backends).
    # The first chain after a compile runs ~10-20x slow on tunneled
    # backends (device-side warmup); run chains until timing settles
    # and report the best.
    import jax.numpy as jnp
    iters = 10
    batch0 = args[0]
    pts = batch0["points"]
    dt = None
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jfn(dict(batch0, points=pts))
            pts = pts + 0.0 * out["rcnn_cls"].sum()
        jax.block_until_ready(pts)
        d = time.perf_counter() - t0
        dt = d if dt is None else min(dt, d)
        if dt < d * 1.2 and dt is not d:
            break

    batch = args[0]["points"].shape[0]
    fps = batch * iters / dt
    print(json.dumps({
        "metric": "pvrcnn_kitti_infer_fps",
        "value": round(fps, 3),
        "unit": "samples/sec",
        "vs_baseline": round(fps / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
