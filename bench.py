"""Benchmark: PV-RCNN inference throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology mirrors the reference's
``tools/analysis_tools/benchmark.py:30-90`` (warmup then steady-state
timing) with chained-dependency timing: each iteration's input depends on
the previous output, so async dispatch can't overlap or dedupe executions
(required on tunneled backends where block_until_ready under-measures).

Headline metric: batched inference throughput at B=4 (TPUs are
throughput devices; batch 4 matches the per-GPU batch of the reference
recipe). vs_baseline divides by the ~10 FPS the reference PV-RCNN
sustains on its era's GPUs (OpenPCDet model zoo methodology). B=1
latency is printed as a secondary (non-JSON) line.
"""
import json
import os
import time

import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def _chained_time(jfn, batch0, iters):
    pts = batch0["points"]
    dt = None
    for _ in range(4):
        t0 = time.perf_counter()
        p = pts
        for _ in range(iters):
            out = jfn(dict(batch0, points=p))
            p = pts + 0.0 * out["rcnn_cls"].sum()
        jax.block_until_ready(p)
        d = time.perf_counter() - t0
        new = d if dt is None else min(dt, d)
        if dt is not None and new > dt * 0.83:
            dt = new
            break
        dt = new
    return dt / iters


def main():
    import __graft_entry__ as g
    from detmatch_tpu.models.pvrcnn.pvrcnn import PVRCNN

    model = PVRCNN(**g.ENTRY_CFG)

    def make(b):
        batch = g._make_batch(g.ENTRY_CFG, b=b, p=8192, max_voxels=12000)
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                               train=False)
        jfn = jax.jit(lambda bt: model.apply(variables, bt, train=False))
        out = jfn(batch)
        jax.block_until_ready(out)
        return jfn, batch

    jfn1, batch1 = make(1)
    lat = _chained_time(jfn1, batch1, iters=10)
    print(f"# B=1 latency: {lat * 1e3:.1f} ms "
          f"({1.0 / lat:.2f} samples/s)")

    jfn4, batch4 = make(4)
    per_call = _chained_time(jfn4, batch4, iters=5)
    fps = 4.0 / per_call
    print(json.dumps({
        "metric": "pvrcnn_kitti_infer_fps_b4",
        "value": round(fps, 3),
        "unit": "samples/sec",
        "vs_baseline": round(fps / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
