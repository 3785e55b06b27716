"""Benchmark on the real chip. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline"}.

Headline: the FULL DetMatch SSL train step (teacher pseudo-labels +
student 3d fwd/bwd/opt + student 2d fwd/bwd/opt + EMA) at the
reference's production per-GPU recipe — batch 4 labeled + 4 unlabeled,
18k-point realistic ray-cast clouds, 16k-voxel cap, 2048 keypoints,
384x1280 canvas (``configs/detmatch/001/detmatch/split_0.py``). This is
BASELINE.json's north-star workload.

vs_baseline divides by the documented reference estimate of 1.6
samples/s per GPU (5 s/iter at 4+4; derivation in
``detmatch_tpu/benchmarks.py`` and ``docs/benchmarks.md`` — deliberately
conservative in the reference's favor).

Timing is chained-dependency (state of iter i feeds iter i+1): required
on tunneled backends where ``block_until_ready`` under-measures.

``BENCH=infer`` switches to the round-1 PV-RCNN inference headline.
"""
import json
import os
import time

import jax

from detmatch_tpu.utils.env import host_cache_dir
_cache = host_cache_dir()
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_enable_xla_caches",
                  "none")  # AOT entries embed compile-machine pseudo-features
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


def bench_infer():
    import __graft_entry__ as g
    from detmatch_tpu.models.pvrcnn.pvrcnn import PVRCNN

    model = PVRCNN(**g.ENTRY_CFG)

    def make(b):
        batch = g._make_batch(g.ENTRY_CFG, b=b, p=16384, max_voxels=16000)
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


def bench_ssl():
    from detmatch_tpu import benchmarks

    res = benchmarks.ssl_step_bench(
        b=4, reduced=os.environ.get("REDUCED", "0") == "1",
        log=lambda *a: print("#", *a, flush=True))
    print(json.dumps({
        "metric": "detmatch_ssl_samples_per_sec_per_chip",
        "value": round(res["samples_per_sec"], 3),
        "unit": "samples/sec (4 lab + 4 unlab per iter)",
        "vs_baseline": round(res["vs_ref_per_device"], 3),
    }))


if __name__ == "__main__":
    if os.environ.get("BENCH", "ssl") == "infer":
        bench_infer()
    else:
        bench_ssl()
