"""Op-level TPU profile of the staged SSL step (xprof/xplane based).

Captures a ``jax.profiler`` trace around a few chained SSL iterations
at production shapes and prints the top ops by self time (converted
from the xplane.pb via tensorboard_plugin_profile), giving the
per-kernel breakdown that phase timing can't.

Usage: python tools/misc/profile_trace.py [--phase stu3d|teacher|all]
"""
import argparse
import glob
import gzip
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
from detmatch_tpu.utils.env import setup_jax  # noqa: E402

setup_jax()


def summarize_trace(logdir, top=40):
    """Print top ops by self-time from the captured trace."""
    paths = glob.glob(os.path.join(
        logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane.pb found under", logdir)
        return
    try:
        from tensorboard_plugin_profile.convert import (
            raw_to_tool_data as rtd)
        data, _ = rtd.xspace_to_tool_data(paths, "framework_op_stats^",
                                          {})
        # data is CSV-ish / json; print head
        text = data.decode() if isinstance(data, bytes) else str(data)
        print(text[:8000])
        return
    except Exception as e:  # noqa: BLE001
        print("tbp convert failed:", e)
    # fallback: trace viewer json (perfetto) — aggregate event durations
    tv = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                   recursive=True)
    if not tv:
        print("no trace.json.gz either")
        return
    with gzip.open(tv[0], "rt") as f:
        trace = json.load(f)
    agg = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")[:80]
            agg[name] = agg.get(name, 0.0) + ev["dur"]
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur / 1e3:10.2f} ms  {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/ssl_trace")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--summarize-only", action="store_true")
    args = ap.parse_args()

    if args.summarize_only:
        summarize_trace(args.logdir)
        return

    # build the production-shape staged step (reuse the bench setup)
    sys.argv = [sys.argv[0]]
    import tools.misc.bench_ssl_step as bss

    rng = np.random.RandomState(0)
    batch = dict(
        lab=dict(stu=bss._view(rng, with_gt=True), tea=bss._view(rng)),
        unlab=dict(stu=bss._view(rng), tea=bss._view(rng)),
    )
    from detmatch_tpu.models.frcnn.faster_rcnn import FasterRCNN
    from detmatch_tpu.models.pvrcnn.pvrcnn import PVRCNN
    from detmatch_tpu.ssl.detector import SSLConfig, SSLDetector
    from detmatch_tpu.train.ssl_step import (make_ssl_train_fns_split,
                                             voxelize_views)
    import optax

    pv = PVRCNN(**bss.PV_CFG)
    fr = FasterRCNN(**bss.FR_CFG)
    ssl = SSLDetector(pv, fr, SSLConfig())
    key = jax.random.PRNGKey(0)
    vbatch = voxelize_views(batch, bss.SPEC)
    lab3d = vbatch["lab"]["stu"]
    t0 = time.time()
    state = ssl.init_states(key, lab3d, lab3d["img"], lab3d["img_shape"])
    print(f"[init {time.time() - t0:.0f}s]", flush=True)

    tx3 = optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(1e-3))
    tx2 = optax.chain(optax.clip_by_global_norm(10.0),
                      optax.sgd(1e-3, momentum=0.9))
    opt3 = tx3.init(state["student"]["det3d"]["params"])
    opt2 = tx2.init(state["student"]["det2d"]["params"])
    teacher_fn, stu3d_fn, stu2d_fn, ema_fn = make_ssl_train_fns_split(
        ssl, tx3, tx2, bss.SPEC)
    jt, j3, j2, je = (jax.jit(teacher_fn), jax.jit(stu3d_fn),
                      jax.jit(stu2d_fn), jax.jit(ema_fn))

    # compile before tracing
    pseudo, vb = jt(state["teacher"], batch)
    v3, o3, l3 = j3(state["student"]["det3d"], opt3, vb, pseudo,
                    jnp.int32(0), key)
    v2, o2, l2 = j2(state["student"]["det2d"], opt2, vb, pseudo,
                    jnp.int32(0), key)
    tea = je(state["teacher"], {"det3d": v3, "det2d": v2}, jnp.int32(0))
    jax.block_until_ready(tea)
    print("[compiled]", flush=True)

    st = {"student": {"det3d": v3, "det2d": v2}, "teacher": tea}
    with jax.profiler.trace(args.logdir):
        for i in range(args.iters):
            pseudo, vb = jt(st["teacher"], batch)
            v3, o3, l3 = j3(st["student"]["det3d"], o3, vb, pseudo,
                            jnp.int32(i), key)
            v2, o2, l2 = j2(st["student"]["det2d"], o2, vb, pseudo,
                            jnp.int32(i), key)
            tea = je(st["teacher"], {"det3d": v3, "det2d": v2},
                     jnp.int32(i))
            st = {"student": {"det3d": v3, "det2d": v2}, "teacher": tea}
        jax.block_until_ready(st["teacher"])
    print("[trace done]", flush=True)
    summarize_trace(args.logdir)


if __name__ == "__main__":
    main()
