"""Measure StableHLO program sizes of the SSL phases (local tracing only,
no remote compile) and break down op counts to find MLIR bloat."""
import os
import re
import sys
from collections import Counter

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
jax.config.update("jax_platforms", "cpu")

import importlib
bss = importlib.import_module("tools.misc.bench_ssl_step") if False else None
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "tools", "misc"))
import bench_ssl_step as B  # noqa: E402

import optax  # noqa: E402
from detmatch_tpu.models.frcnn.faster_rcnn import FasterRCNN  # noqa
from detmatch_tpu.models.pvrcnn.pvrcnn import PVRCNN  # noqa
from detmatch_tpu.ssl.detector import SSLConfig, SSLDetector  # noqa
from detmatch_tpu.train.ssl_step import (make_ssl_train_fns_split,  # noqa
                                         voxelize_views)


def size_of(name, fn, *args):
    lowered = jax.jit(fn).lower(*args)
    txt = lowered.as_text()
    mb = len(txt) / 1e6
    ops = Counter(re.findall(r"stablehlo\.(\w+)", txt))
    top = ", ".join(f"{k}:{v}" for k, v in ops.most_common(8))
    print(f"{name:<18} {mb:8.1f} MB   {top}", flush=True)
    return txt


def main():
    rng = np.random.RandomState(0)
    batch = dict(
        lab=dict(stu=B._view(rng, with_gt=True), tea=B._view(rng)),
        unlab=dict(stu=B._view(rng), tea=B._view(rng)),
    )
    os.environ["DETMATCH_SPCONV_IMPL"] = "pallas_window"
    pv = PVRCNN(**B.PV_CFG)
    fr = FasterRCNN(**B.FR_CFG)
    ssl = SSLDetector(pv, fr, SSLConfig())
    key = jax.random.PRNGKey(0)
    vbatch = voxelize_views(batch, B.SPEC)
    lab3d = vbatch["lab"]["stu"]
    state = jax.eval_shape(
        lambda: ssl.init_states(key, lab3d, lab3d["img"],
                                lab3d["img_shape"]))
    state = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), state)

    tx3 = optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(1e-3))
    tx2 = optax.chain(optax.clip_by_global_norm(10.0),
                      optax.sgd(1e-3, momentum=0.9))
    opt3 = tx3.init(state["student"]["det3d"]["params"])
    opt2 = tx2.init(state["student"]["det2d"]["params"])

    teacher_fn, stu3d_fn, stu2d_fn, ema_fn = make_ssl_train_fns_split(
        ssl, tx3, tx2, B.SPEC)

    pseudo = jax.eval_shape(teacher_fn, state["teacher"], batch)[0]
    pseudo = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), pseudo)
    vb = vbatch

    size_of("teacher", teacher_fn, state["teacher"], batch)
    txt = size_of("stu3d(concat)", stu3d_fn, state["student"]["det3d"],
                  opt3, vb, pseudo, jnp.int32(0), key)
    size_of("stu2d", stu2d_fn, state["student"]["det2d"], opt2, vb,
            pseudo, jnp.int32(0), key)

    # fwd-only PVRCNN for reference
    cat = vb["lab"]["stu"]
    size_of("pvrcnn fwd(train)",
            lambda v, b: pv.apply(v, b, train=True,
                                  rngs={"sampling": key, "dropout": key},
                                  mutable=["batch_stats"]),
            state["student"]["det3d"], cat)

    # biggest constants?
    consts = re.findall(r"dense<[^>]{200,}>", txt)
    print(f"large dense literals in stu3d: {len(consts)}; "
          f"total {sum(len(c) for c in consts)/1e6:.1f} MB", flush=True)


if __name__ == "__main__":
    main()
