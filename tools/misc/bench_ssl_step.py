"""SSL train-step timing on the real chip (staged DetMatch step).

Builds the full teacher/student pair at PRODUCTION scale — the
reference's per-GPU recipe (``configs/detmatch/001/detmatch/split_0.py``):
batch 4 labeled + 4 unlabeled, 18,000-point reduced clouds (realistic
ray-cast scenes, not uniform noise), 16,000-voxel cap
(``split_0.py:112``), 2048 keypoints, full 384x1280 image canvas — and
times each staged phase — teacher pseudo-labels, student-3d
(concatenated lab+unlab pass), student-2d, EMA — chained, reporting SSL
iters/sec for BASELINE.json's north star.

Reduced-shape mode (the round-1 numbers) via REDUCED=1.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
from detmatch_tpu.utils.env import host_cache_dir  # noqa: E402
_cache = host_cache_dir()
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_enable_xla_caches",
                  "none")  # AOT entries embed compile-machine pseudo-features
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from detmatch_tpu.core.transforms import Aug2D, Aug3D
from detmatch_tpu.models.frcnn.faster_rcnn import FasterRCNN
from detmatch_tpu.models.pvrcnn.pvrcnn import PVRCNN
from detmatch_tpu.ops import voxelize
from detmatch_tpu.ssl.detector import SSLConfig, SSLDetector
from detmatch_tpu.train.ssl_step import (make_ssl_train_fns_split,
                                         make_stu3d_segmented,
                                         voxelize_views)

PCR = (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)
_REDUCED = os.environ.get("REDUCED", "0") == "1"
CANVAS = (192, 640) if _REDUCED else (384, 1280)
B = 4
P = 8192 if _REDUCED else 18000
_MAXV = 12000 if _REDUCED else 16000

PV_CFG = dict(
    num_classes=3, point_cloud_range=PCR, voxel_size=(0.05, 0.05, 0.1),
    grid_size=(1408, 1600, 40),
    num_keypoints=1024 if _REDUCED else 2048,
    backbone_caps=((12000, 9000, 7000, 7000) if _REDUCED
                   else (16000, 12000, 9000, 9000)),
    train_nms=dict(nms_pre=1024, nms_post=128, nms_thresh=0.8),
    test_nms=dict(nms_pre=1024, nms_post=100, nms_thresh=0.7),
    compute_dtype=jnp.bfloat16)
FR_CFG = dict(canvas=CANVAS, compute_dtype=jnp.bfloat16)
SPEC = voxelize.VoxelizerSpec(point_cloud_range=PCR,
                              voxel_size=(0.05, 0.05, 0.1),
                              max_voxels=_MAXV, max_points=5)


def _view(rng, b=B, p=P, with_gt=False):
    from detmatch_tpu.utils.synth_kitti import lidar_batch
    pts, pvalid = lidar_batch(rng, b, p, PCR)
    view = dict(
        points=jnp.asarray(pts),
        points_valid=jnp.asarray(pvalid),
        img=jnp.asarray(rng.randn(b, *CANVAS, 3).astype(np.float32)),
        img_shape=jnp.asarray(np.tile([[CANVAS[0], CANVAS[1]]], (b, 1)
                                      ).astype(np.float32)),
        ori_shape=jnp.asarray(np.tile([[375.0, 1242.0]], (b, 1))),
        lidar2img=jnp.asarray(np.tile(np.array(
            [[[0, -700, 0, 6200],
              [0, 0, -700, 1800],
              [1, 0, 0, 0],
              [0, 0, 0, 1]]], np.float32), (b, 1, 1))),
        aug3d=Aug3D(flip_x=jnp.zeros((b,)), rot=jnp.zeros((b,)),
                    scale=jnp.ones((b,)), trans=jnp.zeros((b, 3))),
        aug2d=Aug2D(scale=jnp.ones((b, 4)), flip=jnp.zeros((b,)),
                    img_w=jnp.full((b,), float(CANVAS[1]))),
    )
    if with_gt:
        g = 40
        gt = np.zeros((b, g, 8), np.float32)
        n = 20
        gt[:, :n, 0] = rng.rand(b, n) * 60 + 3
        gt[:, :n, 1] = rng.rand(b, n) * 70 - 35
        gt[:, :n, 2] = -1.0
        gt[:, :n, 3:6] = [3.9, 1.6, 1.56]
        gt[:, :n, 6] = rng.rand(b, n) - 0.5
        gt[:, :n, 7] = rng.randint(1, 4, (b, n))
        view["gt_boxes"] = jnp.asarray(gt)
        g2 = np.zeros((b, g, 4), np.float32)
        g2[:, :n, :2] = rng.rand(b, n, 2) * 400
        g2[:, :n, 2:] = g2[:, :n, :2] + 60
        view["gt_boxes2d"] = jnp.asarray(g2)
        view["gt_labels2d"] = jnp.asarray(
            rng.randint(0, 3, (b, g)).astype(np.int32))
        v2 = np.zeros((b, g), bool)
        v2[:, :n] = True
        view["gt2d_valid"] = jnp.asarray(v2)
    return view


def main(per_phase=False):
    rng = np.random.RandomState(0)
    batch = dict(
        lab=dict(stu=_view(rng, with_gt=True), tea=_view(rng)),
        unlab=dict(stu=_view(rng), tea=_view(rng)),
    )
    pv = PVRCNN(**PV_CFG)
    fr = FasterRCNN(**FR_CFG)
    import os as _os
    _cons = _os.environ.get("SSL_CONSISTENCY", "1") == "1"
    ssl = SSLDetector(pv, fr, SSLConfig(consistency=_cons))

    key = jax.random.PRNGKey(0)
    vbatch = voxelize_views(batch, SPEC)
    lab3d = vbatch["lab"]["stu"]
    # per-branch optimizers operate on single-branch trees
    import optax
    tx3 = optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(1e-3))
    tx2 = optax.chain(optax.clip_by_global_norm(10.0),
                      optax.sgd(1e-3, momentum=0.9))
    t0 = time.time()
    # init on the LOCAL CPU backend + one identity-jit transfer (eager
    # initializer dispatch through the tunnel costs ~9 min; committed
    # device_put arrays would silently recompile — see benchmarks.py)
    lab3d_sds = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        lab3d)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        state = ssl.init_states(key, lab3d_sds, lab3d_sds["img"],
                                lab3d_sds["img_shape"])
        opt3 = tx3.init(state["student"]["det3d"]["params"])
        opt2 = tx2.init(state["student"]["det2d"]["params"])
    state, opt3, opt2 = jax.jit(lambda s, a, b: (s, a, b))(
        state, opt3, opt2)
    jax.block_until_ready(state)
    print(f"[init(cpu)+transfer {time.time() - t0:.0f}s]", flush=True)

    teacher_fn, stu3d_fn, stu2d_fn, ema_fn = make_ssl_train_fns_split(
        ssl, tx3, tx2, SPEC)
    jt = jax.jit(teacher_fn)
    j3 = jax.jit(stu3d_fn)
    j2 = jax.jit(stu2d_fn)
    je = jax.jit(ema_fn)

    def one_iter(state, opt3, opt2, it, key):
        pseudo, vb = jt(state["teacher"], batch)
        v3, opt3, logs3 = j3(state["student"]["det3d"], opt3, vb, pseudo,
                             it, key)
        v2, opt2, logs2 = j2(state["student"]["det2d"], opt2, vb, pseudo,
                             it, key)
        student = {"det3d": v3, "det2d": v2}
        teacher = je(state["teacher"], student, it)
        return ({"student": student, "teacher": teacher}, opt3, opt2,
                logs3, logs2)

    # compile each phase
    names = ["teacher", "stu3d", "stu2d", "ema"]
    t0 = time.time()
    pseudo, vb = jt(state["teacher"], batch)
    jax.block_until_ready(pseudo)
    print(f"[compile teacher {time.time() - t0:.0f}s]", flush=True)
    t0 = time.time()
    v3, o3, l3 = j3(state["student"]["det3d"], opt3, vb, pseudo,
                    jnp.int32(0), key)
    jax.block_until_ready(l3)
    print(f"[compile stu3d {time.time() - t0:.0f}s] "
          f"loss={float(l3['loss']):.3f}", flush=True)
    t0 = time.time()
    v2, o2, l2 = j2(state["student"]["det2d"], opt2, vb, pseudo,
                    jnp.int32(0), key)
    jax.block_until_ready(l2)
    print(f"[compile stu2d {time.time() - t0:.0f}s] "
          f"loss={float(l2['loss']):.3f}", flush=True)
    t0 = time.time()
    tea = je(state["teacher"], {"det3d": v3, "det2d": v2}, jnp.int32(0))
    jax.block_until_ready(tea)
    print(f"[compile ema {time.time() - t0:.0f}s]", flush=True)

    if per_phase:
        from detmatch_tpu.train.ssl_step import make_stu3d_segmented as _ms
        _seg1 = jax.jit(lambda v, b, p: ssl.stu3d_seg_backbone(v, b, p))
        _cat, _feats, _aux, _bbs = _seg1(state["student"]["det3d"], vb,
                                         pseudo)
        _seg2 = jax.jit(lambda v, cat, f, a, b, p, it, rng:
                        ssl.stu3d_seg_heads(v, cat, f, a, b, p, it, rng))
        _g_params, _g_feats, _logs, _hs = _seg2(
            state["student"]["det3d"], _cat, _feats, _aux, vb, pseudo,
            jnp.int32(0), key)
        _seg3 = jax.jit(lambda v, cat, gf: ssl.stu3d_seg_bb_bwd(v, cat,
                                                                gf))
        _gb = _seg3(state["student"]["det3d"], _cat, _g_feats)
        jax.block_until_ready(_gb)

        _meta = ssl._ms_meta()

        def _fwd_only(v, cat, f, a):
            ms = {k: dict(a[k], feats=f[k], **_meta[k]) for k in f}
            from detmatch_tpu.models.pvrcnn.pvrcnn import PVRCNN as _PV
            out, mut = ssl.pvrcnn.apply(
                v, cat, ms, train=True,
                rngs={"sampling": key, "dropout": key},
                mutable=["batch_stats"], method=_PV.forward_from_ms)
            return out["rcnn_cls"].sum() + out["rcnn_reg"].sum()
        _jf = jax.jit(_fwd_only)
        _o = _jf(state["student"]["det3d"], _cat, _feats, _aux)
        jax.block_until_ready(_o)

        def time_phase(name, fn, *args, iters=3):
            out = fn(*args)
            jax.block_until_ready(out)
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                o = None
                for _ in range(iters):
                    o = fn(*args)
                jax.block_until_ready(o)
                d = (time.perf_counter() - t0) / iters
                best = d if best is None else min(best, d)
            print(f"phase {name:<10} {best * 1e3:8.0f} ms", flush=True)

        time_phase("seg2-fwdonly", lambda: _jf(
            state["student"]["det3d"], _cat, _feats, _aux))
        time_phase("seg1-bb-fwd", lambda: _seg1(
            state["student"]["det3d"], vb, pseudo))
        time_phase("seg2-heads", lambda: _seg2(
            state["student"]["det3d"], _cat, _feats, _aux, vb, pseudo,
            jnp.int32(0), key))
        time_phase("seg3-bb-bwd", lambda: _seg3(
            state["student"]["det3d"], _cat, _g_feats))
        time_phase("teacher", jt, state["teacher"], batch)
        time_phase("stu3d", lambda: j3(state["student"]["det3d"], opt3,
                                       vb, pseudo, jnp.int32(0), key))
        time_phase("stu2d", lambda: j2(state["student"]["det2d"], opt2,
                                       vb, pseudo, jnp.int32(0), key))
        time_phase("ema", lambda: je(state["teacher"],
                                     {"det3d": v3, "det2d": v2},
                                     jnp.int32(0)))

    # chained timing of full iterations
    st, q3, q2 = state, opt3, opt2
    iters = 5
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            st, q3, q2, l3, l2 = one_iter(st, q3, q2, jnp.int32(i), key)
        jax.block_until_ready(l3["loss"])
        d = (time.perf_counter() - t0) / iters
        best = d if best is None else min(best, d)
    print(f"SSL step: {best * 1e3:.0f} ms/iter -> "
          f"{1.0 / best:.2f} iters/s (batch {B}+{B})", flush=True)
    print(f"samples/s: {(2 * B) / best:.1f}", flush=True)


if __name__ == "__main__":
    import sys
    main(per_phase="--phases" in sys.argv)


def phase_timing():
    """Per-phase chained timing (run after main() compiles everything —
    invoked with PHASES=1)."""
    main(per_phase=True)
