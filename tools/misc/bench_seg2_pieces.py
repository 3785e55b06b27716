"""Piecewise timing of the stu3d 'heads' segment (seg2) at production
shapes — localizes the post-backbone cost of the SSL step (the dominant
phase per ``bench_ssl_step.py --phases``).

Pieces (each jitted alone, chained timing, fwd and fwd+bwd):
  bev+anchor   height_compression + BaseBEVBackbone + AnchorHead + decode
  vsa          VoxelSetAbstraction (FPS + ball query + SA MLPs)
  proposal     proposal_layer NMS over decoded anchors
  assign       RoI target assignment (train sampling)
  roi_head     RoI-grid pool + shared FCs + cls/reg
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

from detmatch_tpu.models.pvrcnn.pvrcnn import (PVRCNN, TRAIN_NMS,
                                               proposal_layer)
from detmatch_tpu.models.pvrcnn.roi_head import PVRCNNHead
from detmatch_tpu.ops import voxelize

PCR = (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)
B = 8  # concat student batch (4 lab + 4 unlab)
P = 18000

PV_CFG = dict(
    num_classes=3, point_cloud_range=PCR, voxel_size=(0.05, 0.05, 0.1),
    grid_size=(1408, 1600, 40), num_keypoints=2048,
    backbone_caps=(16000, 12000, 9000, 9000),
    train_nms=dict(nms_pre=1024, nms_post=128, nms_thresh=0.8),
    test_nms=dict(nms_pre=1024, nms_post=100, nms_thresh=0.7),
    compute_dtype=jnp.bfloat16)
SPEC = voxelize.VoxelizerSpec(point_cloud_range=PCR,
                              voxel_size=(0.05, 0.05, 0.1),
                              max_voxels=16000, max_points=5)


def chained(name, fn, x, *args, iters=5, grad=False):
    if grad:
        base = fn

        def fg(x, *a):
            leaves, treedef = jax.tree.flatten(x)
            isf = [jnp.issubdtype(l.dtype, jnp.floating) for l in leaves]
            fl = [l for l, f in zip(leaves, isf) if f]

            def lossf(fl_):
                it = iter(fl_)
                merged = [next(it) if f else l
                          for l, f in zip(leaves, isf)]
                out = base(jax.tree.unflatten(treedef, merged), *a)
                return jax.tree.reduce(jnp.add, jax.tree.map(
                    lambda l: jnp.sum(l.astype(jnp.float32)), out))
            return jax.grad(lossf)(fl)
        fn = fg
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    out = jfn(x, *args)
    jax.block_until_ready(out)
    print(f"[compile {name}: {time.perf_counter() - t0:.0f}s]", flush=True)

    def leaf0(t):
        return next(l for l in jax.tree.leaves(t)
                    if jnp.issubdtype(l.dtype, jnp.floating))

    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        xx = x
        for _ in range(iters):
            out = jfn(xx, *args)
            xx = jax.tree.map(
                lambda l: (l + 0.0 * jnp.sum(leaf0(out)).astype(l.dtype)
                           if jnp.issubdtype(l.dtype, jnp.floating) else l),
                x)
        jax.block_until_ready(xx)
        d = (time.perf_counter() - t0) / iters
        best = d if best is None else min(best, d)
    print(f"{name:<22} {best * 1e3:8.1f} ms", flush=True)
    return best


def main():
    rng = np.random.RandomState(0)
    from detmatch_tpu.utils.synth_kitti import lidar_batch
    pts, pvalid = lidar_batch(rng, B, P, PCR)
    pts = jnp.asarray(pts)
    pvalid = jnp.asarray(pvalid)
    vox = jax.vmap(lambda p, v: voxelize.voxelize_mean(p, v, SPEC))(
        pts, pvalid)

    gt = np.zeros((B, 40, 8), np.float32)
    gt[:, :20, 0] = rng.rand(B, 20) * 60 + 3
    gt[:, :20, 1] = rng.rand(B, 20) * 70 - 35
    gt[:, :20, 2] = -1.0
    gt[:, :20, 3:6] = [3.9, 1.6, 1.56]
    gt[:, :20, 6] = rng.rand(B, 20) - 0.5
    gt[:, :20, 7] = rng.randint(1, 4, (B, 20))
    gt = jnp.asarray(gt)

    model = PVRCNN(**PV_CFG)
    batch = dict(points=pts, points_valid=pvalid, gt_boxes=gt,
                 voxel_features=vox["features"], voxel_keys=vox["keys"])
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    variables = jax.jit(lambda k, b: model.init(
        {"params": k, "sampling": k, "dropout": k}, b, train=True))(
        key, batch)
    jax.block_until_ready(variables)
    print(f"[init {time.time() - t0:.0f}s]", flush=True)
    params = variables["params"]

    # backbone once (not timed here)
    bb = jax.jit(lambda v, b: model.apply(
        v, b["voxel_features"], b["voxel_keys"], train=True,
        mutable=["batch_stats"],
        method=lambda m, f, k, train: m.backbone3d(f, k, train=train)))
    ms, _ = bb(variables, batch)
    jax.block_until_ready(ms)
    print("[backbone done]", flush=True)

    # split static meta (shape/stride tuples) from traced arrays so the
    # jitted pieces don't trace concrete shapes; the jitted backbone
    # returned the tuples as device arrays, so rebuild them from config
    from detmatch_tpu.models.pvrcnn.backbone3d import static_level_meta
    gz = PV_CFG["grid_size"]
    ms_meta = static_level_meta((gz[2] + 1, gz[1], gz[0]))
    META_KEYS = ("shape", "stride")
    ms = {k: {mk: mv for mk, mv in v.items() if mk not in META_KEYS}
          for k, v in ms.items()}

    def remeta(ms_):
        return {k: dict(v, **ms_meta[k]) for k, v in ms_.items()}

    from detmatch_tpu.models.pvrcnn.bev import height_compression

    # ---- piece: height_compression + BEV + anchor head + decode
    def bev_anchor(v, ms):
        ms = remeta(ms)
        def run(m, ms):
            sp = height_compression(ms["out"])
            bev = m.bev_backbone(sp, train=True)
            hp = m.anchor_head(bev)
            bp, cp = m.anchor_head.decode_boxes(hp)
            return dict(bp=bp, cp=cp, sp=sp)
        out, _ = model.apply(v, ms, train=True, mutable=["batch_stats"],
                             method=lambda m, ms, train: run(m, ms))
        return out

    o = bev_anchor(variables, ms)
    sp = o["sp"]
    bp, cp = o["bp"], o["cp"]
    chained("bev+anchor fwd", lambda ms_: bev_anchor(variables, ms_), ms)
    chained("bev+anchor fwd+bwd", lambda ms_: bev_anchor(variables, ms_),
            ms, grad=True)

    # ---- piece: VSA
    def vsa(v, sp, ms):
        ms = remeta(ms)
        def run(m, sp, ms):
            return m.vsa(pts, pvalid, sp, ms, train=True)
        out, _ = model.apply(v, sp, ms, train=True,
                             mutable=["batch_stats"],
                             method=lambda m, sp, ms, train: run(m, sp, ms))
        return out

    vo = vsa(variables, sp, ms)
    chained("vsa fwd", lambda sp_: vsa(variables, sp_, ms), sp)
    chained("vsa fwd+bwd", lambda sp_: vsa(variables, sp_, ms), sp,
            grad=True)

    # ---- piece: proposal NMS
    chained("proposal nms", lambda bp_: proposal_layer(
        bp_, cp, **PV_CFG["train_nms"]), bp)
    props = jax.jit(lambda bp_: proposal_layer(
        bp_, cp, **PV_CFG["train_nms"]))(bp)

    # ---- piece: target assignment
    def assign(props_):
        return model.apply(
            variables, props_, gt, train=True,
            rngs={"sampling": key},
            method=lambda m, p, g, train: m.roi_head.assign_targets(
                m.make_rng("sampling"), p, g))
    chained("roi assign", assign, props)
    targets = jax.jit(assign)(props)

    # ---- piece: RoI head
    def roi(v, pf):
        out, _ = model.apply(
            v, pf, train=True, mutable=["batch_stats"],
            rngs={"dropout": key},
            method=lambda m, pf, train: m.roi_head(
                targets["rois"], vo["keypoints"], vo["kp_valid"], pf,
                jax.nn.sigmoid(vo["point_features"][..., 0]) * 0 + 0.5,
                train=True))
        return out
    chained("roi head fwd", lambda pf: roi(variables, pf),
            vo["point_features"])
    chained("roi head fwd+bwd", lambda pf: roi(variables, pf),
            vo["point_features"], grad=True)


if __name__ == "__main__":
    if os.environ.get("LOSSES"):
        main_losses()
    else:
        main()


def main_losses():
    """The loss-side pieces main() doesn't cover: anchor targets +
    losses, point head, box decode (run with LOSSES=1)."""
    rng = np.random.RandomState(0)
    from detmatch_tpu.utils.synth_kitti import lidar_batch
    pts, pvalid = lidar_batch(rng, B, P, PCR)
    pts = jnp.asarray(pts)
    pvalid = jnp.asarray(pvalid)
    vox = jax.vmap(lambda p, v: voxelize.voxelize_mean(p, v, SPEC))(
        pts, pvalid)
    gt = np.zeros((B, 40, 8), np.float32)
    gt[:, :20, 0] = rng.rand(B, 20) * 60 + 3
    gt[:, :20, 1] = rng.rand(B, 20) * 70 - 35
    gt[:, :20, 2] = -1.0
    gt[:, :20, 3:6] = [3.9, 1.6, 1.56]
    gt[:, :20, 6] = rng.rand(B, 20) - 0.5
    gt[:, :20, 7] = rng.randint(1, 4, (B, 20))
    gt = jnp.asarray(gt)
    model = PVRCNN(**PV_CFG)
    batch = dict(points=pts, points_valid=pvalid, gt_boxes=gt,
                 voxel_features=vox["features"], voxel_keys=vox["keys"])
    key = jax.random.PRNGKey(0)
    variables = jax.jit(lambda k, b: model.init(
        {"params": k, "sampling": k, "dropout": k}, b, train=True))(
        key, batch)
    jax.block_until_ready(variables)
    print("[init done]", flush=True)

    # full fwd once for realistic head_preds
    out, _ = jax.jit(lambda v, b: model.apply(
        v, b, train=True, rngs={"sampling": key, "dropout": key},
        mutable=["batch_stats"]))(variables, batch)
    jax.block_until_ready(out)
    hp = out["head_preds"]

    def ap(fn):
        return lambda *a: model.apply(variables, *a, method=fn)

    chained("anchor targets", lambda g: model.apply(
        variables, g, method=lambda m, g: m.anchor_head.targets(g)), gt)
    tg = jax.jit(lambda g: model.apply(
        variables, g, method=lambda m, g: m.anchor_head.targets(g)))(gt)
    chained("anchor loss", lambda hp_: model.apply(
        variables, hp_, tg, method=lambda m, h, t: m.anchor_head.loss(
            h, t)), hp)
    chained("anchor loss fwd+bwd", lambda hp_: model.apply(
        variables, hp_, tg, method=lambda m, h, t: m.anchor_head.loss(
            h, t)), hp, grad=True)
    chained("decode boxes", lambda hp_: model.apply(
        variables, hp_, method=lambda m, h: m.anchor_head.decode_boxes(
            h)), hp)
    from detmatch_tpu.models.pvrcnn.point_head import PointHeadSimple
    kp = out["keypoints"]
    chained("pt-head targets+loss", lambda kp_: model.apply(
        variables, kp_, method=lambda m, k_: PointHeadSimple.loss(
            out["point_logits"],
            m.point_head.targets(k_, out["kp_valid"], gt))), kp)
