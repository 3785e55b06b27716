"""Per-stage timing of the PV-RCNN forward on the real chip.

Each stage is jitted separately and timed with chained iterations
(output feeds next input) to defeat async-dispatch overlap, mirroring
bench.py methodology. Prints a ms-per-call table.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
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

import __graft_entry__ as g
from detmatch_tpu.models.pvrcnn.pvrcnn import PVRCNN, post_processing
from detmatch_tpu.models.pvrcnn import pvrcnn as pvmod
from detmatch_tpu.ops import pointnet


def timeit(fn, *args, iters=10, name=""):
    """Chained timing: iteration i+1's first float leaf is perturbed by a
    scalar of iteration i's output, so the tunnel can't overlap/dedupe
    executions (block_until_ready alone under-measures on axon)."""
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    out = jfn(*args)
    jax.block_until_ready(out)
    print(f"[compile {name}: {time.perf_counter() - t0:.1f}s]", flush=True)

    leaves0 = jax.tree.leaves(args[0])
    f_idx = next(i for i, l in enumerate(leaves0)
                 if jnp.issubdtype(l.dtype, jnp.floating))

    def perturb(a0, out):
        s = 0.0
        for l in jax.tree.leaves(out):
            s = s + l.reshape(-1)[0].astype(jnp.float32)
            break
        leaves = list(jax.tree.leaves(a0))
        leaves[f_idx] = leaves[f_idx] + 0.0 * s.astype(leaves[f_idx].dtype)
        return jax.tree.unflatten(jax.tree.structure(a0), leaves)

    best = None
    for _ in range(3):
        a = args[0]
        t0 = time.perf_counter()
        for _ in range(iters):
            o = jfn(a, *args[1:])
            a = perturb(args[0], o)
        jax.block_until_ready(a)
        d = (time.perf_counter() - t0) / iters
        best = d if best is None else min(best, d)
    print(f"{name:<20} {best * 1e3:>8.2f} ms", flush=True)
    return best * 1e3


def main():
    model = PVRCNN(**g.ENTRY_CFG)
    batch = g._make_batch(g.ENTRY_CFG, b=1, p=8192, max_voxels=12000)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key}, batch, train=False)

    full = jax.jit(lambda b: model.apply(variables, b, train=False))
    out = full(batch)
    jax.block_until_ready(out)

    rows = []

    # stage 1: backbone3d
    def s_backbone(b):
        return model.apply(variables, b["voxel_features"], b["voxel_keys"],
                           method=lambda m, vf, vk: m.backbone3d(vf, vk))
    ms_feats = s_backbone(batch)
    rows.append(("backbone3d", timeit(s_backbone, batch, name="backbone3d")))

    # stage 2: BEV backbone + anchor head decode
    from detmatch_tpu.models.pvrcnn.bev import height_compression

    ARR = ("feats", "keys", "mask")

    def split_ms(ms):
        arrays = {k: {kk: vv for kk, vv in lv.items() if kk in ARR}
                  for k, lv in ms.items()}
        statics = {k: {kk: vv for kk, vv in lv.items() if kk not in ARR}
                   for k, lv in ms.items()}
        return arrays, statics

    ms_arr, ms_static = split_ms(ms_feats)

    def join_ms(arrays):
        return {k: dict(arrays[k], **ms_static[k]) for k in arrays}

    def s_bev(ms_a):
        ms = join_ms(ms_a)

        def run(m, ms):
            sf = height_compression(ms["out"])
            bev = m.bev_backbone(sf)
            hp = m.anchor_head(bev)
            return m.anchor_head.decode_boxes(hp)
        return model.apply(variables, ms, method=run)
    box_preds, cls_preds = s_bev(ms_arr)
    rows.append(("bev+anchor_head", timeit(s_bev, ms_arr, name="bev+anchor_head")))

    # stage 3: FPS only
    def s_fps(b):
        return jax.vmap(pointnet.farthest_point_sample, (0, 0, None))(
            b["points"][..., :3], b["points_valid"],
            model.num_keypoints)
    rows.append(("vsa.fps", timeit(s_fps, batch, name="vsa.fps")))

    # stage 4: full VSA
    def s_vsa(b, ms_a):
        ms = join_ms(ms_a)

        def run(m, b, ms):
            sf = height_compression(ms["out"])
            return m.vsa(b["points"], b["points_valid"], sf, ms)
        return model.apply(variables, b, ms, method=run)
    vsa_out = s_vsa(batch, ms_arr)
    rows.append(("vsa.total", timeit(s_vsa, batch, ms_arr, name="vsa.total")))

    # stage 5: proposal NMS
    nms_cfg = dict(model.test_nms or pvmod.TEST_NMS)

    def s_prop(bp, cp):
        return pvmod.proposal_layer(bp, cp, **nms_cfg)
    props = s_prop(box_preds, cls_preds)
    rows.append(("proposal_nms", timeit(s_prop, box_preds, cls_preds, name="proposal_nms")))

    # stage 6: roi head
    point_scores = jax.nn.sigmoid(
        model.apply(variables, vsa_out["point_features_before_fusion"],
                    vsa_out["kp_valid"],
                    method=lambda m, x, v: m.point_head(x, v))[..., 0])

    def s_roi(rois, vs, ps):
        def run(m, rois, vs, ps):
            return m.roi_head(rois, vs["keypoints"], vs["kp_valid"],
                              vs["point_features"], ps)
        return model.apply(variables, rois, vs, ps, method=run)
    rows.append(("roi_head", timeit(s_roi, props["rois"], vsa_out,
                                    point_scores, name="roi_head")))

    # stage 7: post-processing NMS
    def s_post(o):
        return post_processing(o)
    rows.append(("post_nms", timeit(s_post, out, name="post_nms")))

    rows.append(("FULL forward", timeit(
        lambda b: model.apply(variables, b, train=False), batch,
        name="FULL forward")))

    print(f"{'stage':<20} {'ms':>8}")
    for name, ms in rows:
        print(f"{name:<20} {ms:>8.2f}")


if __name__ == "__main__":
    main()
