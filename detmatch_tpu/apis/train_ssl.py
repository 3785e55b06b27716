"""SSL training loop (reference ``apis/ssl_train.py`` +
``IterBasedSSLRunner``): one labeled + one unlabeled batch per iteration,
jitted fused step (loss/grads/optimizer/EMA), data-parallel over a mesh,
iter-based logging/checkpointing, final evaluation fanout.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.loader import Loader
from ..parallel import is_primary, put_global_batch, put_replicated
from ..train import checkpoints
from ..train.optim import detmatch_branch_optimizers
from ..train.ssl_step import make_ssl_train_fns_split
from ..utils.logging import JsonlLogger


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("data",))


def _dump_vis(work_dir, step, vbatch, pseudo):
    """Training-loop visualization (the reference's Vis3D / Vis2D_Kitti
    consumers feeding WandbVisHook, ``ssl_modules/consumers/visualize.py``
    + ``core/utils/wandb_vis_hook.py``): renders the unlabeled sample's
    BEV pseudo-labels and 2D pseudo-boxes to PNGs under work_dir/vis
    (no wandb in this environment — files instead)."""
    import numpy as np
    from PIL import Image
    from ..utils import visualize as V

    out_dir = os.path.join(work_dir, "vis")
    os.makedirs(out_dir, exist_ok=True)
    u = jax.device_get(jax.tree.map(lambda x: x[:1],
                                    vbatch["unlab"]["stu"]))
    p = jax.device_get(jax.tree.map(lambda x: x[:1], pseudo))
    pts = u["points"][0][u["points_valid"][0]]
    if "m3d_stu" in p:
        m3 = p["m3d_stu"]
        boxes = m3["boxes"][0][np.asarray(m3["valid"][0])]
        canvas = V.bev_canvas(pts, [boxes])
        Image.fromarray(canvas).save(
            os.path.join(out_dir, f"iter{step:06d}_bev.png"))
    if "m2d_stu" in p and "img" in u:
        img = V.denormalize_caffe(u["img"][0]).astype(np.uint8)
        m2 = p["m2d_stu"]
        img = V.draw_boxes_2d(np.ascontiguousarray(img), m2["boxes"][0],
                              valid=np.asarray(m2["valid"][0]))
        Image.fromarray(img[:, :, ::-1]).save(
            os.path.join(out_dir, f"iter{step:06d}_2d.png"))
    if ("m3d_stu" in p and "m2d_stu" in p and "img" in u
            and "lidar2img" in u):
        # fusion-matched pair canvas (reference Vis2D_Kitti,
        # consumers/visualize.py:40-310): m3d_stu[i] ↔ m2d_stu[i]
        m3, m2 = p["m3d_stu"], p["m2d_stu"]
        img = V.denormalize_caffe(u["img"][0]).astype(np.uint8)
        pair = V.matched_pair_canvas(
            np.ascontiguousarray(img), m3["boxes"][0], m2["boxes"][0],
            np.asarray(m3["valid"][0]) & np.asarray(m2["valid"][0]),
            u["lidar2img"][0], u["img_shape"][0],
            scores3d=np.asarray(m3["scores"][0]),
            scores2d=np.asarray(m2["scores"][0]))
        Image.fromarray(pair[:, :, ::-1]).save(
            os.path.join(out_dir, f"iter{step:06d}_pairs.png"))


def train_ssl(ssl, vox_spec, lab_dataset, unlab_dataset, collate_fn,
              work_dir, max_iters=5000, batch_size=4, lr_3d=None,
              lr_2d=None, lr_scale=1.0, num_unlabeled=1, log_interval=10,
              ckpt_interval=5000, seed=0, mesh: Optional[Mesh] = None,
              resume_from: Optional[str] = None, warmup_iters=500,
              load_from: Dict[str, str] = None,
              load_from_with_optimizer: Optional[str] = None,
              val_dataset=None, val_collate_fn=None, eval_interval=None,
              profile_dir: Optional[str] = None, vis_interval=None,
              tensorboard=False, ckpt_meta: Optional[Dict] = None):
    """Run DetMatch SSL training.

    LR autoscaling follows the reference recipe (``split_0.py:824-827``):
    lr_3d = 1e-3/2 · bs · (1 + U) · 10, lr_2d = 2e-2/2 · bs · (1 + U).
    """
    os.makedirs(work_dir, exist_ok=True)
    logger = JsonlLogger(os.path.join(work_dir, "log.json"))
    if tensorboard:
        from ..utils.logging import MultiLogger, TensorBoardSink
        logger = MultiLogger(logger, TensorBoardSink(
            os.path.join(work_dir, "tb")))
    mesh = mesh or make_mesh()
    if lr_3d is None:
        lr_3d = 1e-3 / 2 * batch_size * (1 + num_unlabeled) * 10
    if lr_2d is None:
        lr_2d = 2e-2 / 2 * batch_size * (1 + num_unlabeled)
    # --autoscale-lr (reference tools/train.py:124-132): applied AFTER
    # the batch-size recipe so it also scales the derived defaults
    lr_3d, lr_2d = lr_3d * lr_scale, lr_2d * lr_scale

    # per-process loaders: under multi-host each process draws its own
    # samples (disjoint by seed) and feeds its local shard of the global
    # batch; batch_size is per-process, like the reference's per-GPU
    # samples_per_gpu under DDP
    proc_seed = seed + jax.process_index() * 9973
    lab_loader = Loader(lab_dataset, batch_size, collate_fn, seed=proc_seed)
    unlab_loader = Loader(unlab_dataset, batch_size * num_unlabeled,
                          collate_fn, seed=proc_seed + 1)
    lab_iter, unlab_iter = iter(lab_loader), iter(unlab_loader)

    # init from a first batch — on CPU: full-size init on the accelerator
    # costs a throwaway compile of the whole forward (~tens of minutes via
    # remote-compile tunnels), while CPU init is seconds and the params are
    # transferred once
    first = dict(lab=next(lab_iter), unlab=next(unlab_iter))
    from ..train.ssl_step import voxelize_views
    key = jax.random.PRNGKey(seed)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        vfirst = voxelize_views(jax.tree.map(jnp.asarray, first), vox_spec)
        state = ssl.init_states(key, vfirst["lab"]["stu"],
                                vfirst["lab"]["stu"]["img"],
                                vfirst["lab"]["stu"]["img_shape"])
    tx3d, tx2d = detmatch_branch_optimizers(lr_3d, lr_2d,
                                            warmup_iters=warmup_iters)
    opt_state = dict(
        det3d=tx3d.init(state["student"]["det3d"]["params"]),
        det2d=tx2d.init(state["student"]["det2d"]["params"]))

    start_iter = 0
    if resume_from:
        step_n = checkpoints.latest_step(resume_from)
        payload = checkpoints.restore(resume_from, step_n,
                                      dict(state=state,
                                           opt_state=opt_state))
        state, opt_state = payload["state"], payload["opt_state"]
        start_iter = step_n
    elif load_from_with_optimizer:
        # bootstrapped resume (reference apis/ssl_train.py:157-166):
        # model + optimizer restored, iteration counter reset
        payload, start_iter = checkpoints.load_from_with_optimizer(
            load_from_with_optimizer,
            dict(state=state, opt_state=opt_state))
        state, opt_state = payload["state"], payload["opt_state"]
    elif load_from:
        for det_key, path in load_from.items():
            step_n = checkpoints.latest_step(path)
            tmpl = state["student"][det_key]
            pre = checkpoints.restore(path, step_n, dict(model=tmpl))
            state = checkpoints.load_pretrained_into_ssl(
                state, pre["model"], det_key)

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    teacher_fn, stu3d_fn, stu2d_fn, ema_fn = make_ssl_train_fns_split(
        ssl, tx3d, tx2d, vox_spec)
    # each phase is its own modest XLA program (fused SSL steps can exceed
    # compiler-service memory); outputs keep propagated shardings
    # student vars/opt and the pre-EMA teacher are donated: successive
    # iterations recycle those buffers in place instead of queueing
    # fresh allocations (at production shapes two in-flight iterations
    # exceed HBM)
    teacher_jit = jax.jit(teacher_fn, in_shardings=(repl, shard))
    stu3d_jit = jax.jit(stu3d_fn, in_shardings=(repl, repl, None, None,
                                                None, None),
                        out_shardings=(repl, repl, repl),
                        donate_argnums=(0, 1))
    stu2d_jit = jax.jit(stu2d_fn, in_shardings=(repl, repl, None, None,
                                                None, None),
                        out_shardings=(repl, repl, repl),
                        donate_argnums=(0, 1))
    ema_jit = jax.jit(ema_fn, in_shardings=(repl, repl, None),
                      out_shardings=repl, donate_argnums=(0,))
    # jitted ONCE: building this inside the loop leaked a fresh traced
    # program every iteration (~MB/iter of host-side executable cache)
    # and issued one remote compile per step through the compile tunnel,
    # which reproducibly hung the tunnel client after ~950 iterations
    dropped_jit = jax.jit(
        lambda vb: sum(jnp.sum(v["voxel_dropped"])
                       for views in vb.values()
                       for v in views.values()),
        out_shardings=repl)
    state = put_replicated(state, repl)
    opt_state = put_replicated(opt_state, repl)

    t0 = time.perf_counter()
    with mesh:
        for it in range(start_iter, max_iters):
            if profile_dir and it == start_iter + 12:
                jax.profiler.start_trace(profile_dir)
            batch = dict(lab=next(lab_iter), unlab=next(unlab_iter))
            batch = put_global_batch(batch, shard)
            rng = jax.random.fold_in(key, it)
            r3, r2 = jax.random.split(rng)
            pseudo, vbatch = teacher_jit(state["teacher"], batch)
            d3, opt3, logs3 = stu3d_jit(
                state["student"]["det3d"], opt_state["det3d"], vbatch,
                pseudo, jnp.int32(it), r3)
            d2, opt2, logs2 = stu2d_jit(
                state["student"]["det2d"], opt_state["det2d"], vbatch,
                pseudo, jnp.int32(it), r2)
            student = dict(det3d=d3, det2d=d2)
            teacher = ema_jit(state["teacher"], student, jnp.int32(it))
            state = dict(student=student, teacher=teacher)
            opt_state = dict(det3d=opt3, det2d=opt2)
            logs = dict(logs3)
            logs.update({k: v for k, v in logs2.items() if k != "loss"})
            logs["loss"] = logs3["loss"] + logs2["loss"]
            # capacity-cap accounting: occupied voxels cut by max_voxels
            # across all four views this iter (0 in healthy configs; a
            # sustained non-zero rate means the cap is eating geometry).
            # jitted with a replicated output so the count of a globally
            # sharded batch is readable on every host process
            logs["metrics.dropped_voxels"] = dropped_jit(vbatch)
            if profile_dir and it == start_iter + 15:
                jax.block_until_ready(logs)
                jax.profiler.stop_trace()
            if (it + 1) % log_interval == 0 and is_primary():
                logs = jax.device_get(logs)
                dt = time.perf_counter() - t0
                entry = {k: float(v) for k, v in logs.items()}
                entry.update(iter=it + 1,
                             time=dt / log_interval, mode="train")
                logger.log(entry)
                t0 = time.perf_counter()
            if vis_interval and (it + 1) % vis_interval == 0 \
                    and is_primary() and jax.process_count() == 1:
                # vis slices device arrays host-side; under multi-host
                # the first samples live on process 0's devices only when
                # it produced them — skip rather than gather over DCN
                _dump_vis(work_dir, it + 1, vbatch, pseudo)
            if ((it + 1) % ckpt_interval == 0 or (it + 1) == max_iters) \
                    and is_primary():
                checkpoints.save(
                    os.path.join(work_dir, "ckpt"),
                    dict(state=jax.device_get(state),
                         opt_state=jax.device_get(opt_state)), it + 1,
                    meta=checkpoints.default_meta(
                        **(ckpt_meta or {}), iter=it + 1))
            if (eval_interval and val_dataset is not None and is_primary()
                    and ((it + 1) % eval_interval == 0
                         or (it + 1) == max_iters)):
                from .evaluate import eval_ssl
                res = eval_ssl(ssl, jax.device_get(state), val_dataset,
                               val_collate_fn or collate_fn, vox_spec)
                entry = dict(res)
                entry.update(iter=it + 1, mode="val")
                logger.log(entry)
    lab_loader.stop()
    unlab_loader.stop()
    return state
