"""Supervised pretraining loops — 3D-only (PV-RCNN, AdamW + cyclic LR) and
2D-only (Faster R-CNNN, SGD + step LR), mirroring the reference's
``pretrain_pvrcnn`` / ``pretrain_frcnn`` recipes
(``configs/detmatch/001/pretrain_*/split_0.py``).
"""
from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.pvrcnn.pvrcnn import PVRCNN
from ..models.frcnn.faster_rcnn import FasterRCNN
from ..data.loader import Loader
from ..train import checkpoints
from ..train.optim import (adamw, cyclic_lr, sgd_momentum, warmup_step_lr)
from ..train.ssl_step import voxelize_views
from ..utils.logging import JsonlLogger


def train_pvrcnn(model: PVRCNN, vox_spec, dataset, collate_fn, work_dir,
                 max_iters, base_lr=0.001, batch_size=2, mesh=None,
                 log_interval=10, ckpt_interval=None, seed=0):
    """3D pretrain: AdamW (betas .95/.99, wd .01) + one-cycle LR
    (``pretrain_pvrcnn/split_0.py:320-346``), grad clip 10."""
    from .train_ssl import make_mesh
    os.makedirs(work_dir, exist_ok=True)
    logger = JsonlLogger(os.path.join(work_dir, "log.json"))
    mesh = mesh or make_mesh()
    ckpt_interval = ckpt_interval or max_iters

    loader = Loader(dataset, batch_size, collate_fn, seed=seed)
    it_loader = iter(loader)
    first = _vox(next(it_loader), vox_spec)
    key = jax.random.PRNGKey(seed)
    variables = model.init({"params": key, "sampling": key, "dropout": key},
                           first, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    lr_fn = cyclic_lr(base_lr, max_iters)
    tx = optax.chain(optax.clip_by_global_norm(10.0), adamw(lr_fn))
    opt_state = tx.init(params)

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    def step(params, batch_stats, opt_state, batch, rng):
        batch = _vox_inner(batch, vox_spec)

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, batch,
                train=True, rngs={"sampling": rng, "dropout": rng},
                mutable=["batch_stats"])
            losses = model.apply({"params": p, "batch_stats": batch_stats},
                                 out, batch, method=PVRCNN.loss)
            return losses["loss"], (losses, mut["batch_stats"])

        (loss, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, upd), new_bs, new_opt, losses)

    jstep = jax.jit(step, in_shardings=(repl, repl, repl, shard, None),
                    out_shardings=(repl, repl, repl, repl))
    params = jax.device_put(params, repl)
    batch_stats = jax.device_put(batch_stats, repl)
    opt_state = jax.device_put(opt_state, repl)

    t0 = time.perf_counter()
    with mesh:
        for it in range(max_iters):
            batch = jax.device_put(
                jax.tree.map(jnp.asarray, next(it_loader)), shard)
            rng = jax.random.fold_in(key, it)
            params, batch_stats, opt_state, losses = jstep(
                params, batch_stats, opt_state, batch, rng)
            if (it + 1) % log_interval == 0:
                entry = {k: float(v) for k, v in
                         jax.device_get(losses).items()}
                entry.update(iter=it + 1, mode="train",
                             time=(time.perf_counter() - t0) / log_interval)
                logger.log(entry)
                t0 = time.perf_counter()
            if (it + 1) % ckpt_interval == 0:
                checkpoints.save(
                    os.path.join(work_dir, "ckpt"),
                    dict(model=jax.device_get(
                        {"params": params, "batch_stats": batch_stats})),
                    it + 1)
    loader.stop()
    return {"params": params, "batch_stats": batch_stats}


def train_frcnn(model: FasterRCNN, dataset, collate_fn, work_dir,
                max_iters, base_lr=0.02, batch_size=2, mesh=None,
                step_iters=(), log_interval=10, ckpt_interval=None,
                seed=0):
    """2D pretrain: SGD momentum .9 wd 1e-4, step LR with warmup
    (``pretrain_frcnn/split_0.py:185-198``)."""
    from .train_ssl import make_mesh
    os.makedirs(work_dir, exist_ok=True)
    logger = JsonlLogger(os.path.join(work_dir, "log.json"))
    mesh = mesh or make_mesh()
    ckpt_interval = ckpt_interval or max_iters

    loader = Loader(dataset, batch_size, collate_fn, seed=seed)
    it_loader = iter(loader)
    first = jax.tree.map(jnp.asarray, next(it_loader))
    key = jax.random.PRNGKey(seed)
    variables = model.init({"params": key}, first["img"],
                           first["img_shape"], train=True)
    params = variables["params"]
    frozen = variables["frozen"]

    lr_fn = warmup_step_lr(base_lr, step_iters=step_iters)
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     sgd_momentum(lr_fn))
    opt_state = tx.init(params)

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            fwd = model.apply({"params": p, "frozen": frozen},
                              batch["img"], batch["img_shape"], train=True)
            losses = model.apply({"params": p, "frozen": frozen}, rng, fwd,
                                 batch["gt_boxes2d"], batch["gt_labels2d"],
                                 batch["gt2d_valid"],
                                 method=FasterRCNN.loss)
            return sum(losses.values()), losses

        (loss, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), new_opt, losses

    jstep = jax.jit(step, in_shardings=(repl, repl, shard, None),
                    out_shardings=(repl, repl, repl))
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)

    t0 = time.perf_counter()
    with mesh:
        for it in range(max_iters):
            batch = jax.device_put(
                jax.tree.map(jnp.asarray, next(it_loader)), shard)
            params, opt_state, losses = jstep(
                params, opt_state, batch, jax.random.fold_in(key, it))
            if (it + 1) % log_interval == 0:
                entry = {k: float(v) for k, v in
                         jax.device_get(losses).items()}
                entry["loss"] = sum(entry.values())
                entry.update(iter=it + 1, mode="train",
                             time=(time.perf_counter() - t0) / log_interval)
                logger.log(entry)
                t0 = time.perf_counter()
            if (it + 1) % ckpt_interval == 0:
                checkpoints.save(
                    os.path.join(work_dir, "ckpt"),
                    dict(model=jax.device_get(
                        {"params": params, "frozen": frozen})), it + 1)
    loader.stop()
    return {"params": params, "frozen": frozen}


def _vox(batch_np, spec):
    batch = jax.tree.map(jnp.asarray, batch_np)
    return _vox_inner(batch, spec)


def _vox_inner(batch, spec):
    from ..ops import voxelize
    vox = jax.vmap(lambda p, v: voxelize.voxelize_mean(p, v, spec))(
        batch["points"], batch["points_valid"])
    return dict(batch, voxel_features=vox["features"],
                voxel_keys=vox["keys"])
