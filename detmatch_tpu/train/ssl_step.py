"""Jitted SSL training step: loss → grads (student only) → hybrid optimizer
→ EMA teacher update — one fused on-device program, data-parallel over a
mesh (the reference's IterBasedSSLRunner.train + DDP + OptimizerHook +
ModelIterEpochHook + _update_teacher collapse into this single function).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..ops import voxelize
from ..ssl.detector import (SSLDetector, ema_decay_at, ema_update,
                            ssl_weight_at)


def voxelize_views(batch, spec):
    """Add voxel_features/voxel_keys to every view (device-side).

    Also carries ``voxel_dropped`` (per-sample count of occupied voxels
    cut by the ``max_voxels`` capacity) so the train loop can log the
    truncation rate instead of silently capping.
    """
    def add(view):
        vox = jax.vmap(lambda p, v: voxelize.voxelize_mean(p, v, spec))(
            view["points"], view["points_valid"])
        return dict(view, voxel_features=vox["features"],
                    voxel_keys=vox["keys"],
                    voxel_dropped=vox["num_dropped_voxels"])

    return {split: {k: add(v) for k, v in views.items()}
            for split, views in batch.items()}


def make_ssl_train_step(ssl: SSLDetector, tx: optax.GradientTransformation,
                        vox_spec: voxelize.VoxelizerSpec):
    """Build the jittable step:
        (state, opt_state, batch, it, rng) → (state, opt_state, logs)."""

    def step(state, opt_state, batch, it, rng):
        batch = voxelize_views(batch, vox_spec)

        def loss_fn(student):
            full_state = dict(state, student=student)
            total, aux = ssl.forward_train(full_state, batch, it, rng)
            return total, aux

        grad_fn = jax.value_and_grad(
            lambda sp: loss_fn(_merge_params(state["student"], sp)),
            has_aux=True)
        student_params = _extract_params(state["student"])
        (total, aux), grads = grad_fn(student_params)

        updates, opt_state = tx.update(grads, opt_state, student_params)
        new_params = optax.apply_updates(student_params, updates)
        student = _merge_params(state["student"], new_params)
        # fold updated batch_stats back in
        for det, bs in aux["batch_stats"].items():
            student[det] = dict(student[det], batch_stats=bs)

        decay = ema_decay_at(it, ssl.cfg)
        teacher = ema_update(state["teacher"], student, decay,
                             ssl.cfg.use_student_bn_stats_for_teacher)
        new_state = dict(student=student, teacher=teacher)
        return new_state, opt_state, aux["logs"]

    return step


def make_ssl_train_fns(ssl: SSLDetector, tx: optax.GradientTransformation,
                       vox_spec: voxelize.VoxelizerSpec):
    """Staged step: two separately-jittable functions.

    Very large fused programs (teacher inference + two student train
    passes + grads) can exceed compiler-service memory; the natural split
    is the stop-gradient boundary after teacher pseudo-label generation.

        teacher_fn(teacher_state, batch) → (pseudo, vox_batch)
        student_fn(state, opt_state, vox_batch, pseudo, it, rng)
            → (state, opt_state, logs)
    """

    def teacher_fn(teacher_state, batch):
        batch = voxelize_views(batch, vox_spec)
        return ssl.teacher_pseudo_labels(teacher_state, batch), batch

    def student_fn(state, opt_state, batch, pseudo, it, rng):
        def loss_fn(sp):
            student = _merge_params(state["student"], sp)
            return ssl.student_losses(student, batch, pseudo, it, rng)

        student_params = _extract_params(state["student"])
        (total, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(student_params)
        updates, new_opt = tx.update(grads, opt_state, student_params)
        new_params = optax.apply_updates(student_params, updates)
        student = _merge_params(state["student"], new_params)
        for det, bs in aux["batch_stats"].items():
            student[det] = dict(student[det], batch_stats=bs)
        decay = ema_decay_at(it, ssl.cfg)
        teacher = ema_update(state["teacher"], student, decay,
                             ssl.cfg.use_student_bn_stats_for_teacher)
        return dict(student=student, teacher=teacher), new_opt, \
            aux["logs"]

    return teacher_fn, student_fn


def make_ssl_train_fns_split(ssl: SSLDetector, tx3d, tx2d,
                             vox_spec: voxelize.VoxelizerSpec):
    """Fully staged step: four separately-jittable functions, each a
    modest XLA program (for compiler services that OOM on the fused one).

        teacher_fn(teacher_state, batch) → (pseudo, vbatch)
        stu3d_fn(det3d_vars, opt3d, vbatch, pseudo, it, rng)
            → (det3d_vars, opt3d, logs)
        stu2d_fn(det2d_vars, opt2d, vbatch, pseudo, it, rng)
            → (det2d_vars, opt2d, logs)
        ema_fn(teacher, student, it) → teacher
    """

    def teacher_fn(teacher_state, batch):
        batch = voxelize_views(batch, vox_spec)
        return ssl.teacher_pseudo_labels(teacher_state, batch), batch

    def _branch_fn(tx, loss_method, stats_key, ramp_logs=False):
        def fn(variables, opt_state, batch, pseudo, it, rng):
            def loss_fn(p):
                v = dict(variables, params=p)
                return loss_method(v, batch, pseudo, it, rng)

            (total, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(variables["params"])
            updates, new_opt = tx.update(grads, opt_state,
                                         variables["params"])
            new_params = optax.apply_updates(variables["params"], updates)
            new_vars = dict(variables, params=new_params)
            if stats_key and stats_key in aux.get("batch_stats", {}):
                new_vars["batch_stats"] = aux["batch_stats"][stats_key]
            logs = dict(aux["logs"])
            logs["loss"] = total
            from .optim import SkipNonfiniteState
            if isinstance(new_opt, SkipNonfiniteState):
                logs["grad_skips"] = new_opt.skipped
            if ramp_logs:
                # reference log channels ssl.weight / ssl.ema_decay
                # (ssl.py:331-347); emitted once, from the 3d branch
                logs["ssl.weight"] = ssl_weight_at(it, ssl.cfg)
                logs["ssl.ema_decay"] = ema_decay_at(it, ssl.cfg)
            return new_vars, new_opt, logs
        return fn

    loss3d = (ssl.student_losses_3d_concat
              if ssl.cfg.concat_student_batch else ssl.student_losses_3d)
    stu3d_fn = _branch_fn(tx3d, loss3d, "det3d", ramp_logs=True)
    stu2d_fn = _branch_fn(tx2d, ssl.student_losses_2d, None)

    def ema_fn(teacher, student, it):
        decay = ema_decay_at(it, ssl.cfg)
        return ema_update(teacher, student, decay,
                          ssl.cfg.use_student_bn_stats_for_teacher)

    return teacher_fn, stu3d_fn, stu2d_fn, ema_fn


def make_stu3d_segmented(ssl: SSLDetector, tx3):
    """Student-3d step as THREE separately-jitted programs (the fused
    fwd+bwd exceeds the TPU compile helper's memory cap):

        seg1: concat batch + backbone forward           (no grads)
        seg2: heads fwd+bwd w.r.t. (params, backbone features)
        seg3: backbone recompute under vjp + grad merge + optimizer

    Exact same gradients as the fused step (the boundary is a true
    rematerialization point); backbone forward runs twice per iter.

    Returns stu3d(det3d_vars, opt_state, batch, pseudo, it, rng) →
    (new_vars, new_opt, logs); NOT itself jittable — it chains jits.
    """
    seg1 = jax.jit(lambda v, b, p: ssl.stu3d_seg_backbone(v, b, p))
    seg2 = jax.jit(lambda v, cat, f, a, b, p, it, rng:
                   ssl.stu3d_seg_heads(v, cat, f, a, b, p, it, rng))

    def _seg3(v, opt_state, cat, g_feats, g_params, head_stats, bb_stats):
        g_backbone = ssl.stu3d_seg_bb_bwd(v, cat, g_feats)
        grads = jax.tree.map(jnp.add, g_params, g_backbone)
        updates, new_opt = tx3.update(grads, opt_state, v["params"])
        new_params = optax.apply_updates(v["params"], updates)
        # heads' stats from seg2, backbone's from seg1
        stats = dict(head_stats)
        stats["backbone3d"] = bb_stats["backbone3d"]
        new_vars = dict(v, params=new_params, batch_stats=stats)
        return new_vars, new_opt

    seg3 = jax.jit(_seg3)

    def stu3d(det3d_vars, opt_state, batch, pseudo, it, rng):
        cat, feats, aux, bb_stats = seg1(det3d_vars, batch, pseudo)
        g_params, g_feats, logs, head_stats = seg2(
            det3d_vars, cat, feats, aux, batch, pseudo, it, rng)
        new_vars, new_opt = seg3(det3d_vars, opt_state, cat, g_feats,
                                 g_params, head_stats, bb_stats)
        return new_vars, new_opt, logs

    return stu3d


def _extract_params(student):
    return {det: v["params"] for det, v in student.items()}


def _merge_params(student, params):
    return {det: dict(v, params=params[det])
            for det, v in student.items()}
