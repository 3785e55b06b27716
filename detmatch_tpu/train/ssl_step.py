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
from ..ssl.detector import SSLDetector, ema_decay_at, ema_update


def voxelize_views(batch, spec):
    """Add voxel_features/voxel_keys to every view (device-side)."""
    def add(view):
        vox = jax.vmap(lambda p, v: voxelize.voxelize_mean(p, v, spec))(
            view["points"], view["points_valid"])
        return dict(view, voxel_features=vox["features"],
                    voxel_keys=vox["keys"])

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


def _extract_params(student):
    return {det: v["params"] for det, v in student.items()}


def _merge_params(student, params):
    return {det: dict(v, params=params[det])
            for det, v in student.items()}
