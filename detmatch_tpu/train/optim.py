"""Optimizers and LR schedules.

HybridOptimizer (reference ``mmdet3d/core/optimizer/hybrid_optimizer.py`` +
``hybrid_constructor.py``: one optimizer per param-name prefix) maps to
``optax.multi_transform`` over path labels — the DetMatch recipe
(``split_0.py:829-852``) is AdamW(lr 4e-2, betas .95/.99, wd .01) for
student.det3d and SGD(momentum .9, lr .2, wd 1e-4) for student.det2d; the
teacher is EMA-updated outside the optimizer (its reference 'dummy SGD'
exists only to satisfy DDP).

Schedules: linear-warmup step LR (SSL / 2D pretrain) and the cyclic
one-cycle LR + momentum used for 3D pretrain
(``pretrain_pvrcnn/split_0.py:320-346``).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Sequence, Tuple

import numpy as np
import jax
import optax


def warmup_step_lr(base_lr, warmup_iters=500, warmup_ratio=0.001,
                   step_iters=(), gamma=0.1):
    """mmcv StepLrUpdater with linear warmup."""
    def fn(it):
        import jax.numpy as jnp
        it = jnp.asarray(it, jnp.float32)
        warm = warmup_ratio + (1 - warmup_ratio) * jnp.minimum(
            it / max(warmup_iters, 1), 1.0)
        lr = base_lr * warm
        for s in step_iters:
            lr = jnp.where(it >= s, lr * gamma, lr)
        return lr
    return fn


def cyclic_lr(base_lr, total_iters, target_ratio=(10.0, 1e-4),
              step_ratio_up=0.4):
    """mmcv CyclicLrUpdater (one cycle): lr rises base→base*10 over 40% of
    training, then anneals to base*1e-4 (cosine)."""
    up = int(total_iters * step_ratio_up)

    def fn(it):
        import jax.numpy as jnp
        it = jnp.asarray(it, jnp.float32)
        up_frac = jnp.clip(it / max(up, 1), 0.0, 1.0)
        lr_up = base_lr * (1 + (target_ratio[0] - 1) * _cos_anneal(up_frac))
        down_frac = jnp.clip((it - up) / max(total_iters - up, 1), 0.0, 1.0)
        lr_down = base_lr * (
            target_ratio[0] + (target_ratio[1] - target_ratio[0])
            * _cos_anneal(down_frac))
        return jnp.where(it < up, lr_up, lr_down)
    return fn


def _cos_anneal(frac):
    import jax.numpy as jnp
    return 0.5 * (1.0 - jnp.cos(jnp.pi * frac))


def cyclic_momentum(base_m=0.85 / 0.95, total_iters=1,
                    target_ratio=(0.85 / 0.95, 1.0), step_ratio_up=0.4):
    """Cyclic momentum mirror (betas ramp 0.95→0.85→0.95)."""
    up = int(total_iters * step_ratio_up)

    def fn(it):
        import jax.numpy as jnp
        it = jnp.asarray(it, jnp.float32)
        up_frac = jnp.clip(it / max(up, 1), 0.0, 1.0)
        m_up = 1.0 + (target_ratio[0] - 1.0) * _cos_anneal(up_frac)
        down_frac = jnp.clip((it - up) / max(total_iters - up, 1), 0.0, 1.0)
        m_down = target_ratio[0] + (target_ratio[1] - target_ratio[0]) \
            * _cos_anneal(down_frac)
        return jnp.where(it < up, m_up, m_down)
    return fn


def adamw(lr_fn, betas=(0.95, 0.99), weight_decay=0.01):
    return optax.chain(
        optax.scale_by_adam(b1=betas[0], b2=betas[1]),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(lr_fn),
    )


def sgd_momentum(lr_fn, momentum=0.9, weight_decay=1e-4):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(lr_fn),
    )


class EveryKState(NamedTuple):
    inner: Any
    count: Any  # () int32


def every_k_steps(inner: optax.GradientTransformation, k: int):
    """Apply ``inner`` only every ``k``-th update, zero otherwise.

    Reference ``HybridOptimizer.step_intervals``
    (``mmdet3d/core/optimizer/hybrid_optimizer.py:87-93``): the counter
    increments first, the group steps when ``count % k == 0`` — i.e. the
    k-th, 2k-th, ... iterations, each using only THAT iteration's
    gradient (mmcv zero_grads between iterations, so skipped iterations'
    gradients are discarded, not accumulated). Skipped updates leave the
    inner state (momenta, schedules) untouched.
    """
    if k == 1:
        return inner

    def init(params):
        import jax.numpy as jnp
        return EveryKState(inner.init(params), jnp.zeros((), jnp.int32))

    def update(grads, state, params=None, **kw):
        import jax
        import jax.numpy as jnp
        count = state.count + 1
        fire = (count % k) == 0

        def do(_):
            return inner.update(grads, state.inner, params, **kw)

        def skip(_):
            return jax.tree.map(jnp.zeros_like, grads), state.inner

        updates, new_inner = jax.lax.cond(fire, do, skip, None)
        return updates, EveryKState(new_inner, count)

    return optax.GradientTransformation(init, update)


def hybrid_optimizer(label_fn: Callable, transforms: Dict[str,
                                                          optax.GradientTransformation],
                     clip_norm: float = 10.0,
                     step_intervals: Dict[str, int] = None):
    """Grad-clip + per-prefix optimizers (HybridOptimizer equivalent).

    Args:
        label_fn: params-pytree → same-tree of labels in ``transforms``.
        step_intervals: optional per-label update interval (reference
            ``step_interval``; every config ships 1, so the default is a
            no-op wrapper-free path).
    """
    if step_intervals:
        transforms = {k: every_k_steps(tx, step_intervals.get(k, 1))
                      for k, tx in transforms.items()}
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.multi_transform(transforms, label_fn),
    )


class SkipNonfiniteState(NamedTuple):
    """Wrapper state: the inner optimizer state + a skipped-step count."""
    inner: Any
    skipped: Any  # () int32


def skip_nonfinite(inner: optax.GradientTransformation):
    """Skip the update when any gradient is non-finite (reference
    MyOptimizerHook NaN-grad skip, ``core/utils/gradient_cumulative.py:9-31``).

    One inf/NaN gradient step would otherwise poison the parameters
    PERMANENTLY (inf grads → NaN global-norm clip scale → NaN params) —
    observed in practice around iter ~160 of tiny synthetic SSL runs.
    On a skipped step the update is zero and the inner optimizer state
    (momenta, counts) is left untouched; ``.skipped`` counts occurrences
    for the train-log ``grad_skips`` channel.
    """
    def init(params):
        import jax.numpy as jnp
        return SkipNonfiniteState(inner.init(params),
                                  jnp.zeros((), jnp.int32))

    def update(grads, state, params=None, **kw):
        import jax.numpy as jnp
        finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g))
             for g in jax.tree_util.tree_leaves(grads)]))
        updates, new_inner = inner.update(grads, state.inner, params,
                                          **kw)
        updates = jax.tree.map(
            lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates)
        new_inner = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o) if hasattr(n, "shape")
            and n.shape == getattr(o, "shape", None) else n,
            new_inner, state.inner)
        skipped = state.skipped + jnp.where(finite, 0, 1).astype(
            state.skipped.dtype)
        return updates, SkipNonfiniteState(new_inner, skipped)

    return optax.GradientTransformation(init, update)


def flatten_optimizer(inner: optax.GradientTransformation):
    """Run ``inner`` on ONE raveled vector instead of the param pytree.

    Exact for any transform whose math is uniform across parameters
    (AdamW / SGD-momentum / global-norm clip / the non-finite skip — all
    element-wise except the global norm, which is the same sum either
    way). Purpose: the per-leaf formulation emits ~6 HLO ops × hundreds
    of leaves, which dominates XLA-CPU compile time of the train step
    (measured: the split SSL stu3d program compiles in 70 s with a flat
    optimizer vs 192 s with the per-leaf chain) and costs kernel-launch
    overhead on TPU; the flat formulation is a handful of fused
    full-vector ops regardless of model depth.
    """
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        return inner.init(flat)

    def update(grads, state, params=None, **kw):
        gflat, unravel = ravel_pytree(grads)
        pflat = ravel_pytree(params)[0] if params is not None else None
        uflat, new_state = inner.update(gflat, state, pflat, **kw)
        return unravel(uflat), new_state

    return optax.GradientTransformation(init, update)


def detmatch_branch_optimizers(lr_3d, lr_2d, clip_norm=10.0,
                               warmup_iters=500):
    """Per-branch optimizers for the split SSL step: AdamW for det3d,
    SGD-momentum for det2d (the reference HybridOptimizer's two groups),
    each guarded by the NaN/inf-grad skip and run flat (see
    :func:`flatten_optimizer`). ``warmup_iters`` follows the reference
    lr_config (500 linear-warmup iters); shorten it for runs far below
    the production 5000-iter schedule."""
    tx3d = flatten_optimizer(skip_nonfinite(optax.chain(
        optax.clip_by_global_norm(clip_norm),
        adamw(warmup_step_lr(lr_3d, warmup_iters=warmup_iters)))))
    tx2d = flatten_optimizer(skip_nonfinite(optax.chain(
        optax.clip_by_global_norm(clip_norm),
        sgd_momentum(warmup_step_lr(lr_2d, warmup_iters=warmup_iters)))))
    return tx3d, tx2d


def detmatch_ssl_optimizer(params, lr_3d, lr_2d, max_iters=5000,
                           clip_norm=10.0):
    """The DetMatch SSL recipe over a {'det3d':…, 'det2d':…} student tree.

    Reference lrs (``split_0.py:824-852``): lr_3d = 1e-3/2·bs·(1+U)·10,
    lr_2d = 2e-2/2·bs·(1+U), both with linear warmup (500 iters, ratio 1e-3).
    """
    lr3 = warmup_step_lr(lr_3d)
    lr2 = warmup_step_lr(lr_2d)

    def label_fn(p):
        return {"det3d": jax.tree.map(lambda _: "adamw", p["det3d"]),
                "det2d": jax.tree.map(lambda _: "sgd", p["det2d"])}

    return hybrid_optimizer(
        label_fn,
        {"adamw": adamw(lr3), "sgd": sgd_momentum(lr2)},
        clip_norm=clip_norm)
