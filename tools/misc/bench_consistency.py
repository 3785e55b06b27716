"""Piecewise timing of the SSL matching machinery at production shapes.

The no-consistency A/B (``bench_ssl_step.py`` with SSL_CONSISTENCY=0)
shows the consistency branch costs ~220-260 ms/step; this bench
localizes it: 2D NMS over boxsets, fusion Hungarian matching (JV
augmenting loops), and the consistency loss, each timed alone with
chained dependencies on synthetic-but-realistically-sparse boxsets.
"""
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

from detmatch_tpu.ssl import boxset, modules  # noqa: E402

B = 4          # unlabeled views per step
K3 = 128       # student 3D boxes entering the branch (stu_boxes_nms)
K2 = 100       # teacher 2D set
C = 3
VALID3 = 40    # realistic survivor counts after score filters
VALID2 = 25


def make_boxsets(rng):
    def bs(k, nvalid, dim):
        boxes = rng.rand(B, k, dim).astype(np.float32) * 300
        if dim == 4:
            boxes[..., 2:] = boxes[..., :2] + rng.rand(B, k, 2) * 80 + 4
        scores = rng.rand(B, k, C).astype(np.float32) * 0.6
        valid = np.zeros((B, k), bool)
        valid[:, :nvalid] = True
        return dict(boxes=jnp.asarray(boxes), scores=jnp.asarray(scores),
                    valid=jnp.asarray(valid))

    b3 = bs(K3, VALID3, 4)   # already projected to 2D
    b2 = bs(K2, VALID2, 4)
    shape = jnp.tile(jnp.asarray([[375.0, 1242.0]]), (B, 1))
    return b3, b2, shape


def chain_time(name, fn, *args, iters=10):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    # chained: perturb a float input with a scalar of the output
    def scalar_of(o):
        leaves = [l for l in jax.tree.leaves(o)
                  if jnp.issubdtype(l.dtype, jnp.floating)]
        return sum(jnp.sum(l) * 0.0 for l in leaves)

    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        s = jnp.float32(0.0)
        o = None
        for _ in range(iters):
            a0 = jax.tree.map(
                lambda x: x + s * 0 if jnp.issubdtype(
                    x.dtype, jnp.floating) else x, args[0])
            o = jfn(a0, *args[1:])
            s = scalar_of(o)
        jax.block_until_ready(o)
        d = (time.perf_counter() - t0) / iters
        best = d if best is None else min(best, d)
    print(f"{name:<28} {best * 1e3:8.1f} ms", flush=True)
    return out


def main():
    rng = np.random.RandomState(0)
    b3, b2, shape = make_boxsets(rng)
    l2i = jnp.tile(jnp.eye(4)[None], (B, 1, 1))

    chain_time("nms_2d_boxset(K3=128)",
               lambda a: modules.nms_2d_boxset(a, 0.1, 0.5, 100), b3)

    def match(a, b):
        return modules.fusion_hungarian_matching(
            a, b, l2i, shape, cost_thr=-1.5, project_3d_to_2d=False)
    chain_time("fusion_hungarian(128x100)", match, b3, b2)

    m3, m2, _ = jax.jit(match)(b3, b2)
    chain_time("consistency_loss",
               lambda a, b: modules.hungarian_consistency_loss(
                   a, b, shape), m3, m2)

    def full(a, b):
        a = modules.nms_2d_boxset(a, 0.1, 0.5, 100)
        x3, x2, _ = modules.fusion_hungarian_matching(
            a, b, l2i, shape, cost_thr=-1.5, project_3d_to_2d=False)
        return modules.hungarian_consistency_loss(x3, x2, shape)
    chain_time("nms+match+loss (fwd)", full, b3, b2)

    def full_grad(a, b):
        def f(boxes):
            aa = dict(a, boxes=boxes)
            aa = modules.nms_2d_boxset(aa, 0.1, 0.5, 100)
            x3, x2, _ = modules.fusion_hungarian_matching(
                aa, b, l2i, shape, cost_thr=-1.5, project_3d_to_2d=False)
            out = modules.hungarian_consistency_loss(x3, x2, shape)
            return sum(v for v in out.values()
                       if isinstance(v, jnp.ndarray) and v.ndim == 0)
        return jax.grad(f)(a["boxes"])
    chain_time("nms+match+loss (fwd+bwd)", full_grad, b3, b2)


if __name__ == "__main__":
    main()
