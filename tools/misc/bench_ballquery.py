"""Micro-benchmark: ball_query formulations on the real chip.

Compares the shipped cumsum-rank ball_query against the old top_k
formulation and times FPS, at VSA-like sizes.
"""
import os
import time
from functools import partial

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
from detmatch_tpu.ops import pointnet

BIG = 1e10


@partial(jax.jit, static_argnames=("nsample", "chunk"))
def ball_query_topk(centers, centers_valid, points, points_valid, radius,
                    nsample, chunk=512):
    M, N = centers.shape[0], points.shape[0]
    r2 = radius * radius
    pad = (-M) % chunk
    c = jnp.concatenate([centers, jnp.zeros((pad, 3), centers.dtype)],
                        axis=0).reshape(-1, chunk, 3)
    cv = jnp.concatenate([centers_valid, jnp.zeros((pad,), bool)]
                         ).reshape(-1, chunk)
    arange_n = jnp.arange(N, dtype=jnp.float32)

    def one_chunk(args):
        cc, ccv = args
        d2 = jnp.sum((cc[:, None, :] - points[None, :, :]) ** 2, axis=-1)
        within = (d2 <= r2) & points_valid[None, :] & ccv[:, None]
        keyv = jnp.where(within, arange_n[None, :], BIG)
        neg_top, top_idx = jax.lax.top_k(-keyv, nsample)
        ok = (-neg_top) < BIG / 2
        cnt = jnp.sum(ok.astype(jnp.int32), axis=-1)
        idx = jnp.where(ok, top_idx, top_idx[:, :1])
        return idx.astype(jnp.int32), cnt

    idx, cnt = jax.lax.map(one_chunk, (c, cv))
    return idx.reshape(-1, nsample)[:M], cnt.reshape(-1)[:M]


def timeit(name, fn, *args, iters=20):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        d = (time.perf_counter() - t0) / iters
        best = d if best is None else min(best, d)
    print(f"{name:<28} {best * 1e3:8.3f} ms   (compile {compile_s:.1f}s)",
          flush=True)


def main():
    rng = np.random.RandomState(0)
    for (m, n, ns, r) in [(1024, 8192, 32, 0.8), (1024, 12000, 16, 0.4),
                          (21600, 1024, 16, 1.6)]:
        centers = jnp.asarray(rng.rand(m, 3).astype(np.float32) * 60)
        points = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 60)
        cv = jnp.ones((m,), bool)
        pv = jnp.ones((n,), bool)
        print(f"--- M={m} N={n} ns={ns} r={r}")
        timeit("cumsum-rank (shipped)", pointnet.ball_query, centers, cv,
               points, pv, r, ns)
        timeit("top_k (old)", ball_query_topk, centers, cv, points, pv,
               r, ns)
        i1, c1 = jax.device_get(pointnet.ball_query(
            centers, cv, points, pv, r, ns))
        i2, c2 = jax.device_get(ball_query_topk(
            centers, cv, points, pv, r, ns))
        assert (c1 == c2).all()
        ok = (i1 == i2) | (np.arange(ns)[None, :] >= c1[:, None])
        assert ok.all(), "index mismatch"
        print("    parity OK")

    # FPS timing
    for (n, k) in [(8192, 1024), (16384, 2048)]:
        xyz = jnp.asarray(rng.rand(1, n, 3).astype(np.float32) * 60)
        valid = jnp.ones((1, n), bool)
        f = jax.jit(lambda x, v: jax.vmap(
            pointnet.farthest_point_sample, (0, 0, None))(x, v, k))
        timeit(f"fps N={n} K={k}", f, xyz, valid)


if __name__ == "__main__":
    main()
