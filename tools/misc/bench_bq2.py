"""Chase the ball_query perf cliff between N=8192 and N=12000."""
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


def timeit(name, fn, *args, iters=30):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        d = (time.perf_counter() - t0) / iters
        best = d if best is None else min(best, d)
    print(f"{name:<40} {best * 1e3:8.3f} ms (compile {comp:.1f}s)",
          flush=True)


def main():
    rng = np.random.RandomState(0)
    m, ns = 1024, 16
    for n in (8192, 12000, 12288, 16384):
        centers = jnp.asarray(rng.rand(m, 3).astype(np.float32) * 60)
        points = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 60)
        cv = jnp.ones((m,), bool)
        pv = jnp.ones((n,), bool)
        for r in (0.4, 0.8):
            timeit(f"shipped N={n} r={r}", pointnet.ball_query, centers,
                   cv, points, pv, r, ns)

    # pieces at N=12000
    n = 12000
    points = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 60)
    centers = jnp.asarray(rng.rand(m, 3).astype(np.float32) * 60)

    @jax.jit
    def just_d2(c, p):
        return jnp.sum((c[:, None, :] - p[None, :, :]) ** 2, -1)

    @jax.jit
    def d2_within_cumsum(c, p):
        d2 = jnp.sum((c[:, None, :] - p[None, :, :]) ** 2, -1)
        within = d2 <= 0.16
        return jnp.cumsum(within.astype(jnp.int32), axis=1)

    @jax.jit
    def full_extract(c, p):
        d2 = jnp.sum((c[:, None, :] - p[None, :, :]) ** 2, -1)
        within = d2 <= 0.16
        rank = jnp.cumsum(within.astype(jnp.int32), axis=1)
        wr = jnp.where(within & (rank <= 16), rank, 0)
        ar = jnp.arange(n, dtype=jnp.int32)[None, :]
        return jnp.stack([jnp.sum(jnp.where(wr == s + 1, ar, 0), axis=1)
                          for s in range(16)], 1)

    timeit("d2 only (1024x12000)", just_d2, centers, points)
    timeit("d2+within+cumsum", d2_within_cumsum, centers, points)
    timeit("d2+cumsum+extract16", full_extract, centers, points)


if __name__ == "__main__":
    main()
