"""Measure TPU primitives relevant to sparse conv: flat row gather,
searchsorted, segment-sum scatter, and the key-compare one-hot matmul.
Chained timing (output feeds next input) per the axon-tunnel caveat."""
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


def chained(name, fn, x0, args, iters=20):
    """fn(x, *args) -> array whose [0,0] perturbs x next round."""
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    out = jfn(x0, *args)
    jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    best = None
    for _ in range(3):
        x = x0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jfn(x, *args)
            x = x0 + 0 * out.reshape(-1)[0].astype(x0.dtype)
        jax.block_until_ready(x)
        d = (time.perf_counter() - t0) / iters
        best = d if best is None else min(best, d)
    print(f"{name:<44} {best * 1e3:8.3f} ms (compile {comp:.1f}s)",
          flush=True)


def main():
    rng = np.random.RandomState(0)
    N, C = 12000, 16
    MK = 12000 * 27
    feats = jnp.asarray(rng.randn(N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, MK).astype(np.int32))

    chained("flat row gather 324k x 16ch", lambda f, i: f[i], feats, (idx,))
    feats64 = jnp.asarray(rng.randn(7000, 64).astype(np.float32))
    idx64 = jnp.asarray(rng.randint(0, 7000, 7000 * 27).astype(np.int32))
    chained("flat row gather 189k x 64ch", lambda f, i: f[i],
            feats64, (idx64,))

    # one-hot matmul gather for comparison (what onehot_rows does via XLA)
    def onehot_gather(f, i):
        oh = (i[:, None] == jnp.arange(f.shape[0])[None, :]).astype(
            jnp.bfloat16)
        return oh @ f.astype(jnp.bfloat16)
    chained("one-hot matmul gather 189k x 64ch", onehot_gather,
            feats64, (idx64,))

    keys = jnp.asarray(np.sort(rng.choice(2 ** 26, N, replace=False)
                               ).astype(np.int32))
    queries = jnp.asarray(rng.randint(0, 2 ** 26, MK).astype(np.int32))
    chained("searchsorted 324k in 12k",
            lambda q, k: jnp.searchsorted(k, q).astype(jnp.int32),
            queries, (keys,))

    seg = jnp.asarray(rng.randint(0, N, MK).astype(np.int32))
    vals = jnp.asarray(rng.randn(MK, C).astype(np.float32))
    chained("segment_sum 324k -> 12k x 16ch",
            lambda v, s: jax.ops.segment_sum(v, s, num_segments=N),
            vals, (seg,))

    # scatter-add via one big transposed matmul equivalent cost check
    dout = jnp.asarray(rng.randn(12000, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(27 * 16, 32).astype(np.float32))
    g = jnp.asarray(rng.randn(12000, 27 * 16).astype(np.float32))
    chained("GEMM 12000x432x32", lambda g, w: g @ w, g, (w,))


if __name__ == "__main__":
    main()
