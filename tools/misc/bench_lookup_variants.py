"""Why does lookup_batched cost ~35ms composed but 0.5ms standalone?
Variants: in-graph nkeys producer vs arg, optimization_barrier, sort-based
searchsorted, compare_all."""
import os
import sys
import time
from functools import partial

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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import __graft_entry__ as g
from detmatch_tpu.ops import spconv

CFG = g.ENTRY_CFG
Z = CFG["grid_size"][2] + 1
SHAPE1 = (Z, CFG["grid_size"][1], CFG["grid_size"][0])
BAND = int(np.prod(SHAPE1)) + 2


def chained(name, fn, x0, args, iters=10):
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
            first = jax.tree.leaves(out)[0]
            x = x0 + (0 * first.reshape(-1)[0]).astype(x0.dtype)
        jax.block_until_ready(x)
        d = (time.perf_counter() - t0) / iters
        best = d if best is None else min(best, d)
    print(f"{name:<40} {best * 1e3:8.2f} ms (compile {comp:.0f}s)",
          flush=True)


def lookup_variant(keys, queries, method):
    keys_local = jnp.where(keys == spconv.INVALID_KEY, BAND - 2, keys)
    b, n = keys.shape
    off = (jnp.arange(b, dtype=jnp.int32) * BAND)[:, None]
    kf = (keys_local + off).reshape(-1)
    qf = (jnp.where(queries == spconv.INVALID_KEY, BAND - 1, queries)
          + off).reshape(-1)
    pos = jnp.searchsorted(kf, qf, method=method).astype(jnp.int32)
    pos_c = jnp.clip(pos, 0, b * n - 1)
    found = kf[pos_c] == qf
    return jnp.where(found, pos_c, -1)


def main():
    batch = g._make_batch(CFG, b=1, p=8192, max_voxels=12000)
    vf, keys = batch["voxel_features"], batch["voxel_keys"]

    # A: full in-graph (nkeys producer in graph) -- replica of depth=1
    def a(vf, keys):
        nk = spconv.subm_neighbor_keys(keys, SHAPE1, (3, 3, 3))
        nk = nk + 0 * vf[0, 0, 0].astype(jnp.int32)
        rb = spconv.lookup_batched(keys, nk.reshape(1, -1), band=BAND)
        return rb.sum()
    chained("A in-graph nkeys + lookup", a, vf, (keys,))

    # B: barrier between producer and lookup
    def b_(vf, keys):
        nk = spconv.subm_neighbor_keys(keys, SHAPE1, (3, 3, 3))
        nk = nk + 0 * vf[0, 0, 0].astype(jnp.int32)
        nk = jax.lax.optimization_barrier(nk)
        rb = spconv.lookup_batched(keys, nk.reshape(1, -1), band=BAND)
        return rb.sum()
    chained("B barrier before lookup", b_, vf, (keys,))

    # C: nkeys precomputed as arg
    nk_pre = spconv.subm_neighbor_keys(keys, SHAPE1, (3, 3, 3))

    def c(vf, keys, nk):
        nk = nk + 0 * vf[0, 0, 0].astype(jnp.int32)
        rb = spconv.lookup_batched(keys, nk.reshape(1, -1), band=BAND)
        return rb.sum()
    chained("C nkeys as arg", c, vf, (keys, nk_pre))

    # D/E: searchsorted methods, in-graph producer
    for method in ("sort", "compare_all"):
        def d(vf, keys, method=method):
            nk = spconv.subm_neighbor_keys(keys, SHAPE1, (3, 3, 3))
            nk = nk + 0 * vf[0, 0, 0].astype(jnp.int32)
            rb = lookup_variant(keys, nk.reshape(1, -1), method)
            return rb.sum()
        try:
            chained(f"D in-graph method={method}", d, vf, (keys,))
        except Exception as e:
            print(f"D method={method} failed: {e}", flush=True)


if __name__ == "__main__":
    main()
