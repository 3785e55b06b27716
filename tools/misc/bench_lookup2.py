"""Is the composed slowness in the gather with in-graph indices?"""
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


def main():
    rng = np.random.RandomState(0)
    batch = g._make_batch(CFG, b=1, p=8192, max_voxels=12000)
    vf, keys = batch["voxel_features"], batch["voxel_keys"]
    w = jnp.asarray(rng.randn(27, 4, 16).astype(np.float32) * 0.05)

    def e(vf, keys):  # exact depth=1
        nk = spconv.subm_neighbor_keys(keys, SHAPE1, (3, 3, 3))
        rb = spconv.lookup_batched(keys, nk.reshape(1, -1),
                                   band=BAND).reshape(nk.shape)
        return jnp.maximum(spconv.gather_conv_batched(vf, rb, w), 0)
    chained("E lookup+gather_conv (depth=1)", e, vf, (keys,))

    def f(vf, keys):
        nk = spconv.subm_neighbor_keys(keys, SHAPE1, (3, 3, 3))
        rb = spconv.lookup_batched(keys, nk.reshape(1, -1),
                                   band=BAND).reshape(nk.shape)
        rb = jax.lax.optimization_barrier(rb)
        return jnp.maximum(spconv.gather_conv_batched(vf, rb, w), 0)
    chained("F barrier(rb)+gather_conv", f, vf, (keys,))

    def h(vf, keys):
        nk = spconv.subm_neighbor_keys(keys, SHAPE1, (3, 3, 3))
        rb = spconv.lookup_batched(keys, nk.reshape(1, -1),
                                   band=BAND).reshape(nk.shape)
        valid = rb >= 0
        idx = jnp.where(valid, rb, 0).reshape(-1)
        idx = jax.lax.optimization_barrier(idx)
        gathered = vf.reshape(-1, 4)[idx].reshape(1, -1, 27, 4)
        gathered = jnp.where(valid[..., None], gathered, 0.0)
        return jax.lax.dot_general(
            gathered.reshape(-1, 27 * 4), w.reshape(27 * 4, 16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    chained("H barrier(idx)+manual gather", h, vf, (keys,))


def extra():
    rng = np.random.RandomState(0)
    batch = g._make_batch(CFG, b=1, p=8192, max_voxels=12000)
    vf, keys = batch["voxel_features"], batch["voxel_keys"]
    w = jnp.asarray(rng.randn(27, 4, 16).astype(np.float32) * 0.05)

    def i_(vf, keys):
        nk = spconv.subm_neighbor_keys(keys, SHAPE1, (3, 3, 3))
        rb = spconv.lookup_batched(keys, nk.reshape(1, -1),
                                   band=BAND).reshape(nk.shape)
        valid = rb >= 0
        idx = jnp.where(valid, rb, 0).reshape(-1)
        gathered = vf.reshape(-1, 4)[idx]
        gathered = jax.lax.optimization_barrier(gathered)  # AFTER gather
        gathered = jnp.where(valid.reshape(1, -1, 27)[..., None],
                             gathered.reshape(1, -1, 27, 4), 0.0)
        return jax.lax.dot_general(
            gathered.reshape(-1, 27 * 4), w.reshape(27 * 4, 16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    chained("I barrier AFTER gather", i_, vf, (keys,))

    def j_(vf, keys):  # gather returned directly (like the microbench)
        nk = spconv.subm_neighbor_keys(keys, SHAPE1, (3, 3, 3))
        rb = spconv.lookup_batched(keys, nk.reshape(1, -1),
                                   band=BAND).reshape(nk.shape)
        idx = jnp.where(rb >= 0, rb, 0).reshape(-1)
        return vf.reshape(-1, 4)[idx]
    chained("J gather returned raw", j_, vf, (keys,))


if __name__ == "__main__":
    extra()
