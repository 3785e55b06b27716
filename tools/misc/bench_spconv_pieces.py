"""Time the XLA sparse-conv path pieces at level-1 KITTI sizes."""
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
from detmatch_tpu.ops import spconv, voxelize


def chained(name, fn, x0, args, iters=20):
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
    print(f"{name:<44} {best * 1e3:8.3f} ms (compile {comp:.1f}s)",
          flush=True)


def main():
    rng = np.random.RandomState(0)
    shape = (41, 1600, 1408)
    n = 12000
    b = 1
    # realistic sorted unique keys
    z = rng.randint(0, 12, n)
    y = rng.randint(0, 1600, n)
    x = rng.randint(0, 1408, n)
    keys = np.unique((z * 1600 + y) * 1408 + x).astype(np.int32)
    pad = n - len(keys)
    keys = np.concatenate([keys, np.full(pad, voxelize.INVALID_KEY,
                                         np.int32)])
    keys = jnp.asarray(keys)[None]  # (1, N)
    feats = jnp.asarray(rng.randn(b, n, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(27, 16, 16).astype(np.float32) * 0.1)

    nkeys = spconv.subm_neighbor_keys(keys, shape, (3, 3, 3))

    chained("subm_neighbor_keys",
            lambda f, k: spconv.subm_neighbor_keys(k + 0 * f[0, 0, 0].astype(jnp.int32), shape, (3, 3, 3)),
            feats, (keys,))

    def rulebook(f, k, nk):
        nk = nk + 0 * f[0, 0, 0].astype(jnp.int32)
        return spconv.lookup_batched(k, nk.reshape(b, -1),
                                     band=int(np.prod(shape)) + 2)
    chained("lookup_batched 324k", rulebook, feats, (keys, nkeys))

    rb = spconv.lookup_batched(
        keys, nkeys.reshape(b, -1),
        band=int(np.prod(shape)) + 2).reshape(b, n, 27)

    chained("gather_conv_batched (f32)",
            lambda f, r, w: spconv.gather_conv_batched(f, r, w),
            feats, (rb, w))

    def gather_conv_bf16(f, r, w):
        valid = r >= 0
        base = (jnp.arange(b, dtype=jnp.int32) * n)[:, None, None]
        idx = jnp.where(valid, r + base, 0).reshape(-1)
        gathered = f.reshape(b * n, 16).astype(jnp.bfloat16)[idx]
        gathered = jnp.where(valid.reshape(-1, 27)[..., None].reshape(
            b * n * 27, 1), gathered, 0).reshape(b * n, 27 * 16)
        return jax.lax.dot_general(
            gathered, w.reshape(27 * 16, -1).astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    chained("gather_conv bf16", gather_conv_bf16, feats, (rb, w))

    chained("downsample_keys_batched",
            lambda f, k: spconv.downsample_keys_batched(
                k + 0 * f[0, 0, 0].astype(jnp.int32), shape,
                spconv.output_spatial_shape(shape, 3, 2, 1),
                (3, 3, 3), (2, 2, 2), (1, 1, 1), 9000),
            feats, (keys,))

    # voxelize (the sort at the entrance)
    pts = jnp.asarray(rng.rand(1, 16384, 4).astype(np.float32) * 40)
    spec = voxelize.VoxelizerSpec(
        point_cloud_range=(0, -40, -3, 70.4, 40, 1),
        voxel_size=(0.05, 0.05, 0.1), max_voxels=12000, max_points=5)
    chained("voxelize_mean 16k pts",
            lambda p, v: jax.vmap(
                lambda pp, vv: voxelize.voxelize_mean(pp, vv, spec))(p, v),
            pts, (jnp.ones((1, 16384), bool),))


if __name__ == "__main__":
    main()
