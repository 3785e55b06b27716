"""Bisect the XLA backbone slowness: time truncated prefixes."""
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
CAPS = CFG["backbone_caps"]


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
    print(f"{name:<28} {best * 1e3:8.2f} ms (compile {comp:.0f}s)",
          flush=True)


def conv_xla(feats, keys, nkeys, w, shape, rb=None):
    if rb is None:
        b, n, k = nkeys.shape
        band = int(np.prod(shape)) + 2
        rb = spconv.lookup_batched(keys, nkeys.reshape(b, n * k),
                                   band=band).reshape(b, n, k)
    return spconv.gather_conv_batched(feats, rb, w)


def down(feats, keys, shape_in, kernel, stride, padding, w, cap):
    kernel = spconv._triple(kernel)
    stride_t = spconv._triple(stride)
    padding_t = spconv._triple(padding)
    shape_out = spconv.output_spatial_shape(shape_in, kernel, stride_t,
                                            padding_t)
    out_keys, count = spconv.downsample_keys_batched(
        keys, shape_in, shape_out, kernel, stride_t, padding_t, cap)
    nkeys = spconv.sparse_neighbor_keys(out_keys, shape_in, shape_out,
                                        kernel, stride_t, padding_t)
    out = conv_xla(feats, keys, nkeys, w, shape_in)
    return jnp.maximum(out, 0.0), out_keys, shape_out


def stack(depth):
    rng = np.random.RandomState(0)
    ws = {}

    def W(name, k, ci, co):
        ws[name] = jnp.asarray(
            rng.randn(k, ci, co).astype(np.float32) * 0.05)

    W("in", 27, 4, 16)
    W("c1", 27, 16, 16)
    W("d2", 27, 16, 32)
    W("c2a", 27, 32, 32)
    W("c2b", 27, 32, 32)
    W("d3", 27, 32, 64)
    W("c3a", 27, 64, 64)
    W("c3b", 27, 64, 64)
    W("d4", 27, 64, 64)
    W("c4a", 27, 64, 64)
    W("c4b", 27, 64, 64)
    W("out", 3, 64, 128)

    def fn(vf, keys):
        nk1 = spconv.subm_neighbor_keys(keys, SHAPE1, (3, 3, 3))
        b, n, k = nk1.shape
        rb1 = spconv.lookup_batched(
            keys, nk1.reshape(b, n * k),
            band=int(np.prod(SHAPE1)) + 2).reshape(b, n, k)
        x = jnp.maximum(spconv.gather_conv_batched(vf, rb1, ws["in"]), 0)
        if depth == 1:
            return x
        x = jnp.maximum(spconv.gather_conv_batched(x, rb1, ws["c1"]), 0)
        if depth == 2:
            return x
        x, keys2, shape2 = down(x, keys, SHAPE1, 3, 2, 1, ws["d2"],
                                CAPS[0])
        if depth == 3:
            return x
        nk2 = spconv.subm_neighbor_keys(keys2, shape2, (3, 3, 3))
        rb2 = spconv.lookup_batched(
            keys2, nk2.reshape(1, -1),
            band=int(np.prod(shape2)) + 2).reshape(nk2.shape)
        x = jnp.maximum(spconv.gather_conv_batched(x, rb2, ws["c2a"]), 0)
        x = jnp.maximum(spconv.gather_conv_batched(x, rb2, ws["c2b"]), 0)
        if depth == 4:
            return x
        x, keys3, shape3 = down(x, keys2, shape2, 3, 2, 1, ws["d3"],
                                CAPS[1])
        nk3 = spconv.subm_neighbor_keys(keys3, shape3, (3, 3, 3))
        rb3 = spconv.lookup_batched(
            keys3, nk3.reshape(1, -1),
            band=int(np.prod(shape3)) + 2).reshape(nk3.shape)
        x = jnp.maximum(spconv.gather_conv_batched(x, rb3, ws["c3a"]), 0)
        x = jnp.maximum(spconv.gather_conv_batched(x, rb3, ws["c3b"]), 0)
        if depth == 5:
            return x
        x, keys4, shape4 = down(x, keys3, shape3, 3, 2, (0, 1, 1),
                                ws["d4"], CAPS[2])
        nk4 = spconv.subm_neighbor_keys(keys4, shape4, (3, 3, 3))
        rb4 = spconv.lookup_batched(
            keys4, nk4.reshape(1, -1),
            band=int(np.prod(shape4)) + 2).reshape(nk4.shape)
        x = jnp.maximum(spconv.gather_conv_batched(x, rb4, ws["c4a"]), 0)
        x = jnp.maximum(spconv.gather_conv_batched(x, rb4, ws["c4b"]), 0)
        if depth == 6:
            return x
        x, keys_o, shape_o = down(x, keys4, shape4, (3, 1, 1), (2, 1, 1),
                                  0, ws["out"], CAPS[3])
        return x
    return fn


def main():
    batch = g._make_batch(CFG, b=1, p=8192, max_voxels=12000)
    vf, keys = batch["voxel_features"], batch["voxel_keys"]
    for depth in (1, 2, 3, 4, 5, 6, 7):
        chained(f"depth={depth}", stack(depth), vf, (keys,))


if __name__ == "__main__":
    main()
