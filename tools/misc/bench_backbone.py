"""Backbone3d timing: pallas key-compare kernel vs XLA rulebook+gather."""
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
from detmatch_tpu.models.pvrcnn.backbone3d import VoxelBackbone8x


def run(impl):
    cfg = g.ENTRY_CFG
    Z = cfg["grid_size"][2] + 1
    model = VoxelBackbone8x(
        spatial_shape=(Z, cfg["grid_size"][1], cfg["grid_size"][0]),
        caps=cfg["backbone_caps"], conv_impl=impl)
    batch = g._make_batch(cfg, b=1, p=8192, max_voxels=12000)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           batch["voxel_features"], batch["voxel_keys"])

    fwd = jax.jit(lambda vf, vk: model.apply(variables, vf, vk))
    t0 = time.perf_counter()
    out = fwd(batch["voxel_features"], batch["voxel_keys"])
    jax.block_until_ready(out)
    print(f"[{impl}] compile {time.perf_counter() - t0:.1f}s", flush=True)

    vf0 = batch["voxel_features"]
    best = None
    for _ in range(3):
        vf = vf0
        t0 = time.perf_counter()
        for _ in range(10):
            out = fwd(vf, batch["voxel_keys"])
            vf = vf0 + 0 * out["out"]["feats"].reshape(-1)[0]
        jax.block_until_ready(vf)
        d = (time.perf_counter() - t0) / 10
        best = d if best is None else min(best, d)
    print(f"[{impl}] fwd {best * 1e3:.2f} ms", flush=True)

    # fwd+bwd
    def loss(vf, vk):
        out = model.apply(variables, vf, vk)
        return sum(jnp.sum(lv["feats"] ** 2)
                   for k, lv in out.items() if k != "point_features")

    gradf = jax.jit(jax.grad(loss))
    t0 = time.perf_counter()
    gout = gradf(batch["voxel_features"], batch["voxel_keys"])
    jax.block_until_ready(gout)
    print(f"[{impl}] grad compile {time.perf_counter() - t0:.1f}s",
          flush=True)
    best = None
    for _ in range(3):
        vf = vf0
        t0 = time.perf_counter()
        for _ in range(10):
            gout = gradf(vf, batch["voxel_keys"])
            vf = vf0 + 0 * gout.reshape(-1)[0]
        jax.block_until_ready(vf)
        d = (time.perf_counter() - t0) / 10
        best = d if best is None else min(best, d)
    print(f"[{impl}] fwd+bwd {best * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    for impl in sys.argv[1:] or ["xla", "pallas_key"]:
        run(impl)
