"""Data-parallel gradient noise study (fp64 ground truth).

Justifies the tolerance of
``tests/test_multichip.py::test_pretrain_grads_match_single_device[8]``:

1. ``g1``  = PV-RCNN loss grads, global batch 8, ONE device, fp32.
2. ``g8``  = same batch sharded over 8 virtual devices, fp32.
3. ``g64`` = same computation with params/batch cast to float64
   (``jax.enable_x64``), one device — the precision ground truth.

Measured on this repo's tiny config (run this script to reproduce):

* every DISCRETE intermediate (keypoint validity, RoI labels — i.e. all
  sampling/assignment decisions) is bit-identical between g1 and g8;
* worst per-leaf divergence g1↔g8: ~3.5e-3 absolute, ~3e-3 relative
  (deep 3D-backbone weights — BatchNorm-chain accumulation-order noise);
* worst per-leaf divergence g1↔g64: ~2e0 RELATIVE — three orders of
  magnitude larger, because fp32 itself flips discrete RoI-sampling
  decisions relative to fp64.

Conclusion: the sharded step reproduces the single-device step far
inside fp32's own precision envelope; the DP psum/sharding math adds no
error class of its own. The test therefore asserts (a) discrete
equality exactly and (b) per-leaf |g1-g8| <= 1e-3 + 1e-2 * max|leaf|.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
from detmatch_tpu.utils.env import host_cache_dir  # noqa: E402
_cache = host_cache_dir()
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa
from detmatch_tpu.train.ssl_step import voxelize_views  # noqa: E402
from detmatch_tpu.utils import tiny  # noqa: E402
from detmatch_tpu.models.pvrcnn.pvrcnn import PVRCNN  # noqa: E402


def build(n=8):
    rng = np.random.RandomState(0)
    view = tiny.tiny_view(rng, b=n, p=128, with_gt=True)
    vb = voxelize_views({"x": {"v": view}}, tiny.TINY_SPEC)["x"]["v"]
    batch = {k: vb[k] for k in ("points", "points_valid",
                                "voxel_features", "voxel_keys",
                                "gt_boxes")}
    model = PVRCNN(**tiny.TINY_PV_CFG)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "sampling": key,
                            "dropout": key}, batch, train=True)
    return model, variables, batch


def make_fns(model, variables):
    def loss_and_grads(params, batch, rng_):
        def loss_fn(p):
            out, _ = model.apply(
                dict(variables, params=p), batch, train=True,
                rngs={"sampling": rng_, "dropout": rng_},
                mutable=["batch_stats"])
            return model.apply(dict(variables, params=p), out, batch,
                               method=PVRCNN.loss)["loss"]

        return jax.value_and_grad(loss_fn)(params)

    def discrete(params, batch, rng_):
        out, _ = model.apply(
            dict(variables, params=params), batch, train=True,
            rngs={"sampling": rng_, "dropout": rng_},
            mutable=["batch_stats"])
        return {k: v for k, v in out.items()
                if hasattr(v, "dtype") and v.dtype in (jnp.int32,
                                                       jnp.bool_)}

    return loss_and_grads, discrete


def leaf_errs(a, b):
    rows = []
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = jax.tree.leaves(b)
    for (path, x), y in zip(fa, fb):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        d = float(np.max(np.abs(x - y)))
        mag = float(max(np.max(np.abs(x)), 1e-12))
        rows.append((d / mag, d, mag, jax.tree_util.keystr(path)))
    rows.sort(reverse=True)
    return rows


def main():
    n = 8
    model, variables, batch = build(n)
    lg, disc = make_fns(model, variables)
    rng_ = jax.random.PRNGKey(1)
    p0 = variables["params"]

    l1, g1 = jax.jit(lg)(p0, batch, rng_)
    d1 = jax.device_get(jax.jit(disc)(p0, batch, rng_))

    mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    with mesh:
        l8, g8 = jax.jit(lg, in_shardings=(repl, shard, repl),
                         out_shardings=(repl, repl))(
            jax.device_put(p0, repl), jax.device_put(batch, shard), rng_)
        d8 = jax.device_get(jax.jit(
            disc, in_shardings=(repl, shard, repl))(
            jax.device_put(p0, repl), jax.device_put(batch, shard), rng_))

    print(f"loss 1dev={float(l1):.8f} 8dev={float(l8):.8f}")
    for k in d1:
        print(f"discrete[{k}]: equal={np.array_equal(d1[k], d8[k])}")
    print("\ng1 vs g8 (fp32, 1 dev vs 8 dev) — worst leaves:")
    for rel, d, mag, name in leaf_errs(jax.device_get(g1),
                                       jax.device_get(g8))[:8]:
        print(f"  rel={rel:.3e} abs={d:.3e} mag={mag:.3e} {name}")

    with jax.enable_x64():
        upc = lambda t: jax.tree.map(  # noqa: E731
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
        l64, g64 = jax.jit(lg)(upc(jax.device_get(p0)),
                               upc(jax.device_get(batch)), rng_)
        print(f"\nloss f64={float(l64):.8f}")
        print("g1 vs g64 (fp32 vs fp64 ground truth) — worst leaves:")
        for rel, d, mag, name in leaf_errs(jax.device_get(g1),
                                           jax.device_get(g64))[:8]:
            print(f"  rel={rel:.3e} abs={d:.3e} mag={mag:.3e} {name}")


if __name__ == "__main__":
    main()
