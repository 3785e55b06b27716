"""fuse_conv_bn checkpoint transform (reference
``tools/misc/fuse_conv_bn.py``): folding BN statistics into conv kernels
must preserve the module output (up to f32 re-association noise — the
reference's torch fuse is likewise not bit-exact)."""
import copy
import importlib.util
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _fcb():
    spec = importlib.util.spec_from_file_location(
        "fuse_conv_bn",
        os.path.join(os.path.dirname(__file__), "..", "tools", "misc",
                     "fuse_conv_bn.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fuse_preserves_bev_backbone_output():
    import jax
    import jax.numpy as jnp
    from detmatch_tpu.models.pvrcnn.bev import BaseBEVBackbone

    fcb = _fcb()
    m = BaseBEVBackbone(layer_nums=(1, 1), num_filters=(8, 16),
                        num_upsample_filters=(8, 8))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))
    v = jax.tree.map(np.asarray,
                     m.init({"params": jax.random.PRNGKey(0)}, x,
                            train=False))
    v = jax.tree.map(lambda a: a, dict(v))

    def rand_stats(t):
        for n in t.values():
            if isinstance(n, dict):
                if set(n) >= {"mean", "var"}:
                    n["mean"] = (rng.randn(*n["mean"].shape) * 0.5
                                 ).astype(np.float32)
                    n["var"] = (0.5 + rng.rand(*n["var"].shape)
                                ).astype(np.float32)
                else:
                    rand_stats(n)

    rand_stats(v["batch_stats"])
    y0 = m.apply(v, x, train=False)
    v2 = copy.deepcopy(v)
    n = fcb.fuse_tree(v2["params"], v2["batch_stats"])
    y1 = m.apply(v2, x, train=False)
    assert n == 6, n  # 2 blocks x (entry + 1 layer) + 2 deconv-ups
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-3)
    # BN really became an identity-with-shift (scale 1, mean 0)
    leaves = []

    def collect(t):
        for k, x_ in t.items():
            if isinstance(x_, dict):
                if "mean" in x_:
                    leaves.append(x_)
                else:
                    collect(x_)

    collect(v2["batch_stats"])
    assert leaves and all(np.allclose(s["mean"], 0) for s in leaves)
