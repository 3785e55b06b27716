"""Core-tier full-model smoke: one tiny PV-RCNN forward + loss.

The core tier (`pytest -m "not slow"`) proves kernels/geometry/eval/
parity but previously compiled no full model, so "green core tier" did
not imply "the product runs". This compiles the tiny PV-RCNN end to end
(train forward incl. proposal NMS, RoI sampling, and the eval forward
incl. decode) in ~20-40 s on the 1-core CPU host — cheap enough to stay
out of the slow tier.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def test_tiny_pvrcnn_forward_loss_and_eval():
    from detmatch_tpu.models.pvrcnn.pvrcnn import PVRCNN, post_processing
    from detmatch_tpu.ops import voxelize
    from detmatch_tpu.utils import tiny

    rng = np.random.RandomState(0)
    model = PVRCNN(**tiny.TINY_PV_CFG)
    view = tiny.tiny_view(rng, b=1, p=256, with_gt=True)
    vox = jax.vmap(lambda p, v: voxelize.voxelize_mean(
        p, v, tiny.TINY_SPEC))(view["points"], view["points_valid"])
    batch = dict(view, voxel_features=vox["features"],
                 voxel_keys=vox["keys"])

    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "sampling": key, "dropout": key}, batch,
        train=True)

    out, _ = model.apply(variables, batch, train=True,
                         rngs={"sampling": key, "dropout": key},
                         mutable=["batch_stats"])
    losses = model.apply(variables, out, batch, method=PVRCNN.loss)
    total = float(losses["loss"])
    assert np.isfinite(total) and total > 0.0

    ev = model.apply(variables, batch, train=False)
    post = jax.device_get(post_processing(ev, score_thresh=0.0))
    assert np.isfinite(post["boxes"]).all()
    assert post["boxes"].shape[-1] == 7
    # decoded headings stay in a sane band (the double-yaw decode bug
    # this guards against pushed them out towards +-2pi)
    v = post["valid"][0]
    if v.any():
        hd = post["boxes"][0][v][:, 6]
        assert np.abs(hd).max() < 2.5 * np.pi
