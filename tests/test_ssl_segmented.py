"""Two-segment student-3d gradient == fused concat-step gradient."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

import tests.test_ssl_train as T
from detmatch_tpu.models.frcnn.faster_rcnn import FasterRCNN
from detmatch_tpu.models.pvrcnn.pvrcnn import PVRCNN
from detmatch_tpu.ssl.detector import SSLConfig, SSLDetector
from detmatch_tpu.train.ssl_step import (make_ssl_train_fns_split,
                                         make_stu3d_segmented,
                                         voxelize_views)


import pytest
pytestmark = pytest.mark.slow


def test_segmented_stu3d_matches_fused():
    rng = np.random.RandomState(0)
    batch = dict(
        lab=dict(stu=T._view(rng, with_gt=True), tea=T._view(rng)),
        unlab=dict(stu=T._view(rng), tea=T._view(rng)),
    )
    pv = PVRCNN(**T.PV_CFG)
    fr = FasterRCNN(**T.FR_CFG)
    ssl = SSLDetector(pv, fr, SSLConfig(max_pseudo_gt=16))

    key = jax.random.PRNGKey(0)
    vbatch = voxelize_views(batch, T.SPEC)
    lab3d = vbatch["lab"]["stu"]
    state = ssl.init_states(key, lab3d, lab3d["img"], lab3d["img_shape"])

    tx3 = optax.sgd(1e-2)
    tx2 = optax.sgd(1e-2)
    opt3 = tx3.init(state["student"]["det3d"]["params"])

    teacher_fn, stu3d_fused, _, _ = make_ssl_train_fns_split(
        ssl, tx3, tx2, T.SPEC)
    pseudo, vb = jax.jit(teacher_fn)(state["teacher"], batch)

    v_f, o_f, logs_f = jax.jit(stu3d_fused)(
        state["student"]["det3d"], opt3, vb, pseudo, jnp.int32(3), key)

    stu3d_seg = make_stu3d_segmented(ssl, tx3)
    v_s, o_s, logs_s = stu3d_seg(
        state["student"]["det3d"], opt3, vb, pseudo, jnp.int32(3), key)

    np.testing.assert_allclose(float(logs_s["loss"]),
                               float(logs_f["loss"]), rtol=1e-5)

    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        v_f["params"], v_s["params"])
    worst = max(jax.tree.leaves(diffs))
    assert worst < 1e-4, f"param divergence {worst}"

    stats_diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        v_f["batch_stats"], v_s["batch_stats"])
    assert max(jax.tree.leaves(stats_diff)) < 1e-4
