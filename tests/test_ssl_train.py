"""End-to-end DetMatch SSL train step on tiny synthetic data (CPU mesh).

Covers: teacher 3D/2D inference, de-aug/re-aug, fusion Hungarian matching,
hard pseudo-labels (3D full / 2D cls-only), student 3D→2D projection +
second matching + consistency loss, hybrid optimizer update, EMA teacher.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detmatch_tpu.models.frcnn.faster_rcnn import FasterRCNN
from detmatch_tpu.models.pvrcnn.pvrcnn import PVRCNN
from detmatch_tpu.ssl.detector import (SSLConfig, SSLDetector, ema_decay_at,
                                       ssl_weight_at)
from detmatch_tpu.train.optim import detmatch_ssl_optimizer
from detmatch_tpu.train.ssl_step import make_ssl_train_fns
from detmatch_tpu.utils.tiny import (TINY_CANVAS as CANVAS,
                                     TINY_FR_CFG as FR_CFG,
                                     TINY_PCR as PCR,
                                     TINY_PV_CFG as PV_CFG,
                                     TINY_SPEC as SPEC,
                                     tiny_view as _view)


@pytest.mark.slow
def test_ssl_train_step_end_to_end():
    rng = np.random.RandomState(0)
    batch = dict(
        lab=dict(stu=_view(rng, with_gt=True), tea=_view(rng)),
        unlab=dict(stu=_view(rng), tea=_view(rng)),
    )
    pv = PVRCNN(**PV_CFG)
    fr = FasterRCNN(**FR_CFG)
    ssl = SSLDetector(pv, fr, SSLConfig(max_pseudo_gt=16))

    key = jax.random.PRNGKey(0)
    from detmatch_tpu.train.ssl_step import voxelize_views
    vbatch = voxelize_views(batch, SPEC)
    lab3d = vbatch["lab"]["stu"]
    state = ssl.init_states(key, lab3d, lab3d["img"], lab3d["img_shape"])

    tx = detmatch_ssl_optimizer(
        {det: v["params"] for det, v in state["student"].items()},
        lr_3d=1e-3, lr_2d=1e-3)
    opt_state = tx.init({det: v["params"]
                         for det, v in state["student"].items()})

    teacher_fn, student_fn = make_ssl_train_fns(ssl, tx, SPEC)
    teacher_jit = jax.jit(teacher_fn)
    student_jit = jax.jit(student_fn)
    pseudo, vb2 = teacher_jit(state["teacher"], batch)
    new_state, new_opt, logs = student_jit(
        state, opt_state, vb2, pseudo, jnp.int32(0), jax.random.PRNGKey(1))
    logs = jax.device_get(logs)
    assert np.isfinite(logs["loss"]), logs
    # all loss channels present and finite
    for want in ("sup.3d.rpn_loss_cls", "sup.2d.loss_cls",
                 "ssl.unlab.hard_pseudo_3d.rpn_loss_cls",
                 "ssl.unlab.hard_pseudo_2d.loss_cls",
                 "ssl.unlab.2D_to_3D_hung.cls_loss",
                 "metrics.num_tea_hung"):
        assert want in logs and np.isfinite(logs[want]), want
    # student params moved; teacher = EMA mix (moved less)
    s_old = state["student"]["det3d"]["params"]
    s_new = new_state["student"]["det3d"]["params"]
    t_new = new_state["teacher"]["det3d"]["params"]
    leaf_old = jax.tree_util.tree_leaves(s_old)[0]
    leaf_new = jax.tree_util.tree_leaves(s_new)[0]
    leaf_t = jax.tree_util.tree_leaves(t_new)[0]
    d_student = float(jnp.abs(leaf_new - leaf_old).max())
    d_teacher = float(jnp.abs(leaf_t - leaf_old).max())
    assert d_student > 0
    assert d_teacher <= d_student + 1e-9
    # EMA decay at iter 0 with rampup_start_decay .99 → 1 - 1/100 = .99
    np.testing.assert_allclose(float(logs["ssl.ema_decay"]), 0.99,
                               atol=1e-6)
    assert float(logs["ssl.weight"]) == 1.0


def test_ramp_schedules():
    cfg = SSLConfig()
    np.testing.assert_allclose(float(ema_decay_at(0, cfg)), 0.99)
    np.testing.assert_allclose(float(ema_decay_at(100000, cfg)), 0.999)
    cfg2 = SSLConfig(ssl_weight_rampup_start_iter=10,
                     ssl_weight_rampup_num_iter=100)
    assert float(ssl_weight_at(5, cfg2)) == 0.0
    assert float(ssl_weight_at(60, cfg2)) < 1.0
    np.testing.assert_allclose(float(ssl_weight_at(110, cfg2)), 1.0,
                               atol=1e-6)


def test_skip_nonfinite_guards_params():
    """A non-finite gradient step must leave params and inner optimizer
    state untouched (and count the skip); a finite step must update.
    Regression: one inf grad used to poison params permanently (inf →
    NaN clip scale → NaN params forever)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from detmatch_tpu.train.optim import (SkipNonfiniteState,
                                          detmatch_branch_optimizers)

    tx3, _ = detmatch_branch_optimizers(1e-3, 1e-3)
    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    state = tx3.init(params)
    assert isinstance(state, SkipNonfiniteState)

    good = {"w": jnp.full((4,), 0.5), "b": jnp.ones((2,))}
    bad = {"w": jnp.array([1.0, jnp.inf, 0.0, 0.0]),
           "b": jnp.array([jnp.nan, 0.0])}

    step = jax.jit(lambda g, s, p: tx3.update(g, s, p))
    u1, s1 = step(good, state, params)
    p1 = optax.apply_updates(params, u1)
    assert int(s1.skipped) == 0
    assert np.isfinite(np.asarray(p1["w"])).all()
    assert float(jnp.abs(p1["w"] - params["w"]).max()) > 0

    u2, s2 = step(bad, s1, p1)
    p2 = optax.apply_updates(p1, u2)
    assert int(s2.skipped) == 1
    np.testing.assert_array_equal(np.asarray(p2["w"]), np.asarray(p1["w"]))
    np.testing.assert_array_equal(np.asarray(p2["b"]), np.asarray(p1["b"]))
    # inner momenta untouched by the bad step
    for a, b in zip(jax.tree.leaves(s1.inner), jax.tree.leaves(s2.inner)):
        if hasattr(a, "shape") and a.shape == getattr(b, "shape", None):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    u3, s3 = step(good, s2, p2)
    p3 = optax.apply_updates(p2, u3)
    assert int(s3.skipped) == 1
    assert np.isfinite(np.asarray(p3["w"])).all()
    assert float(jnp.abs(p3["w"] - p2["w"]).max()) > 0
