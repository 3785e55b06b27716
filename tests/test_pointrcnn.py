import numpy as np
import jax
import jax.numpy as jnp

from detmatch_tpu.core.coders import PointResidualCoder
from detmatch_tpu.models.pvrcnn.pointrcnn import PointRCNN, PointNet2MSG
from detmatch_tpu.models.pvrcnn.pvrcnn import post_processing
from detmatch_tpu.ops.roipoint_pool import roipoint_pool

SMALL = dict(
    num_classes=3,
    train_nms=dict(nms_pre=128, nms_post=32, nms_thresh=0.8),
    test_nms=dict(nms_pre=128, nms_post=16, nms_thresh=0.7),
)
# shrink the backbone for CPU tests
BB = dict(npoints=(64, 32, 16, 8),
          mlps=(((8, 8), (8, 8)), ((16, 16), (16, 16)),
                ((16, 16), (16, 16)), ((16, 16), (16, 16))),
          fp_mlps=((16, 16), (16, 16), (32, 32), (32, 32)))
RH = dict(num_sampled=32, sa_npoints=(16, 8, -1), sa_nsamples=(8, 8, 32),
          sa_mlps=((16, 16), (16, 32), (32, 64)), xyz_up=(16, 16),
          cls_fc=(16,), reg_fc=(16,))


import pytest
pytestmark = pytest.mark.slow


class TinyPointRCNN(PointRCNN):
    def setup(self):
        from detmatch_tpu.models.pvrcnn.pointrcnn import (PointHeadBox,
                                                          PointRCNNHead)
        self.backbone = PointNet2MSG(name="backbone3d", **BB)
        self.point_head = PointHeadBox(num_classes=3, cls_fc=(16,),
                                       reg_fc=(16,), name="point_head")
        self.roi_head = PointRCNNHead(name="roi_head", **RH)


def _batch(rng, b=2, p=256, with_gt=True):
    pts = np.stack([
        rng.rand(b, p) * 15 + 0.5, rng.rand(b, p) * 15 - 7.5,
        rng.rand(b, p) * 3.5 - 2.8, rng.rand(b, p)], -1).astype(np.float32)
    batch = dict(points=jnp.asarray(pts),
                 points_valid=jnp.ones((b, p), bool))
    if with_gt:
        gt = np.zeros((b, 8, 8), np.float32)
        gt[:, :2, 0] = [5.0, 10.0]
        gt[:, :2, 1] = [0.0, -3.0]
        gt[:, :2, 2] = -1.0
        gt[:, :2, 3:6] = [3.9, 1.6, 1.56]
        gt[:, :2, 7] = [3, 1]
        batch["gt_boxes"] = jnp.asarray(gt)
    return batch


def test_pointrcnn_train_loss_finite():
    batch = _batch(np.random.RandomState(0))
    model = TinyPointRCNN(**SMALL)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "sampling": key, "dropout": key}, batch, train=True)
    out, _ = model.apply(variables, batch, train=True,
                         rngs={"sampling": key, "dropout": key},
                         mutable=["batch_stats"])
    losses = model.apply(variables, out, batch, method=PointRCNN.loss)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_pointrcnn_eval_post():
    model = TinyPointRCNN(**SMALL)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "sampling": key, "dropout": key},
        _batch(np.random.RandomState(0)), train=True)
    out = model.apply(variables, _batch(np.random.RandomState(1),
                                        with_gt=False), train=False)
    post = post_processing(out, nms_pre=32, nms_post=8, score_thresh=0.0)
    assert post["boxes"].shape == (2, 8, 7)
    assert np.isfinite(np.asarray(post["boxes"])).all()


def test_point_residual_coder_roundtrip():
    coder = PointResidualCoder()
    rng = np.random.RandomState(3)
    boxes = np.concatenate([
        rng.randn(10, 3), 1.0 + rng.rand(10, 3) * 3,
        rng.uniform(-np.pi, np.pi, (10, 1))], -1).astype(np.float32)
    pts = rng.randn(10, 3).astype(np.float32)
    cls = rng.randint(1, 4, 10)
    enc = coder.encode(jnp.asarray(boxes), jnp.asarray(pts),
                       jnp.asarray(cls))
    dec = np.asarray(coder.decode(enc, jnp.asarray(pts), jnp.asarray(cls)))
    np.testing.assert_allclose(dec[:, :6], boxes[:, :6], atol=1e-4)
    # heading equal mod 2pi
    d = np.abs(np.angle(np.exp(1j * (dec[:, 6] - boxes[:, 6]))))
    assert np.all(d < 1e-4)


def test_roipoint_pool_first_k_and_empty():
    pts = np.array([[0.1, 0, 0], [0.2, 0, 0], [-0.3, 0.2, 0],
                    [5, 5, 5]], np.float32)
    feats = np.arange(8, dtype=np.float32).reshape(4, 2)
    boxes = np.array([[0, 0, 0, 1, 1, 1, 0],
                      [9, 9, 9, 1, 1, 1, 0]], np.float32)
    pooled, empty = jax.device_get(roipoint_pool(
        jnp.asarray(boxes), jnp.asarray(pts), jnp.asarray(feats),
        jnp.ones(4, bool), num_sampled=4))
    assert not empty[0] and empty[1]
    np.testing.assert_allclose(pooled[0, 0, :3], pts[0])
    np.testing.assert_allclose(pooled[0, 2, :3], pts[2])
    # repeat-first padding
    np.testing.assert_allclose(pooled[0, 3], pooled[0, 0])
    assert np.all(pooled[1] == 0)
