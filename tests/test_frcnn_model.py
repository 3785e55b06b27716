import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detmatch_tpu.models.frcnn.faster_rcnn import FasterRCNN

CANVAS = (64, 128)


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    model = FasterRCNN(
        canvas=CANVAS, train_rpn_nms_pre=128, train_rpn_max=64,
        test_rpn_nms_pre=128, test_rpn_max=32, rcnn_num_samples=32)
    rng = np.random.RandomState(0)
    images = rng.randn(2, CANVAS[0], CANVAS[1], 3).astype(np.float32)
    shapes = jnp.asarray([[64, 128], [60, 100]], jnp.float32)
    gt = np.zeros((2, 4, 4), np.float32)
    gt[:, :2, 0] = [[10, 50], [20, 60]]
    gt[:, :2, 1] = [[10, 20], [15, 25]]
    gt[:, :2, 2] = gt[:, :2, 0] + 30
    gt[:, :2, 3] = gt[:, :2, 1] + 20
    gt_labels = np.zeros((2, 4), np.int32)
    gt_labels[:, :2] = [[0, 2], [1, 0]]
    gt_valid = np.zeros((2, 4), bool)
    gt_valid[:, :2] = True
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key}, jnp.asarray(images), shapes,
                           train=True)
    return (model, variables, jnp.asarray(images), shapes,
            jnp.asarray(gt), jnp.asarray(gt_labels), jnp.asarray(gt_valid))


def test_frcnn_train_losses_finite(setup):
    model, variables, images, shapes, gt, gl, gv = setup
    fwd = model.apply(variables, images, shapes, train=True)
    assert fwd["proposals"].shape == (2, 64, 4)
    losses = model.apply(variables, jax.random.PRNGKey(1), fwd, gt, gl, gv,
                         method=FasterRCNN.loss)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert set(losses) == {"loss_rpn_cls", "loss_rpn_bbox", "loss_cls",
                           "loss_bbox"}


def test_frcnn_simple_test(setup):
    model, variables, images, shapes, gt, gl, gv = setup
    res = model.apply(variables, images, shapes, method=FasterRCNN.simple_test)
    assert res["boxes"].shape == (2, 100, 4)
    assert res["scores_full"].shape == (2, 100, 4)  # C+1 sigmoid scores
    s = np.asarray(res["scores_full"])
    assert (s >= 0).all() and (s <= 1).all()
    # boxes clipped to per-image shape
    b1 = np.asarray(res["boxes"][1])
    v1 = np.asarray(res["valid"][1])
    if v1.any():
        assert b1[v1, 2].max() <= 100 + 1e-3
        assert b1[v1, 3].max() <= 60 + 1e-3


def test_frcnn_pre_nms_test_path(setup):
    model, variables, images, shapes, gt, gl, gv = setup
    res = model.apply(variables, images, shapes, with_nms=False,
                      method=FasterRCNN.simple_test)
    # pre-NMS: per-proposal per-class boxes + full score rows
    assert res["boxes"].shape == (2, 32, 3, 4)
    assert res["scores"].shape == (2, 32, 4)


def test_frcnn_grads_nonzero_and_frozen_stem(setup):
    model, variables, images, shapes, gt, gl, gv = setup
    params = variables["params"]
    frozen = variables["frozen"]

    def loss_fn(p):
        fwd = model.apply({"params": p, "frozen": frozen}, images, shapes,
                          train=True)
        losses = model.apply({"params": p, "frozen": frozen},
                             jax.random.PRNGKey(1), fwd, gt, gl, gv,
                             method=FasterRCNN.loss)
        return sum(losses.values())

    grads = jax.grad(loss_fn)(params)
    # stem + layer1 frozen via stop_gradient
    stem = grads["backbone"]["conv1"]["kernel"]
    assert float(jnp.abs(stem).max()) == 0.0
    l1 = grads["backbone"]["layer1_0"]["conv1"]["kernel"]
    assert float(jnp.abs(l1).max()) == 0.0
    # later stages train
    l3 = grads["backbone"]["layer3_0"]["conv1"]["kernel"]
    assert float(jnp.abs(l3).max()) > 0.0
    rpn = grads["rpn_head"]["rpn_conv"]["kernel"]
    assert float(jnp.abs(rpn).max()) > 0.0
