import numpy as np
import jax
import jax.numpy as jnp

from detmatch_tpu.models.pvrcnn.second import SECONDIoU
from detmatch_tpu.models.pvrcnn.voxelrcnn import VoxelRCNN
from detmatch_tpu.models.pvrcnn.pvrcnn import post_processing
from detmatch_tpu.ops import voxelize

PCR = (0.0, -8.0, -3.0, 16.0, 8.0, 1.0)
VS = (0.5, 0.5, 0.1)
CFG = dict(num_classes=3, point_cloud_range=PCR, voxel_size=VS,
           grid_size=(32, 32, 40), backbone_caps=(512, 512, 384, 384),
           train_nms=dict(nms_pre=256, nms_post=64, nms_thresh=0.8),
           test_nms=dict(nms_pre=256, nms_post=16, nms_thresh=0.7))
SPEC = voxelize.VoxelizerSpec(point_cloud_range=PCR, voxel_size=VS,
                              max_voxels=512, max_points=5)


import pytest
pytestmark = pytest.mark.slow


def _batch(rng, b=2, p=512, with_gt=True):
    pts = np.stack([
        rng.rand(b, p) * 15 + 0.5, rng.rand(b, p) * 15 - 7.5,
        rng.rand(b, p) * 3.5 - 2.8, rng.rand(b, p)], -1).astype(np.float32)
    vox = jax.vmap(lambda x, v: voxelize.voxelize_mean(x, v, SPEC))(
        jnp.asarray(pts), jnp.ones((b, p), bool))
    batch = dict(voxel_features=vox["features"], voxel_keys=vox["keys"])
    if with_gt:
        gt = np.zeros((b, 8, 8), np.float32)
        gt[:, :2, 0] = [5.0, 10.0]
        gt[:, :2, 1] = [0.0, -3.0]
        gt[:, :2, 2] = -1.0
        gt[:, :2, 3:6] = [3.9, 1.6, 1.56]
        gt[:, :2, 7] = [3, 1]
        batch["gt_boxes"] = jnp.asarray(gt)
    return batch


def test_voxelrcnn_train_and_eval():
    batch = _batch(np.random.RandomState(0))
    model = VoxelRCNN(**CFG)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "sampling": key, "dropout": key}, batch, train=True)
    out, _ = model.apply(variables, batch, train=True,
                         rngs={"sampling": key, "dropout": key},
                         mutable=["batch_stats"])
    losses = model.apply(variables, out, batch, method=VoxelRCNN.loss)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    out = model.apply(variables, _batch(np.random.RandomState(1),
                                        with_gt=False), train=False)
    post = post_processing(out, nms_pre=32, nms_post=8, score_thresh=0.0)
    assert post["boxes"].shape == (2, 8, 7)
    assert np.isfinite(np.asarray(post["boxes"])).all()


def test_secondiou_train_loss():
    batch = _batch(np.random.RandomState(2))
    model = SECONDIoU(**CFG)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "sampling": key, "dropout": key}, batch, train=True)
    out, _ = model.apply(variables, batch, train=True,
                         rngs={"sampling": key, "dropout": key},
                         mutable=["batch_stats"])
    losses = model.apply(variables, out, batch, method=SECONDIoU.loss)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert "rcnn_loss_iou" in losses
