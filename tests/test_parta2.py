import numpy as np
import jax
import jax.numpy as jnp

from detmatch_tpu.models.pvrcnn.parta2 import (PartA2,
                                               PointIntraPartOffsetHead)
from detmatch_tpu.models.pvrcnn.pvrcnn import post_processing
from detmatch_tpu.ops import voxelize
from detmatch_tpu.ops.roiaware_pool import roiaware_pool_capped

PCR = (0.0, -8.0, -3.0, 16.0, 8.0, 1.0)
CFG = dict(num_classes=3, point_cloud_range=PCR,
           voxel_size=(0.5, 0.5, 0.1), grid_size=(32, 32, 40),
           backbone_caps=(512, 512, 384, 384),
           train_nms=dict(nms_pre=256, nms_post=64, nms_thresh=0.8),
           test_nms=dict(nms_pre=256, nms_post=16, nms_thresh=0.7))
SPEC = voxelize.VoxelizerSpec(point_cloud_range=PCR,
                              voxel_size=(0.5, 0.5, 0.1),
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


def test_parta2_train_loss_finite():
    batch = _batch(np.random.RandomState(0))
    model = PartA2(**CFG)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "sampling": key, "dropout": key}, batch, train=True)
    out, _ = model.apply(variables, batch, train=True,
                         rngs={"sampling": key, "dropout": key},
                         mutable=["batch_stats"])
    losses = model.apply(variables, out, batch, method=PartA2.loss)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert "point_loss_part" in losses


def test_parta2_eval_post():
    batch = _batch(np.random.RandomState(1), with_gt=False)
    model = PartA2(**CFG)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "sampling": key, "dropout": key},
                           _batch(np.random.RandomState(0)), train=True)
    out = model.apply(variables, batch, train=False)
    post = post_processing(out, nms_pre=64, nms_post=16, score_thresh=0.0)
    assert post["boxes"].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(post["boxes"])).all()


def test_part_targets_canonical():
    head = PointIntraPartOffsetHead(num_classes=3)
    # one box at origin, axis-aligned 4x2x2, class 2
    gt = np.zeros((1, 3, 8), np.float32)
    gt[0, 0, 3:6] = [4.0, 2.0, 2.0]
    gt[0, 0, 7] = 2
    pts = np.array([[[1.0, 0.5, -0.5], [10.0, 10.0, 10.0]]], np.float32)
    valid = np.ones((1, 2), bool)
    labels, part = jax.device_get(head.targets(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(gt)))
    assert labels[0, 0] == 2 and labels[0, 1] == 0
    np.testing.assert_allclose(part[0, 0], [0.75, 0.75, 0.25], atol=1e-5)
    np.testing.assert_allclose(part[0, 1], 0.0)


def test_roiaware_pool_capped_matches_uncapped_semantics():
    rng = np.random.RandomState(2)
    pts = rng.randn(200, 3).astype(np.float32)
    feats = rng.randn(200, 4).astype(np.float32)
    valid = np.ones(200, bool)
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0.3],
                      [50, 50, 50, 1, 1, 1, 0.0]], np.float32)
    pooled = jax.device_get(roiaware_pool_capped(
        jnp.asarray(boxes), jnp.asarray(pts), jnp.asarray(feats),
        jnp.asarray(valid), grid_size=4, max_pts=64, method="avg"))
    assert pooled.shape == (2, 4, 4, 4, 4)
    assert np.all(pooled[1] == 0)  # empty box
    # every in-box point lands in its cell: verify one cell average
    local = pts  # box 0 at origin, rotate by -0.3
    c, s = np.cos(-0.3), np.sin(-0.3)
    lx = local[:, 0] * c - local[:, 1] * s
    ly = local[:, 0] * s + local[:, 1] * c
    lz = local[:, 2]
    inside = (np.abs(lx) <= 1) & (np.abs(ly) <= 1) & (np.abs(lz) <= 1)
    cell = np.floor((np.stack([lx, ly, lz], -1) + 1) / (2 / 4)).astype(int)
    cell = np.clip(cell, 0, 3)
    sel = inside & (cell[:, 0] == 1) & (cell[:, 1] == 2) & (cell[:, 2] == 0)
    if sel.sum() > 0:
        want = feats[sel].mean(0)
        np.testing.assert_allclose(pooled[0, 1, 2, 0], want, atol=1e-4)
