"""loss_grouped regroups a concat batch exactly like separate passes."""
import numpy as np
import jax
import jax.numpy as jnp

from detmatch_tpu.models.pvrcnn.pvrcnn import PVRCNN
from detmatch_tpu.ops import voxelize

PCR = (0.0, -8.0, -3.0, 16.0, 8.0, 1.0)
CFG = dict(num_classes=3, point_cloud_range=PCR,
           voxel_size=(0.5, 0.5, 0.1), grid_size=(32, 32, 40),
           num_keypoints=64, backbone_caps=(512, 512, 384, 384),
           train_nms=dict(nms_pre=128, nms_post=32, nms_thresh=0.8))
SPEC = voxelize.VoxelizerSpec(point_cloud_range=PCR,
                              voxel_size=(0.5, 0.5, 0.1),
                              max_voxels=512, max_points=5)


import pytest
pytestmark = pytest.mark.slow


def _batch(rng, b):
    p = 256
    pts = np.stack([
        rng.rand(b, p) * 15 + 0.5, rng.rand(b, p) * 15 - 7.5,
        rng.rand(b, p) * 3.5 - 2.8, rng.rand(b, p)], -1).astype(np.float32)
    vox = jax.vmap(lambda x, v: voxelize.voxelize_mean(x, v, SPEC))(
        jnp.asarray(pts), jnp.ones((b, p), bool))
    gt = np.zeros((b, 6, 8), np.float32)
    gt[:, :2, 0] = [5.0, 10.0]
    gt[:, :2, 1] = [0.0, -3.0]
    gt[:, :2, 2] = -1.0
    gt[:, :2, 3:6] = [3.9, 1.6, 1.56]
    gt[:, :2, 7] = [3, 1]
    return dict(points=jnp.asarray(pts),
                points_valid=jnp.ones((b, p), bool),
                voxel_features=vox["features"], voxel_keys=vox["keys"],
                gt_boxes=jnp.asarray(gt))


def test_loss_grouped_matches_separate_passes():
    rng = np.random.RandomState(0)
    batch = _batch(rng, 4)
    model = PVRCNN(**CFG)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "sampling": key, "dropout": key}, batch,
        train=True)
    out, _ = model.apply(variables, batch, train=True,
                         rngs={"sampling": key, "dropout": key},
                         mutable=["batch_stats"])

    masks = {"a": jnp.arange(4) < 2, "b": jnp.arange(4) >= 2}
    grouped = model.apply(variables, out, batch,
                          {k: (m, 1.0) for k, m in masks.items()},
                          method=PVRCNN.loss_grouped)

    for name, m in masks.items():
        idx = np.where(np.asarray(m))[0]
        out_s = jax.tree.map(lambda x: x[idx], out)
        batch_s = jax.tree.map(lambda x: x[idx], batch)
        direct = model.apply(variables, out_s, batch_s,
                             method=PVRCNN.loss)
        for k, v in direct.items():
            if k == "loss":
                continue
            np.testing.assert_allclose(
                float(grouped[f"{name}.{k}"]), float(v), rtol=1e-5,
                atol=1e-6, err_msg=f"{name}.{k}")
    # weighted total
    grouped_w = model.apply(variables, out, batch,
                            {"a": (masks["a"], 1.0),
                             "b": (masks["b"], 0.5)},
                            method=PVRCNN.loss_grouped)
    want = sum(float(grouped[f"a.{k}"]) for k in
               ("rpn_loss_cls", "rpn_loss_loc", "rpn_loss_dir",
                "point_loss_cls", "rcnn_loss_cls", "rcnn_loss_reg",
                "rcnn_loss_corner"))
    want += 0.5 * sum(float(grouped[f"b.{k}"]) for k in
                      ("rpn_loss_cls", "rpn_loss_loc", "rpn_loss_dir",
                       "point_loss_cls", "rcnn_loss_cls", "rcnn_loss_reg",
                       "rcnn_loss_corner"))
    np.testing.assert_allclose(float(grouped_w["loss"]), want, rtol=1e-5)
