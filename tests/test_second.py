import numpy as np
import jax
import jax.numpy as jnp

from detmatch_tpu.models.pvrcnn.second import SECOND, second_post_processing
from detmatch_tpu.ops import voxelize

PCR = (0.0, -8.0, -3.0, 16.0, 8.0, 1.0)
CFG = dict(num_classes=3, point_cloud_range=PCR,
           voxel_size=(0.5, 0.5, 0.1), grid_size=(32, 32, 40),
           backbone_caps=(512, 512, 384, 384))
SPEC = voxelize.VoxelizerSpec(point_cloud_range=PCR,
                              voxel_size=(0.5, 0.5, 0.1),
                              max_voxels=512, max_points=5)


import pytest
pytestmark = pytest.mark.slow


def test_second_train_and_post():
    rng = np.random.RandomState(0)
    b, p = 2, 512
    pts = np.stack([
        rng.rand(b, p) * 15 + 0.5, rng.rand(b, p) * 15 - 7.5,
        rng.rand(b, p) * 3.5 - 2.8, rng.rand(b, p)], -1).astype(np.float32)
    vox = jax.vmap(lambda x, v: voxelize.voxelize_mean(x, v, SPEC))(
        jnp.asarray(pts), jnp.ones((b, p), bool))
    gt = np.zeros((b, 8, 8), np.float32)
    gt[:, :2, 0] = [5.0, 10.0]
    gt[:, :2, 1] = [0.0, -3.0]
    gt[:, :2, 2] = -1.0
    gt[:, :2, 3:6] = [3.9, 1.6, 1.56]
    gt[:, :2, 7] = [3, 1]
    batch = dict(voxel_features=vox["features"], voxel_keys=vox["keys"],
                 gt_boxes=jnp.asarray(gt))
    model = SECOND(**CFG)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=True)
    out, _ = model.apply(variables, batch, train=True,
                         mutable=["batch_stats"])
    losses = model.apply(variables, out, batch, method=SECOND.loss)
    assert all(np.isfinite(float(v)) for v in losses.values())
    post = second_post_processing(out, nms_pre=64, nms_post=16,
                                  score_thresh=0.0)
    assert post["boxes"].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(post["boxes"])).all()
