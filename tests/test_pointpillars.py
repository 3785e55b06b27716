import numpy as np
import jax
import jax.numpy as jnp

from detmatch_tpu.models.pvrcnn.pointpillars import PointPillars
from detmatch_tpu.ops import voxelize

PCR = (0.0, -8.0, -3.0, 16.0, 8.0, 1.0)
CFG = dict(
    num_classes=3, point_cloud_range=PCR, voxel_size=(0.5, 0.5, 4.0),
    grid_size=(32, 32, 1), max_voxels=256,
)
SPEC = voxelize.VoxelizerSpec(point_cloud_range=PCR,
                              voxel_size=(0.5, 0.5, 4.0),
                              max_voxels=256, max_points=20)


import pytest
pytestmark = pytest.mark.slow


def test_pointpillars_train_and_eval():
    rng = np.random.RandomState(0)
    b, p = 2, 512
    pts = np.stack([
        rng.rand(b, p) * 15 + 0.5, rng.rand(b, p) * 15 - 7.5,
        rng.rand(b, p) * 3.5 - 2.8, rng.rand(b, p)], -1).astype(np.float32)
    valid = np.ones((b, p), bool)
    vox = jax.vmap(lambda x, v: voxelize.voxelize_mean(x, v, SPEC))(
        jnp.asarray(pts), jnp.asarray(valid))
    gt = np.zeros((b, 8, 8), np.float32)
    gt[:, :3, 0] = rng.rand(b, 3) * 12 + 2
    gt[:, :3, 1] = rng.rand(b, 3) * 10 - 5
    gt[:, :3, 2] = -1.0
    gt[:, :3, 3:6] = [3.9, 1.6, 1.56]
    gt[:, :3, 7] = rng.randint(1, 4, (b, 3))
    batch = dict(pillars=vox, gt_boxes=jnp.asarray(gt))

    model = PointPillars(**CFG)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key}, batch, train=True)
    out, mut = model.apply(variables, batch, train=True,
                           mutable=["batch_stats"])
    losses = model.apply(variables, out, batch, method=PointPillars.loss)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    # anchors on stride-2 of a 32x32 grid → 16*16*3cls*2rot boxes
    assert out["batch_box_preds"].shape == (2, 16 * 16 * 6, 7)
    # grads flow to the VFE
    def loss_fn(p):
        o, _ = model.apply({"params": p,
                            "batch_stats": variables["batch_stats"]},
                           batch, train=True, mutable=["batch_stats"])
        return model.apply(variables, o, batch,
                           method=PointPillars.loss)["loss"]
    g = jax.grad(loss_fn)(variables["params"])
    assert float(jnp.abs(g["vfe"]["pfn"]["kernel"]).max()) > 0
