import numpy as np
import jax
import jax.numpy as jnp

from detmatch_tpu.models.pvrcnn.caddn import (CaDDN, bin_depths,
                                              trilinear_sample)

CFG = dict(
    num_classes=3,
    point_cloud_range=(2.0, -8.0, -3.0, 18.0, 8.0, 1.0),
    voxel_size=(0.5, 0.5, 0.5),
    grid_size=(32, 32, 8),
    depth_bins=16,
    depth_range=(2.0, 18.0),
    downsample=4,
)


import pytest
pytestmark = pytest.mark.slow


def _batch(rng, b=1, h=64, w=64, with_gt=True):
    batch = dict(
        images=jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        lidar2cam=jnp.asarray(np.tile(np.array(
            [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
            np.float32), (b, 1, 1))),
        cam2img=jnp.asarray(np.tile(np.array(
            [[32.0, 0, 32.0, 0], [0, 32.0, 32.0, 0], [0, 0, 1.0, 0]],
            np.float32), (b, 1, 1))),
    )
    if with_gt:
        gt = np.zeros((b, 4, 8), np.float32)
        gt[:, :2, 0] = [6.0, 10.0]
        gt[:, :2, 2] = -1.0
        gt[:, :2, 3:6] = [3.9, 1.6, 1.56]
        gt[:, :2, 7] = [3, 1]
        batch["gt_boxes"] = jnp.asarray(gt)
        batch["depth_maps"] = jnp.asarray(
            rng.rand(b, h // 4, w // 4).astype(np.float32) * 16 + 2)
        g2 = np.zeros((b, 4, 4), np.float32)
        g2[:, 0] = [8, 8, 40, 40]
        batch["gt_boxes2d"] = jnp.asarray(g2)
    return batch


def test_bin_depths_lid_roundtrip():
    d = jnp.asarray([2.0, 5.0, 17.9])
    idx = bin_depths(d, "LID", 2.0, 18.0, 16, clamp=False)
    assert float(idx[0]) < 0.6
    assert float(idx[-1]) > 14.0
    clamped = bin_depths(jnp.asarray([100.0, -5.0]), "LID", 2.0, 18.0, 16)
    np.testing.assert_array_equal(np.asarray(clamped), [16, 16])


def test_trilinear_sample_exact_at_grid_points():
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.randn(4, 5, 6, 3).astype(np.float32))
    d = jnp.asarray([1.0, 2.0])
    v = jnp.asarray([3.0, 0.0])
    u = jnp.asarray([2.0, 5.0])
    out = np.asarray(trilinear_sample(vol, d, v, u))
    np.testing.assert_allclose(out[0], np.asarray(vol)[1, 3, 2], atol=1e-5)
    np.testing.assert_allclose(out[1], np.asarray(vol)[2, 0, 5], atol=1e-5)
    # out of range -> 0
    out = np.asarray(trilinear_sample(vol, jnp.asarray([-2.0]),
                                      jnp.asarray([0.0]),
                                      jnp.asarray([0.0])))
    assert np.all(out == 0)


def test_caddn_train_loss_finite():
    batch = _batch(np.random.RandomState(0))
    model = CaDDN(**CFG)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key}, batch, train=True)
    out, _ = model.apply(variables, batch, train=True,
                         mutable=["batch_stats"])
    assert out["batch_box_preds"].shape[-1] == 7
    losses = model.apply(variables, out, batch, method=CaDDN.loss)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert "ddn_loss" in losses
