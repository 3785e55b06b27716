import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detmatch_tpu.models.pvrcnn.pvrcnn import PVRCNN, post_processing
from detmatch_tpu.ops import voxelize

TINY = dict(
    num_classes=3,
    point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
    voxel_size=(0.5, 0.5, 0.1),
    grid_size=(32, 32, 40),
    num_keypoints=64,
    backbone_caps=(512, 512, 384, 384),
    train_nms=dict(nms_pre=256, nms_post=32, nms_thresh=0.8),
    test_nms=dict(nms_pre=256, nms_post=16, nms_thresh=0.7),
)

SPEC = voxelize.VoxelizerSpec(
    point_cloud_range=TINY["point_cloud_range"],
    voxel_size=TINY["voxel_size"], max_voxels=512, max_points=5)


pytestmark = pytest.mark.slow


def _make_batch(rng, b=2, p=512, g=8, with_gt=True):
    pts = np.concatenate([
        rng.rand(b, p, 1) * 16, rng.rand(b, p, 1) * 16 - 8,
        rng.rand(b, p, 1) * 4 - 3, rng.rand(b, p, 1)], axis=-1
    ).astype(np.float32)
    valid = np.ones((b, p), bool)
    valid[:, p - 20:] = False
    vox = jax.vmap(lambda x, v: voxelize.voxelize_mean(x, v, SPEC))(
        jnp.asarray(pts), jnp.asarray(valid))
    batch = dict(
        points=jnp.asarray(pts), points_valid=jnp.asarray(valid),
        voxel_features=vox["features"], voxel_keys=vox["keys"])
    if with_gt:
        gt = np.zeros((b, g, 8), np.float32)
        for bi in range(b):
            n = rng.randint(2, g)
            gt[bi, :n, 0] = rng.rand(n) * 14 + 1
            gt[bi, :n, 1] = rng.rand(n) * 12 - 6
            gt[bi, :n, 2] = -1.0
            gt[bi, :n, 3:6] = np.array([3.9, 1.6, 1.56]) * (
                0.8 + 0.4 * rng.rand(n, 3))
            gt[bi, :n, 6] = rng.rand(n) * 6 - 3
            gt[bi, :n, 7] = rng.randint(1, 4, n)
        batch["gt_boxes"] = jnp.asarray(gt)
    return batch


@pytest.fixture(scope="module")
def model_and_vars():
    model = PVRCNN(**TINY)
    rng = np.random.RandomState(0)
    batch = _make_batch(rng)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "sampling": key, "dropout": key},
        batch, train=True)
    return model, variables, batch


def test_train_forward_and_loss_finite(model_and_vars):
    model, variables, batch = model_and_vars
    key = jax.random.PRNGKey(1)
    out, _ = model.apply(
        variables, batch, train=True,
        rngs={"sampling": key, "dropout": key},
        mutable=["batch_stats"])
    losses = model.apply(variables, out, batch, method=PVRCNN.loss)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(losses["loss"]) > 0
    # shapes
    # train rois are the 128 sampled targets (ROI_PER_IMAGE)
    assert out["rois"].shape == (2, 128, 7)
    assert out["rcnn_cls"].shape == (2, 128, 1)
    assert out["rcnn_reg"].shape == (2, 128, 7)
    assert out["roi_scores_full"].shape == (2, 128, 3)


def test_eval_forward_and_postprocess(model_and_vars):
    model, variables, batch = model_and_vars
    out = model.apply(variables, batch, train=False)
    assert out["rois"].shape == (2, 16, 7)
    post = post_processing(out, nms_pre=64, nms_post=16, nms_thresh=0.1,
                           score_thresh=0.0)
    assert post["boxes"].shape == (2, 16, 7)
    assert post["sem_scores_full"].shape == (2, 16, 3)
    v = np.asarray(post["valid"])
    s = np.asarray(post["scores"])
    assert np.isfinite(np.asarray(post["boxes"])).all()
    assert (s[v] >= 0).all() and (s[v] <= 1).all()
    # sem_scores_full max matches label (reference invariant,
    # detector3d_template.py:283-284)
    ff = np.asarray(post["sem_scores_full"])
    ll = np.asarray(post["labels"])
    if v.any():
        np.testing.assert_array_equal(
            ff[v].argmax(-1) + 1, ll[v])


def test_grads_flow(model_and_vars):
    model, variables, batch = model_and_vars
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}
    key = jax.random.PRNGKey(2)

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, **other}, batch, train=True,
            rngs={"sampling": key, "dropout": key},
            mutable=["batch_stats"])
        losses = model.apply({"params": p, **other}, out, batch,
                             method=PVRCNN.loss)
        return losses["loss"]

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # at least the backbone and heads get nonzero grads
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total > 0
