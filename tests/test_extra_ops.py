import numpy as np
import jax
import jax.numpy as jnp

from detmatch_tpu.ops import spconv, voxelize
from detmatch_tpu.ops.pointnet import three_interpolate, three_nn
from detmatch_tpu.ops.roiaware_pool import roiaware_pool
from detmatch_tpu.ssl import boxset


def test_sparse_inverse_conv_roundtrip_positions():
    """Inverse conv lands features exactly on the fine key set; value check
    vs dense transposed conv."""
    rng = np.random.RandomState(0)
    shape_f = (6, 8, 8)
    n = 30
    total = int(np.prod(shape_f))
    fine = np.sort(rng.choice(total, n, replace=False)).astype(np.int32)
    fine_keys = np.full((1, 40), voxelize.INVALID_KEY, np.int32)
    fine_keys[0, :n] = fine
    shape_c = spconv.output_spatial_shape(shape_f, (3, 3, 3), (2, 2, 2),
                                          (1, 1, 1))
    ck, cnt = spconv.downsample_keys_batched(
        jnp.asarray(fine_keys), shape_f, shape_c, (3, 3, 3), (2, 2, 2),
        (1, 1, 1), 40)
    nc = int(cnt[0])
    feats_c = np.zeros((1, 40, 4), np.float32)
    feats_c[0, :nc] = rng.randn(nc, 4)
    w = rng.randn(27, 4, 5).astype(np.float32) * 0.2

    out = spconv.sparse_inverse_conv_batched(
        jnp.asarray(feats_c), ck, jnp.asarray(fine_keys), shape_f,
        shape_c, (3, 3, 3), (2, 2, 2), (1, 1, 1), jnp.asarray(w))
    out = np.asarray(out)[0]

    # dense check: scatter coarse feats, transposed-conv to fine grid
    dense_c = np.zeros(shape_c + (4,), np.float32)
    ckn = np.asarray(ck)[0]
    for i in range(nc):
        z, y, x = np.asarray(voxelize.delinearize(
            ckn[i:i + 1], shape_c))[0]
        dense_c[z, y, x] = feats_c[0, i]
    dense_f = np.zeros(shape_f + (5,), np.float32)
    offs = spconv._offsets((3, 3, 3))
    for q in np.argwhere(np.abs(dense_c).sum(-1) > 0):
        for k, (dz, dy, dx) in enumerate(offs):
            p = q * 2 - 1 + np.array([dz, dy, dx])
            if np.all(p >= 0) and np.all(p < np.array(shape_f)):
                dense_f[tuple(p)] += dense_c[tuple(q)] @ w[k]
    for i in range(n):
        z, y, x = np.asarray(voxelize.delinearize(
            jnp.asarray(fine[i:i + 1]), shape_f))[0]
        np.testing.assert_allclose(out[i], dense_f[z, y, x], atol=1e-4)


def test_roiaware_pool_and_threenn():
    boxes = jnp.asarray(np.array([[0, 0, 0, 2.0, 2.0, 2.0, 0.0]],
                                 np.float32))
    pts = jnp.asarray(np.array(
        [[-0.9, -0.9, -0.9], [0.9, 0.9, 0.9], [5, 5, 5]], np.float32))
    feats = jnp.asarray(np.array([[1.], [2.], [9.]], np.float32))
    out = np.asarray(roiaware_pool(boxes, pts, feats,
                                   jnp.ones(3, bool), grid_size=2))
    assert out[0, 0, 0, 0, 0] == 1.0 and out[0, 1, 1, 1, 0] == 2.0
    assert out[0, 0, 1, 1, 0] == 0.0  # empty cell
    d, i = three_nn(pts[:1], jnp.ones(1, bool), pts, jnp.ones(3, bool))
    interp = three_interpolate(feats, i, d)
    np.testing.assert_allclose(float(interp[0, 0]), 1.0, atol=1e-3)


def test_boxset_average():
    a = dict(boxes=jnp.ones((1, 2, 4)), scores=jnp.ones((1, 2, 3)) * 0.4,
             valid=jnp.asarray([[True, False]]))
    b = dict(boxes=jnp.ones((1, 2, 4)) * 3,
             scores=jnp.ones((1, 2, 3)) * 0.8,
             valid=jnp.asarray([[True, True]]))
    out = boxset.average(a, b)
    np.testing.assert_allclose(np.asarray(out["boxes"][0, 0]), 2.0)
    assert not bool(out["valid"][0, 1])
    np.testing.assert_allclose(np.asarray(out["boxes"][0, 1]), 0.0)


def test_gather_rows_grad_matches_xla():
    """Gradient flows through the one-hot row gather (regression: custom
    VJP residuals once carried non-JAX types and crashed training)."""
    from detmatch_tpu.ops.pallas.onehot_rows import onehot_take_rows
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(40, 8).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 40, (16,)).astype(np.int32))
    g = jax.grad(lambda x: jnp.sum(onehot_take_rows(x, idx) ** 2))(x)
    g2 = jax.grad(lambda x: jnp.sum(x[idx] ** 2))(x)
    err = float(jnp.abs(g - g2).max() / (jnp.abs(g2).max() + 1e-9))
    assert err < 0.01, err
