import numpy as np
import jax
import jax.numpy as jnp

from detmatch_tpu.ops import pointnet, spconv, voxelize


SPEC = voxelize.VoxelizerSpec(
    point_cloud_range=(0.0, -2.0, -1.0, 4.0, 2.0, 1.0),
    voxel_size=(0.5, 0.5, 0.5),
    max_voxels=128,
    max_points=3,
)


def _np_voxelize(points, spec):
    """Dict-based reference voxelization with max_points cap."""
    vox = {}
    pcr = np.asarray(spec.point_cloud_range)
    vs = np.asarray(spec.voxel_size)
    grid = np.round((pcr[3:] - pcr[:3]) / vs).astype(int)
    for p in points:
        c = np.floor((p[:3] - pcr[:3]) / vs).astype(int)
        if np.any(c < 0) or np.any(c >= grid):
            continue
        key = (c[2], c[1], c[0])
        vox.setdefault(key, [])
        if len(vox[key]) < spec.max_points:
            vox[key].append(p)
    return {k: np.mean(v, axis=0) for k, v in vox.items()}


def test_voxelize_mean_matches_numpy():
    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [rng.rand(200, 1) * 5 - 0.5, rng.rand(200, 1) * 5 - 2.5,
         rng.rand(200, 1) * 2.4 - 1.2, rng.rand(200, 1)], axis=1
    ).astype(np.float32)
    valid = np.ones(200, bool)
    valid[190:] = False
    out = jax.device_get(
        voxelize.voxelize_mean(jnp.asarray(pts), jnp.asarray(valid), SPEC))
    want = _np_voxelize(pts[:190], SPEC)
    n = int(out["num_voxels"])
    assert n == len(want), (n, len(want))
    for i in range(n):
        key = tuple(out["coords"][i].tolist())
        assert key in want
        np.testing.assert_allclose(out["features"][i], want[key], atol=1e-5)
    # keys sorted, padding INVALID
    assert np.all(np.diff(out["keys"][:n].astype(np.int64)) > 0)
    assert np.all(out["keys"][n:] == voxelize.INVALID_KEY)


def test_voxelize_all_invalid():
    pts = np.full((50, 4), 100.0, np.float32)  # all out of range
    out = jax.device_get(voxelize.voxelize_mean(
        jnp.asarray(pts), jnp.ones(50, bool), SPEC))
    assert int(out["num_voxels"]) == 0
    assert np.all(out["keys"] == voxelize.INVALID_KEY)


def _random_sparse(rng, shape, n, c_in):
    """Random sparse tensor on a small grid."""
    Z, Y, X = shape
    total = Z * Y * X
    keys = rng.choice(total, size=n, replace=False)
    keys.sort()
    cap = n + 8
    keys_pad = np.full(cap, voxelize.INVALID_KEY, np.int32)
    keys_pad[:n] = keys
    feats = np.zeros((cap, c_in), np.float32)
    feats[:n] = rng.randn(n, c_in)
    return spconv.SparseTensor(
        jnp.asarray(feats), jnp.asarray(keys_pad), jnp.asarray(n))


def _dense_conv(st, shape, weights, kernel, stride, pad):
    """Dense XLA conv on the scattered grid → ground truth."""
    dense = np.asarray(spconv.to_dense(st, shape))  # (Z, Y, X, C)
    kz, ky, kx = kernel
    w = np.asarray(weights).reshape(kz, ky, kx, weights.shape[-2],
                                    weights.shape[-1])
    out = jax.lax.conv_general_dilated(
        jnp.asarray(dense[None]), jnp.asarray(w),
        window_strides=stride, padding=[(pad[0], pad[0]), (pad[1], pad[1]),
                                        (pad[2], pad[2])],
        dimension_numbers=("NZYXC", "ZYXIO", "NZYXC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return np.asarray(out)[0]  # (Z', Y', X', Cout)


def test_subm_conv_matches_dense():
    rng = np.random.RandomState(1)
    shape = (5, 6, 7)
    st = _random_sparse(rng, shape, 40, 4)
    w = jnp.asarray(rng.randn(27, 4, 8).astype(np.float32))
    out, rb = spconv.subm_conv(st, w, shape)
    dense_out = _dense_conv(st, shape, w, (3, 3, 3), (1, 1, 1), (1, 1, 1))
    keys = np.asarray(st.keys)
    got = np.asarray(out.feats)
    for i in range(40):
        z, y, x = np.asarray(voxelize.delinearize(
            jnp.asarray(keys[i:i + 1]), shape))[0]
        np.testing.assert_allclose(got[i], dense_out[z, y, x], atol=1e-4)
    # padding rows zero
    np.testing.assert_array_equal(got[40:], 0)


def test_sparse_conv_strided_matches_dense():
    rng = np.random.RandomState(2)
    shape = (7, 8, 9)
    st = _random_sparse(rng, shape, 50, 3)
    w = jnp.asarray(rng.randn(27, 3, 6).astype(np.float32))
    out, info, out_shape = spconv.sparse_conv(
        st, w, shape, (3, 3, 3), (2, 2, 2), (1, 1, 1), out_cap=128)
    assert out_shape == (4, 4, 5)
    dense_out = _dense_conv(st, shape, w, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    n_out = int(out.nvalid)
    keys = np.asarray(out.keys)
    got = np.asarray(out.feats)
    covered = set()
    for i in range(n_out):
        z, y, x = np.asarray(voxelize.delinearize(
            jnp.asarray(keys[i:i + 1]), out_shape))[0]
        np.testing.assert_allclose(got[i], dense_out[z, y, x], atol=1e-4)
        covered.add((z, y, x))
    # every nonzero dense output site must be covered by the sparse output
    nz = np.argwhere(np.abs(dense_out).sum(-1) > 1e-6)
    for z, y, x in nz:
        assert (z, y, x) in covered


def test_sparse_conv_z_compression():
    """The (3,1,1)-kernel stride-(2,1,1) z-compression layer shape math."""
    rng = np.random.RandomState(3)
    shape = (5, 4, 4)
    st = _random_sparse(rng, shape, 20, 2)
    w = jnp.asarray(rng.randn(3, 2, 4).astype(np.float32))
    out, info, out_shape = spconv.sparse_conv(
        st, w, shape, (3, 1, 1), (2, 1, 1), (0, 0, 0), out_cap=64)
    assert out_shape == (2, 4, 4)
    dense_out = _dense_conv(st, shape, w, (3, 1, 1), (2, 1, 1), (0, 0, 0))
    n_out = int(out.nvalid)
    for i in range(n_out):
        z, y, x = np.asarray(voxelize.delinearize(
            out.keys[i:i + 1], out_shape))[0]
        np.testing.assert_allclose(
            np.asarray(out.feats)[i], dense_out[z, y, x], atol=1e-4)


def test_fps_greedy_property():
    rng = np.random.RandomState(4)
    xyz = rng.randn(100, 3).astype(np.float32)
    valid = np.ones(100, bool)
    valid[80:] = False
    idx = np.asarray(pointnet.farthest_point_sample(
        jnp.asarray(xyz), jnp.asarray(valid), 10))
    assert idx[0] == 0  # starts at first valid
    assert len(set(idx.tolist())) == 10
    assert np.all(idx < 80)
    # greedy check vs numpy
    sel = [0]
    d = np.full(100, np.inf)
    for _ in range(9):
        d = np.minimum(d, ((xyz - xyz[sel[-1]]) ** 2).sum(-1))
        d[~valid] = -1
        sel.append(int(np.argmax(d)))
    np.testing.assert_array_equal(idx, sel)


def test_ball_query_first_k():
    rng = np.random.RandomState(5)
    pts = rng.rand(60, 3).astype(np.float32) * 4
    centers = rng.rand(8, 3).astype(np.float32) * 4
    pv = np.ones(60, bool)
    pv[55:] = False
    cv = np.ones(8, bool)
    idx, cnt = jax.device_get(pointnet.ball_query(
        jnp.asarray(centers), jnp.asarray(cv), jnp.asarray(pts),
        jnp.asarray(pv), 1.0, 4, chunk=4))
    for m in range(8):
        d = ((pts - centers[m]) ** 2).sum(-1)
        want = [i for i in range(55) if d[i] <= 1.0][:4]
        assert cnt[m] == len(want)
        np.testing.assert_array_equal(idx[m, :len(want)], want)
        if want:  # padding slots repeat the first neighbor
            np.testing.assert_array_equal(idx[m, len(want):],
                                          want[0])


def test_group_and_pool_empty_ball_zero():
    pts = np.array([[0, 0, 0], [0.1, 0, 0]], np.float32)
    centers = np.array([[0, 0, 0], [10, 10, 10]], np.float32)
    out = pointnet.group_and_pool(
        jnp.asarray(centers), jnp.ones(2, bool), jnp.asarray(pts),
        jnp.ones(2, bool), None, 0.5, 2,
        mlp_fn=lambda g: g * 2.0 + 1.0)
    out = np.asarray(out)
    assert np.all(out[1] == 0)  # empty ball
    assert np.any(out[0] != 0)


def test_voxelize_capacity_truncation_is_counted():
    """A scene denser than max_voxels must report the exact number of
    occupied voxels cut by the capacity cap (no silent truncation —
    the train loop logs metrics.dropped_voxels from this count)."""
    spec = voxelize.VoxelizerSpec(
        point_cloud_range=(0.0, -2.0, -1.0, 4.0, 2.0, 1.0),
        voxel_size=(0.5, 0.5, 0.5), max_voxels=16, max_points=3)
    rng = np.random.RandomState(3)
    pts = np.concatenate(
        [rng.rand(400, 3) * [4.0, 4.0, 2.0] + [0.0, -2.0, -1.0],
         rng.rand(400, 1)], axis=1).astype(np.float32)
    out = voxelize.voxelize_mean(jnp.asarray(pts),
                                 jnp.ones((400,), bool), spec)
    total_occupied = len(_np_voxelize(pts, spec))
    assert total_occupied > 16
    assert int(out["num_voxels"]) == 16
    assert int(out["num_dropped_voxels"]) == total_occupied - 16
    # healthy config: nothing dropped
    big = voxelize.VoxelizerSpec(
        point_cloud_range=(0.0, -2.0, -1.0, 4.0, 2.0, 1.0),
        voxel_size=(0.5, 0.5, 0.5), max_voxels=256, max_points=3)
    out2 = voxelize.voxelize_mean(jnp.asarray(pts),
                                  jnp.ones((400,), bool), big)
    assert int(out2["num_dropped_voxels"]) == 0
