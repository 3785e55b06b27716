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


def test_onehot_batched_gather_fwd_bwd():
    """Natively-batched one-hot gather matches take_along_axis fwd+bwd
    (explicit batch grid dim; vmap of the pallas_call is not used)."""
    from detmatch_tpu.ops.pallas.onehot_rows import onehot_take_rows_batched
    rng = np.random.RandomState(1)
    b, n, c, q = 3, 40, 8, 21
    x = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, (b, q)).astype(np.int32))
    out = onehot_take_rows_batched(x, idx)
    ref = jnp.take_along_axis(x, idx[..., None], axis=1)
    err = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert err < 0.01, err
    # -1 indices yield zero rows
    idx_m = idx.at[:, 0].set(-1)
    out_m = onehot_take_rows_batched(x, idx_m)
    np.testing.assert_allclose(np.asarray(out_m[:, 0]), 0.0)

    ct = jnp.asarray(rng.randn(b, q, c).astype(np.float32))
    g = jax.grad(lambda xx: jnp.vdot(
        onehot_take_rows_batched(xx, idx), ct))(x)
    g2 = jax.grad(lambda xx: jnp.vdot(
        jnp.take_along_axis(xx, idx[..., None], axis=1), ct))(x)
    err = float(jnp.abs(g - g2).max() / (jnp.abs(g2).max() + 1e-9))
    assert err < 0.01, err


def test_ball_query_batched_matches_xla():
    """Windowed Pallas batched ball query == the XLA impl of the same
    contract (idx + cnt), including validity masks, padding to tile
    boundaries, and the first-neighbor broadcast into unused slots.
    Both scan the points in y-sorted order, so idx must match EXACTLY.
    Additionally: every returned neighbor must be a genuinely in-radius
    valid point, and cnt must equal the brute-force in-radius count."""
    from detmatch_tpu.ops.pallas.ball_query import ball_query_batched
    rng = np.random.RandomState(7)
    b, m, n, ns, radius = 2, 100, 300, 8, 0.9
    centers = jnp.asarray(rng.uniform(-2, 2, (b, m, 3)).astype(np.float32))
    points = jnp.asarray(rng.uniform(-2, 2, (b, n, 3)).astype(np.float32))
    cv = jnp.asarray(rng.rand(b, m) > 0.1)
    pv = jnp.asarray(rng.rand(b, n) > 0.2)
    idx, cnt = ball_query_batched(centers, cv, points, pv, radius, ns,
                                  impl="pallas")
    idx_r, cnt_r = ball_query_batched(centers, cv, points, pv, radius,
                                      ns, impl="xla")
    np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_r))
    # compare idx only where the ball is non-empty (empty → garbage by
    # contract in both implementations)
    nonempty = np.asarray(cnt) > 0
    np.testing.assert_array_equal(
        np.asarray(idx)[nonempty], np.asarray(idx_r)[nonempty])

    # brute-force ground truth: counts and membership
    d2 = np.sum((np.asarray(centers)[:, :, None, :]
                 - np.asarray(points)[:, None, :, :]) ** 2, axis=-1)
    ok = ((d2 <= radius * radius) & np.asarray(pv)[:, None, :]
          & np.asarray(cv)[:, :, None])
    want_cnt = np.minimum(ok.sum(-1), ns)
    np.testing.assert_array_equal(np.asarray(cnt), want_cnt)
    idx_np, cnt_np = np.asarray(idx), np.asarray(cnt)
    for bi in range(b):
        for mi in range(m):
            k = int(cnt_np[bi, mi])
            for s in range(k):
                assert ok[bi, mi, idx_np[bi, mi, s]], (bi, mi, s)
            # padding slots repeat the first neighbor
            if k:
                np.testing.assert_array_equal(
                    idx_np[bi, mi, k:], idx_np[bi, mi, 0])


def test_fps_batched_matches_xla():
    """Pallas batched FPS == vmapped XLA FPS (greedy max-min with
    first-occurrence argmax), incl. validity masks and the all-invalid
    degenerate row."""
    from detmatch_tpu.ops.pallas.fps import fps_batched
    rng = np.random.RandomState(11)
    b, n, k = 3, 500, 64
    xyz = jnp.asarray(rng.uniform(-10, 10, (b, n, 3)).astype(np.float32))
    valid = jnp.asarray(rng.rand(b, n) > 0.2)
    idx_p = fps_batched(xyz, valid, k, impl="pallas")
    idx_x = fps_batched(xyz, valid, k, impl="xla")
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    v2 = valid.at[0].set(False)
    p2 = fps_batched(xyz, v2, k, impl="pallas")
    x2 = fps_batched(xyz, v2, k, impl="xla")
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(x2))


def test_sa_group_mlp_decomposition_exact():
    """SAGroupMLP (first Dense decomposed into per-point + per-center
    terms) == plain MLP on the grouped [rel | feat] tensor, same params
    (the param trees are identical by construction)."""
    from detmatch_tpu.models.layers import MLP
    from detmatch_tpu.models.pvrcnn.vsa import SAGroupMLP, batched_group
    from detmatch_tpu.ops.pallas.ball_query import ball_query_batched
    import jax

    rng = np.random.RandomState(5)
    b, m, n, ns, c, r = 2, 60, 200, 8, 12, 1.2
    kp = jnp.asarray(rng.uniform(-3, 3, (b, m, 3)).astype(np.float32))
    xyz = jnp.asarray(rng.uniform(-3, 3, (b, n, 3)).astype(np.float32))
    feats = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    kv = jnp.asarray(rng.rand(b, m) > 0.1)
    pv = jnp.asarray(rng.rand(b, n) > 0.1)

    idx, cnt = ball_query_batched(kp, kv, xyz, pv, r, ns)
    slot_valid = jnp.arange(ns)[None, None, :] < cnt[..., None]

    mod = SAGroupMLP((16, 24))
    vs = mod.init(jax.random.PRNGKey(0), kp, xyz, feats, idx, slot_valid,
                  cnt, use_running_average=False)
    out, _ = mod.apply(vs, kp, xyz, feats, idx, slot_valid, cnt,
                       use_running_average=False,
                       mutable=["batch_stats"])

    grouped, sv2, cnt2 = batched_group(kp, kv, xyz, pv, feats, r, ns)
    np.testing.assert_array_equal(np.asarray(sv2), np.asarray(slot_valid))
    ref_mod = MLP((16, 24), eps=1e-5)  # SA MLPs use torch-default BN eps
    ref, _ = ref_mod.apply(vs, grouped, mask=slot_valid,
                           use_running_average=False,
                           mutable=["batch_stats"])
    err = float(jnp.abs(jnp.where(slot_valid[..., None], out - ref, 0.0)
                        ).max())
    assert err < 1e-4, err


def test_multilevel_roi_align_matches_per_level():
    """Single-fenced-gather multilevel RoIAlign == per-level roi_align
    selected by the mmdet level rule."""
    from detmatch_tpu.ops.roialign import roi_align, multilevel_roi_align
    rng = np.random.RandomState(9)
    c = 16
    strides = (4, 8, 16, 32)
    feats = [jnp.asarray(rng.randn(96 // (s // 4), 160 // (s // 4), c)
                         .astype(np.float32)) for s in strides]
    r = 24
    cx = rng.uniform(20, 600, r)
    cy = rng.uniform(20, 350, r)
    w = rng.uniform(8, 400, r)
    h = rng.uniform(8, 300, r)
    rois = jnp.asarray(np.stack([cx - w / 2, cy - h / 2,
                                 cx + w / 2, cy + h / 2], 1)
                       .astype(np.float32))
    out = multilevel_roi_align(feats, rois, strides, out_size=7)
    scale = np.sqrt(np.maximum(w * h, 1e-6))
    lvl = np.clip(np.floor(np.log2(scale / 56 + 1e-6)), 0,
                  3).astype(int)
    ref = np.stack([
        np.asarray(roi_align(feats[l], rois[i:i + 1], 1.0 / strides[l],
                             out_size=7))[0]
        for i, l in enumerate(lvl)])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4,
                               atol=1e-4)
