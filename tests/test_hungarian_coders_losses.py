import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from detmatch_tpu.core import coders, hungarian, losses


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_hungarian_matches_scipy_square(seed):
    rng = np.random.RandomState(seed)
    K = 16
    cost = rng.randn(K, K).astype(np.float32) * 5
    col4row = np.asarray(hungarian.solve(jnp.asarray(cost)))
    rows, cols = linear_sum_assignment(cost)
    got = cost[np.arange(K), col4row].sum()
    want = cost[rows, cols].sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # permutation check
    assert sorted(col4row.tolist()) == list(range(K))


@pytest.mark.parametrize("n,m", [(5, 9), (9, 5), (1, 7), (7, 1), (0, 4)])
def test_hungarian_rectangular_masked(n, m):
    rng = np.random.RandomState(n * 10 + m)
    K = 12
    cost = rng.randn(K, K).astype(np.float32) * 3
    row_valid = np.arange(K) < n
    col_valid = np.arange(K) < m
    col4row, mcost = jax.device_get(hungarian.assign(
        jnp.asarray(cost), jnp.asarray(row_valid), jnp.asarray(col_valid)))
    if n == 0 or m == 0:
        assert (col4row == -1).all()
        return
    rows, cols = linear_sum_assignment(cost[:n, :m])
    want = {r: c for r, c in zip(rows, cols)}
    got = {r: c for r, c in enumerate(col4row) if c >= 0}
    # same number of matches and same total cost (optimum may be non-unique)
    assert len(got) == len(want)
    got_total = sum(cost[r, c] for r, c in got.items())
    want_total = cost[rows, cols].sum()
    np.testing.assert_allclose(got_total, want_total, rtol=1e-4)
    # matched costs reported correctly
    for r, c in got.items():
        np.testing.assert_allclose(mcost[r], cost[r, c], rtol=1e-5)
    assert np.isinf(mcost[~row_valid]).all()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_assign_batched_equals_assign(seed):
    """assign_batched (one oriented solve) == vmapped assign (the
    lax.cond both-branches formulation) element-for-element, across
    mixed orientations/validity in one batch."""
    rng = np.random.RandomState(seed)
    B, K = 6, 12
    cost = (rng.randn(B, K, K) * 3).astype(np.float32)
    nr = rng.randint(0, K + 1, size=B)
    nc = rng.randint(0, K + 1, size=B)
    rv = np.arange(K)[None, :] < nr[:, None]
    cv = np.arange(K)[None, :] < nc[:, None]
    want_c, want_m = jax.device_get(jax.vmap(hungarian.assign)(
        jnp.asarray(cost), jnp.asarray(rv), jnp.asarray(cv)))
    got_c, got_m = jax.device_get(hungarian.assign_batched(
        jnp.asarray(cost), jnp.asarray(rv), jnp.asarray(cv)))
    np.testing.assert_array_equal(got_c, want_c)
    np.testing.assert_array_equal(got_m, want_m)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_jv_kernel_matches_xla(seed):
    """The in-VMEM Pallas JV kernel (interpret mode off-TPU) returns the
    exact same matching vector as the XLA lax-loop solver, including
    first-occurrence tie-breaks (duplicated cost rows force ties)."""
    from detmatch_tpu.ops.pallas import hungarian as pl_hung

    rng = np.random.RandomState(seed)
    B, K = 3, 10
    cost = (rng.randn(B, K, K) * 2).astype(np.float32)
    cost[0, 4] = cost[0, 2]  # exact tie rows
    nr = np.array([K, 5, 1])
    rv = np.arange(K)[None, :] < nr[:, None]
    nc = np.array([K, 7, 4])
    cost = np.where(np.arange(K)[None, None, :] < nc[:, None, None],
                    cost, hungarian.BIG).astype(np.float32)
    want = jax.device_get(pl_hung.solve_masked_batched(
        jnp.asarray(cost), jnp.asarray(rv), impl="xla"))
    got = jax.device_get(pl_hung.solve_masked_batched(
        jnp.asarray(cost), jnp.asarray(rv), impl="pallas"))
    np.testing.assert_array_equal(got, want)


def test_residual_coder_roundtrip():
    rng = np.random.RandomState(0)
    anchors = np.concatenate(
        [rng.randn(20, 3) * 10, rng.rand(20, 3) + 0.5, rng.randn(20, 1)],
        axis=1).astype(np.float32)
    boxes = anchors + rng.randn(20, 7).astype(np.float32) * 0.1
    boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 0.3
    coder = coders.ResidualCoder()
    enc = coder.encode(jnp.asarray(boxes), jnp.asarray(anchors))
    dec = np.asarray(coder.decode(enc, jnp.asarray(anchors)))
    np.testing.assert_allclose(dec, boxes, atol=1e-4)


def test_residual_coder_sincos_roundtrip():
    rng = np.random.RandomState(1)
    anchors = np.concatenate(
        [rng.randn(8, 3), rng.rand(8, 3) + 0.5, rng.rand(8, 1) * 2 - 1],
        axis=1).astype(np.float32)
    boxes = anchors.copy()
    boxes[:, 6] += 0.3
    coder = coders.ResidualCoder(encode_angle_by_sincos=True)
    enc = coder.encode(jnp.asarray(boxes), jnp.asarray(anchors))
    assert enc.shape[-1] == 8
    dec = np.asarray(coder.decode(enc, jnp.asarray(anchors)))
    np.testing.assert_allclose(
        np.sin(dec[:, 6]), np.sin(boxes[:, 6]), atol=1e-4)
    np.testing.assert_allclose(
        np.cos(dec[:, 6]), np.cos(boxes[:, 6]), atol=1e-4)


def test_delta_xywh_roundtrip():
    rng = np.random.RandomState(2)
    x1y1 = rng.rand(10, 2).astype(np.float32) * 100
    prop = np.concatenate([x1y1, x1y1 + rng.rand(10, 2) * 50 + 5], axis=1)
    gt = prop + rng.randn(10, 4).astype(np.float32) * 3
    gt[:, 2:] = np.maximum(gt[:, 2:], gt[:, :2] + 1)
    coder = coders.DeltaXYWHCoder(target_stds=(0.1, 0.1, 0.2, 0.2))
    deltas = coder.encode(jnp.asarray(prop), jnp.asarray(gt))
    dec = np.asarray(coder.decode(jnp.asarray(prop), deltas))
    np.testing.assert_allclose(dec, gt, atol=1e-3)


def test_sigmoid_focal_matches_reference_formula():
    rng = np.random.RandomState(3)
    logits = rng.randn(4, 10, 3).astype(np.float32)
    targets = np.eye(3, dtype=np.float32)[rng.randint(0, 3, (4, 10))]
    w = rng.rand(4, 10).astype(np.float32)
    got = np.asarray(losses.sigmoid_focal_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w)))
    # reference formula in numpy
    p = 1 / (1 + np.exp(-logits))
    alpha_w = targets * 0.25 + (1 - targets) * 0.75
    pt = targets * (1 - p) + (1 - targets) * p
    bce = np.maximum(logits, 0) - logits * targets + np.log1p(
        np.exp(-np.abs(logits)))
    want = alpha_w * pt ** 2 * bce * w[..., None]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_corner_loss_zero_for_identical_and_pi_flip():
    boxes = np.array([[1, 2, 0, 4, 2, 1.5, 0.3]], np.float32)
    flip = boxes.copy()
    flip[:, 6] += np.pi
    out = float(losses.corner_loss_lidar(jnp.asarray(boxes),
                                         jnp.asarray(boxes))[0])
    assert out < 1e-6
    out_flip = float(losses.corner_loss_lidar(jnp.asarray(boxes),
                                              jnp.asarray(flip))[0])
    assert out_flip < 1e-6  # flip-invariant


def test_double_sided_focal_cost_symmetry():
    rng = np.random.RandomState(4)
    l1 = rng.randn(6, 3).astype(np.float32)
    l2 = rng.randn(4, 3).astype(np.float32)
    c12 = np.asarray(losses.double_sided_focal_cost(
        jnp.asarray(l1), jnp.asarray(l2), weight=2.0))
    c21 = np.asarray(losses.double_sided_focal_cost(
        jnp.asarray(l2), jnp.asarray(l1), weight=2.0))
    np.testing.assert_allclose(c12, c21.T, atol=1e-6)
    assert c12.shape == (6, 4)


def test_giou_cost_range():
    b = jnp.asarray(np.array([[0, 0, 10, 10]], np.float32))
    far = jnp.asarray(np.array([[100, 100, 110, 110]], np.float32))
    c_same = float(losses.giou_cost(b, b, weight=1.0)[0, 0])
    c_far = float(losses.giou_cost(b, far, weight=1.0)[0, 0])
    np.testing.assert_allclose(c_same, -1.0, atol=1e-5)
    assert c_far > 0.5  # giou → −1 for far boxes ⇒ cost → +1
