import numpy as np
import jax.numpy as jnp

from detmatch_tpu.core import geometry, iou, nms


def _grid_overlap(b1, b2, res=512):
    """Brute-force rasterized intersection area of two BEV boxes."""
    c1 = np.asarray(geometry.boxes_to_corners_bev(b1[None]))[0]
    c2 = np.asarray(geometry.boxes_to_corners_bev(b2[None]))[0]
    lo = np.minimum(c1.min(0), c2.min(0)) - 0.1
    hi = np.maximum(c1.max(0), c2.max(0)) + 0.1
    xs = np.linspace(lo[0], hi[0], res)
    ys = np.linspace(lo[1], hi[1], res)
    X, Y = np.meshgrid(xs, ys)
    pts = np.stack([X.ravel(), Y.ravel()], -1).astype(np.float32)

    def inside(c):
        a = c
        b = np.roll(c, -1, axis=0)
        cross = (
            (b[None, :, 0] - a[None, :, 0]) * (pts[:, None, 1] - a[None, :, 1])
            - (b[None, :, 1] - a[None, :, 1]) * (pts[:, None, 0] - a[None, :, 0])
        )
        return np.all(cross >= 0, axis=1)

    cell = (hi - lo) / (res - 1)
    return np.sum(inside(c1) & inside(c2)) * cell[0] * cell[1]


def test_iou2d_known():
    b1 = np.array([[0, 0, 2, 2]], np.float32)
    b2 = np.array([[1, 1, 3, 3], [0, 0, 2, 2], [5, 5, 6, 6]], np.float32)
    out = np.asarray(iou.iou2d(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(out[0], [1 / 7, 1.0, 0.0], atol=1e-6)


def test_giou2d_disjoint_negative():
    b1 = np.array([[0, 0, 1, 1]], np.float32)
    b2 = np.array([[2, 2, 3, 3]], np.float32)
    g = np.asarray(iou.iou2d(jnp.asarray(b1), jnp.asarray(b2), mode="giou"))
    assert g[0, 0] < 0


def test_rotated_iou_identical_and_disjoint():
    b = np.array([[0, 0, 2, 4, 0.7]], np.float32)
    out = np.asarray(iou.rotated_iou_bev(jnp.asarray(b), jnp.asarray(b)))
    np.testing.assert_allclose(out, [[1.0]], atol=1e-4)
    far = b.copy()
    far[0, 0] += 100
    out = np.asarray(iou.rotated_iou_bev(jnp.asarray(b), jnp.asarray(far)))
    np.testing.assert_allclose(out, [[0.0]], atol=1e-6)


def test_rotated_iou_axis_aligned_matches_iou2d():
    rng = np.random.RandomState(0)
    n = 8
    ctr = rng.rand(n, 2).astype(np.float32) * 4
    wh = rng.rand(n, 2).astype(np.float32) * 3 + 0.5
    bev = np.concatenate([ctr, wh, np.zeros((n, 1), np.float32)], axis=1)
    xyxy = np.concatenate([ctr - wh / 2, ctr + wh / 2], axis=1)
    r = np.asarray(iou.rotated_iou_bev(jnp.asarray(bev), jnp.asarray(bev)))
    a = np.asarray(iou.iou2d(jnp.asarray(xyxy), jnp.asarray(xyxy)))
    np.testing.assert_allclose(r, a, atol=1e-4)


def test_rotated_overlap_vs_rasterized():
    rng = np.random.RandomState(1)
    for _ in range(12):
        b1 = np.array(
            [rng.randn() * 2, rng.randn() * 2, rng.rand() * 3 + 0.5,
             rng.rand() * 3 + 0.5, rng.rand() * 6 - 3], np.float32)
        b2 = np.array(
            [rng.randn() * 2, rng.randn() * 2, rng.rand() * 3 + 0.5,
             rng.rand() * 3 + 0.5, rng.rand() * 6 - 3], np.float32)
        got = float(iou.rotated_overlap_bev(jnp.asarray(b1[None]),
                                            jnp.asarray(b2[None]))[0, 0])
        want = _grid_overlap(b1, b2)
        assert abs(got - want) < 0.05, (got, want, b1, b2)


def test_iou3d_known():
    b1 = np.array([[0, 0, 0, 2, 2, 2, 0]], np.float32)
    b2 = np.array([[1, 0, 0, 2, 2, 2, 0]], np.float32)  # half x-overlap
    out = float(iou.iou3d(jnp.asarray(b1), jnp.asarray(b2))[0, 0])
    np.testing.assert_allclose(out, (1 * 2 * 2) / (8 + 8 - 4), atol=1e-4)


def test_nearest_bev_iou_snaps_heading():
    b1 = np.array([[0, 0, 0, 4, 2, 1, 0.0]], np.float32)
    # heading ~pi/2 → dx/dy swap in the aligned view
    b2 = np.array([[0, 0, 0, 2, 4, 1, np.pi / 2]], np.float32)
    out = float(iou.nearest_bev_iou(jnp.asarray(b1), jnp.asarray(b2))[0, 0])
    np.testing.assert_allclose(out, 1.0, atol=1e-5)


def _np_greedy_nms_2d(boxes, scores, thr):
    # stable: equal scores keep lowest index first (matches argmax and
    # jnp stable-argsort tie-breaking)
    order = np.argsort(-scores, kind="stable")
    keep = []
    alive = np.ones(len(boxes), bool)
    for i in order:
        if not alive[i] or scores[i] <= nms.NEG_INF / 2:
            continue
        keep.append(i)
        ious = np.asarray(iou.iou2d(jnp.asarray(boxes[i][None]),
                                    jnp.asarray(boxes)))[0]
        alive &= ious <= thr
    return keep


def test_nms_2d_matches_numpy_greedy():
    rng = np.random.RandomState(2)
    n = 40
    x1y1 = rng.rand(n, 2).astype(np.float32) * 50
    boxes = np.concatenate([x1y1, x1y1 + rng.rand(n, 2) * 30 + 2], axis=1)
    scores = rng.rand(n).astype(np.float32)
    idx, valid = nms.nms_2d(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 20)
    got = np.asarray(idx)[np.asarray(valid)]
    want = _np_greedy_nms_2d(boxes, scores, 0.5)[:20]
    np.testing.assert_array_equal(got, want)


def test_nms_bev_suppresses_duplicates():
    boxes = np.array(
        [
            [0, 0, 0, 4, 2, 1.5, 0.3],
            [0.1, 0.05, 0, 4, 2, 1.5, 0.32],  # near-duplicate
            [10, 10, 0, 4, 2, 1.5, -0.3],
        ],
        np.float32,
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    idx, valid = nms.nms_bev(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 3)
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, [0, 2])


def test_nms_padding_ignored():
    boxes = np.array([[0, 0, 2, 2], [10, 10, 12, 12]], np.float32)
    boxes = np.concatenate([boxes, np.zeros((3, 4), np.float32)], axis=0)
    scores = np.array([0.9, 0.8, nms.NEG_INF, nms.NEG_INF, nms.NEG_INF],
                      np.float32)
    idx, valid = nms.nms_2d(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 5)
    assert np.asarray(valid).sum() == 2
    np.testing.assert_array_equal(np.asarray(idx)[:2], [0, 1])


def test_batched_nms_classes_dont_suppress():
    boxes = np.array([[0, 0, 2, 2], [0, 0, 2, 2]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    labels = np.array([0, 1], np.int32)
    idx, valid = nms.batched_nms_2d(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels), 0.5, 2)
    assert np.asarray(valid).sum() == 2


def test_nms_2d_fixed_point_matches_greedy_large():
    """The fixed-point NMS must equal serial greedy on dense, tied,
    padded inputs (n=500, heavy overlap, duplicated scores)."""
    rng = np.random.RandomState(7)
    n = 500
    x1y1 = rng.rand(n, 2).astype(np.float32) * 40  # dense field
    boxes = np.concatenate([x1y1, x1y1 + rng.rand(n, 2) * 25 + 2], axis=1)
    scores = np.round(rng.rand(n).astype(np.float32), 2)  # force ties
    scores[-20:] = nms.NEG_INF  # padding
    for thr in (0.3, 0.5, 0.7):
        idx, valid = nms.nms_2d(jnp.asarray(boxes), jnp.asarray(scores),
                                thr, 128)
        got = np.asarray(idx)[np.asarray(valid)]
        want = _np_greedy_nms_2d(boxes, scores, thr)[:128]
        np.testing.assert_array_equal(got, want)
