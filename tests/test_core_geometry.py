import numpy as np
import jax.numpy as jnp

from detmatch_tpu.core import geometry, transforms


def test_rotate_points_z_basic():
    pts = np.array([[1.0, 0.0, 0.0, 5.0]], np.float32)
    out = geometry.rotate_points_z(pts, np.float32(np.pi / 2))
    np.testing.assert_allclose(out[0, :3], [0, 1, 0], atol=1e-6)
    assert out[0, 3] == 5.0  # feature channel passes through


def test_corners_3d_axis_aligned():
    boxes = np.array([[1.0, 2.0, 3.0, 4.0, 2.0, 2.0, 0.0]], np.float32)
    corners = np.asarray(geometry.boxes_to_corners_3d(boxes))
    assert corners.shape == (1, 8, 3)
    np.testing.assert_allclose(corners.min(0).min(0), [-1, 1, 2], atol=1e-6)
    np.testing.assert_allclose(corners.max(0).max(0), [3, 3, 4], atol=1e-6)
    # corner 0 = (+x, +y, -z) template
    np.testing.assert_allclose(corners[0, 0], [3, 3, 2], atol=1e-6)


def test_corners_rotation_invariant_volume():
    rng = np.random.RandomState(0)
    boxes = np.concatenate(
        [rng.randn(10, 3), rng.rand(10, 3) + 0.5, rng.rand(10, 1) * 6 - 3],
        axis=1,
    ).astype(np.float32)
    corners = np.asarray(geometry.boxes_to_corners_3d(boxes))
    # edge lengths preserved under rotation
    d01 = np.linalg.norm(corners[:, 0] - corners[:, 1], axis=-1)
    np.testing.assert_allclose(d01, boxes[:, 4], rtol=1e-5)  # dy edge
    d03 = np.linalg.norm(corners[:, 0] - corners[:, 3], axis=-1)
    np.testing.assert_allclose(d03, boxes[:, 3], rtol=1e-5)  # dx edge
    d04 = np.linalg.norm(corners[:, 0] - corners[:, 4], axis=-1)
    np.testing.assert_allclose(d04, boxes[:, 5], rtol=1e-5)  # dz edge


def test_points_in_boxes():
    boxes = np.array([[0, 0, 0, 2, 2, 2, np.pi / 4]], np.float32)
    pts = np.array(
        [[0, 0, 0], [1.2, 0, 0], [0.9, 0.9, 0], [0, 1.3, 0]], np.float32
    )
    mask = np.asarray(geometry.points_in_boxes(pts, boxes))
    # rotated 45deg: +-sqrt(2) reach along axes
    assert mask[0].tolist() == [True, True, False, True]


def test_camera_lidar_roundtrip():
    rng = np.random.RandomState(1)
    # random rigid transform for velo->cam
    ang = 0.3
    rz = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1]], np.float32)
    v2c = np.eye(4, dtype=np.float32)
    v2c[:3, :3] = rz
    v2c[:3, 3] = [0.1, -0.2, 0.3]
    r0 = np.eye(4, dtype=np.float32)
    fwd = r0 @ v2c
    inv = np.linalg.inv(fwd).astype(np.float32)

    boxes_lidar = np.concatenate(
        [rng.randn(5, 3) * 5, rng.rand(5, 3) + 1, rng.randn(5, 1)], axis=1
    ).astype(np.float32)
    cam = geometry.boxes_lidar_to_camera(boxes_lidar, fwd)
    back = geometry.boxes_camera_to_lidar(cam, inv)
    np.testing.assert_allclose(back[:, :6], boxes_lidar[:, :6], atol=1e-4)
    # heading equal modulo 2pi
    d = np.asarray(geometry.limit_period(back[:, 6] - boxes_lidar[:, 6],
                                         offset=0.5, period=2 * np.pi))
    np.testing.assert_allclose(d, 0, atol=1e-4)


def test_projection_simple_pinhole():
    # P = [[f,0,cx,0],[0,f,cy,0],[0,0,1,0],[0,0,0,1]] with cam = lidar frame
    # (x right, y down, z forward): point at z=10 on axis -> principal point.
    P = np.array(
        [[100, 0, 50, 0], [0, 100, 30, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32)
    pts = np.array([[0.0, 0.0, 10.0]], np.float32)
    uv, depth = geometry.project_to_image(pts, P)
    np.testing.assert_allclose(np.asarray(uv)[0], [50, 30], atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), [10.0], atol=1e-6)


def test_aug3d_roundtrip_boxes_and_points():
    """The reference SSL invariant (test_ssl_dataset.py:169-216): reversing
    recorded augs restores the original frame."""
    rng = np.random.RandomState(2)
    boxes = np.concatenate(
        [rng.randn(7, 3) * 10, rng.rand(7, 3) + 0.5, rng.randn(7, 1)], axis=1
    ).astype(np.float32)
    pts = rng.randn(50, 4).astype(np.float32)
    rec = transforms.Aug3D(
        flip_x=np.float32(1.0),
        rot=np.float32(0.4),
        scale=np.float32(1.03),
        trans=np.array([0.5, -0.2, 0.1], np.float32),
    )
    b2 = transforms.reverse_aug3d_boxes(
        transforms.apply_aug3d_boxes(jnp.asarray(boxes), rec), rec)
    np.testing.assert_allclose(np.asarray(b2), boxes, atol=1e-4)
    p2 = transforms.reverse_aug3d_points(
        transforms.apply_aug3d_points(jnp.asarray(pts), rec), rec)
    np.testing.assert_allclose(np.asarray(p2), pts, atol=1e-4)


def test_aug3d_teacher_to_student_consistency():
    """Teacher-frame boxes reversed then re-augmented with student record
    equal directly-student-augmented boxes."""
    rng = np.random.RandomState(3)
    base = np.concatenate(
        [rng.randn(5, 3) * 10, rng.rand(5, 3) + 0.5, rng.randn(5, 1)], axis=1
    ).astype(np.float32)
    shared = transforms.Aug3D(
        flip_x=np.float32(1.0), rot=np.float32(0.0),
        scale=np.float32(1.0), trans=np.zeros(3, np.float32))
    stu_extra = transforms.Aug3D(
        flip_x=np.float32(0.0), rot=np.float32(-0.3),
        scale=np.float32(0.97), trans=np.zeros(3, np.float32))
    tea_boxes = transforms.apply_aug3d_boxes(jnp.asarray(base), shared)
    stu_boxes = transforms.apply_aug3d_boxes(tea_boxes, stu_extra)
    # teacher preds → no-aug frame → student frame
    no_aug = transforms.reverse_aug3d_boxes(tea_boxes, shared)
    via = transforms.apply_aug3d_boxes(
        transforms.apply_aug3d_boxes(no_aug, shared), stu_extra)
    np.testing.assert_allclose(np.asarray(via), np.asarray(stu_boxes),
                               atol=1e-4)


def test_aug2d_roundtrip():
    rng = np.random.RandomState(4)
    x1y1 = rng.rand(6, 2).astype(np.float32) * 100
    boxes = np.concatenate([x1y1, x1y1 + rng.rand(6, 2) * 50 + 1], axis=1)
    rec = transforms.Aug2D(
        scale=np.array([1.5, 1.5, 1.5, 1.5], np.float32),
        flip=np.float32(1.0),
        img_w=np.float32(300.0),
    )
    out = transforms.reverse_aug2d_boxes(
        transforms.apply_aug2d_boxes(jnp.asarray(boxes), rec), rec)
    np.testing.assert_allclose(np.asarray(out), boxes, atol=1e-4)


def test_boxes_3d_to_2d_validity():
    P = np.array(
        [[100, 0, 50, 0], [0, 100, 30, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32)
    # "camera" looks along +z of this frame; boxes use (x,y,z) with z=depth
    boxes = np.array(
        [
            [0, 0, 10, 1, 1, 1, 0.3],    # in front, projects near center
            [0, 0, -10, 1, 1, 1, 0.0],   # behind camera → invalid
        ],
        np.float32,
    )
    bb, valid = geometry.boxes_3d_to_2d(boxes, P, img_shape=(60, 100))
    valid = np.asarray(valid)
    assert valid[0] and not valid[1]
    bb = np.asarray(bb)
    assert (bb[0, 2] > bb[0, 0]) and (bb[0, 3] > bb[0, 1])


def test_limit_period():
    v = np.array([3.5 * np.pi, -0.2, np.pi], np.float32)
    out = np.asarray(geometry.limit_period(v, 0.5, np.pi))
    assert np.all(out >= -np.pi / 2 - 1e-6) and np.all(out < np.pi / 2 + 1e-6)
