"""3D box geometry under ONE internal convention (pure jnp, numpy-compatible).

Internal 3D box convention (matches reference semantics of
``pcdet/utils/box_utils.py:28-53`` / ``common_utils.py:34-57``):

    box = (x, y, z, dx, dy, dz, heading)

* ``(x, y, z)`` is the box **gravity center** in the LiDAR frame
  (x forward, y left, z up).
* ``(dx, dy, dz)`` are the full sizes along the box-frame x/y/z axes.
* ``heading`` is CCW rotation around +z, measured from +x.

Unlike the reference (which juggles mmdet3d- and OpenPCDet-style boxes and
converts at module boundaries, ``mmdet3d/models/detectors/openpcdet.py:78-235``),
this framework uses exactly one convention everywhere; conversions exist only
at KITTI camera-frame I/O (see :func:`boxes_camera_to_lidar` /
:func:`boxes_lidar_to_camera`).

All functions work on either numpy or jax arrays (the namespace is picked
from the input type) so the host data pipeline and the jitted device code
share one implementation.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _xp(*arrays):
    """Pick the array namespace: numpy iff every array input is numpy."""
    for a in arrays:
        if not isinstance(a, (np.ndarray, np.generic, float, int, list, tuple)):
            return jnp
    return np


def limit_period(val, offset=0.5, period=np.pi):
    """Wrap ``val`` into ``[-offset*period, (1-offset)*period)``.

    Reference: ``pcdet/utils/common_utils.py:20-23``.
    """
    xp = _xp(val)
    return val - xp.floor(val / period + offset) * period


def rotation_matrix_z(angle, xp=None):
    """(..., 3, 3) CCW rotation matrices around +z for row-vector points.

    ``points @ R`` rotates points CCW by ``angle`` (x towards y), matching
    reference ``common_utils.rotate_points_along_z`` semantics.
    """
    xp = xp or _xp(angle)
    c, s = xp.cos(angle), xp.sin(angle)
    zeros, ones = xp.zeros_like(c), xp.ones_like(c)
    rot = xp.stack([c, s, zeros, -s, c, zeros, zeros, zeros, ones], axis=-1)
    return rot.reshape(rot.shape[:-1] + (3, 3))


def rotate_points_z(points, angle):
    """Rotate points CCW around +z.

    Args:
        points: (..., N, 3 + C) — extra feature channels pass through.
        angle: (...) broadcastable batch of angles (radians).

    Reference semantics: ``pcdet/utils/common_utils.py:34-57``. Implemented
    elementwise (VPU) rather than as a 3x3 matmul: exact in f32 (TPU matmuls
    default to bf16 passes) and cheaper than an MXU dispatch.
    """
    xp = _xp(points, angle)
    angle = xp.asarray(angle)
    c = xp.cos(angle)[..., None]
    s = xp.sin(angle)[..., None]
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    xr = x * c - y * s
    yr = x * s + y * c
    xyz = xp.stack([xr, yr, z], axis=-1)
    return xp.concatenate([xyz, points[..., 3:]], axis=-1)


# Corner template in pcdet order (pcdet/utils/box_utils.py:28-53):
#     7 -------- 4
#    /|         /|
#   6 -------- 5 .
#   | |        | |
#   . 3 -------- 0
#   |/         |/
#   2 -------- 1
_CORNER_TEMPLATE = np.array(
    [
        [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
        [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
    ],
    dtype=np.float32,
) / 2.0


def boxes_to_corners_3d(boxes):
    """(N, 7[+]) boxes → (N, 8, 3) corners, pcdet corner order."""
    xp = _xp(boxes)
    template = xp.asarray(_CORNER_TEMPLATE, dtype=boxes.dtype)
    corners = boxes[:, None, 3:6] * template[None, :, :]  # (N, 8, 3)
    corners = rotate_points_z(corners, boxes[:, 6])
    return corners + boxes[:, None, 0:3]


def boxes_to_corners_bev(boxes):
    """(N, 5|7) BEV boxes → (N, 4, 2) corners CCW.

    Input is (cx, cy, dx, dy, angle) or a full 7-dof box (uses x, y, dx, dy,
    heading). Corners are ordered counter-clockwise for positive-area
    shoelace.
    """
    xp = _xp(boxes)
    if boxes.shape[-1] >= 7:
        cxy, dxy, ang = boxes[:, 0:2], boxes[:, 3:5], boxes[:, 6]
    else:
        cxy, dxy, ang = boxes[:, 0:2], boxes[:, 2:4], boxes[:, 4]
    template = xp.asarray(
        np.array([[1, 1], [-1, 1], [-1, -1], [1, -1]], dtype=np.float32) / 2.0,
        dtype=boxes.dtype,
    )
    corners = dxy[:, None, :] * template[None, :, :]  # (N, 4, 2)
    c, s = xp.cos(ang), xp.sin(ang)
    x = corners[..., 0] * c[:, None] - corners[..., 1] * s[:, None]
    y = corners[..., 0] * s[:, None] + corners[..., 1] * c[:, None]
    return xp.stack([x, y], axis=-1) + cxy[:, None, :]


def boxes_to_bev(boxes):
    """(N, 7) → (N, 5) (cx, cy, dx, dy, heading)."""
    xp = _xp(boxes)
    return xp.concatenate([boxes[:, 0:2], boxes[:, 3:5], boxes[:, 6:7]], axis=-1)


def boxes_to_aligned_bev(boxes):
    """(N, 7) → (N, 4) axis-aligned BEV xyxy (ignores rotation, uses dx/dy).

    Matches reference ``boxes3d_lidar_to_aligned_bev_boxes``
    (``pcdet/utils/box_utils.py``): half-size box around the center after
    snapping heading to the nearest axis.
    """
    xp = _xp(boxes)
    rot = limit_period(boxes[:, 6], offset=0.5, period=np.pi)
    cond = (xp.abs(rot) > np.pi / 4)[..., None]
    dxy = xp.where(cond, boxes[:, [4, 3]], boxes[:, [3, 4]])
    return xp.concatenate(
        [boxes[:, 0:2] - dxy / 2, boxes[:, 0:2] + dxy / 2], axis=-1
    )


def points_in_boxes(points, boxes):
    """Point-in-rotated-box test.

    Args:
        points: (N, 3).
        boxes: (M, 7).
    Returns:
        (M, N) bool mask (box-major, matching reference
        ``roiaware_pool3d.points_in_boxes_cpu`` layout).
    """
    xp = _xp(points, boxes)
    local = points[None, :, :3] - boxes[:, None, 0:3]  # (M, N, 3)
    local = rotate_points_z(local, -boxes[:, 6])
    half = boxes[:, None, 3:6] / 2.0
    return xp.all(xp.abs(local) <= half, axis=-1)


def enlarge_boxes(boxes, extra_width):
    """Grow each box's dx/dy/dz by ``extra_width`` (full-size units, per-axis).

    Reference: ``pcdet/utils/box_utils.py`` ``enlarge_box3d`` semantics —
    extra_width is added to each side's half, i.e. sizes grow by
    ``2 * extra_width``? No: reference adds ``extra_width`` to the full size
    on each axis once per side (dx += 2*w). Here we follow the reference:
    ``large_boxes3d[:, 3:6] += extra_width * 2``.
    """
    xp = _xp(boxes)
    ew = xp.asarray(extra_width, dtype=boxes.dtype)
    sizes = boxes[:, 3:6] + ew * 2.0
    return xp.concatenate([boxes[:, 0:3], sizes, boxes[:, 6:]], axis=-1)


def flip_boxes(boxes, axis="x"):
    """Mirror boxes across a vertical plane.

    axis='x': mirror across the x-z plane (y → −y, heading → −heading) —
    the reference's BEV-horizontal flip.
    axis='y': mirror across the y-z plane (x → −x, heading → π − heading).
    """
    xp = _xp(boxes)
    x, y, z = boxes[:, 0:1], boxes[:, 1:2], boxes[:, 2:3]
    dims = boxes[:, 3:6]
    yaw = boxes[:, 6:7]
    rest = boxes[:, 7:]
    if axis == "x":
        y, yaw = -y, -yaw
    elif axis == "y":
        x, yaw = -x, np.pi - yaw
    else:
        raise ValueError(axis)
    return xp.concatenate([x, y, z, dims, yaw, rest], axis=-1)


def flip_points(points, axis="x"):
    xp = _xp(points)
    if axis == "x":
        sign = xp.asarray([1.0, -1.0, 1.0], dtype=points.dtype)
    elif axis == "y":
        sign = xp.asarray([-1.0, 1.0, 1.0], dtype=points.dtype)
    else:
        raise ValueError(axis)
    xyz = points[..., :3] * sign
    return xp.concatenate([xyz, points[..., 3:]], axis=-1)


# ---------------------------------------------------------------------------
# KITTI camera-frame conversions (I/O boundary only).
# Reference semantics: pcdet/utils/box_utils.py boxes3d_kitti_camera_to_lidar
# and boxes3d_lidar_to_kitti_camera.
# ---------------------------------------------------------------------------

def boxes_camera_to_lidar(boxes_cam, r0_inv_v2c_inv):
    """KITTI camera boxes → internal LiDAR boxes.

    Args:
        boxes_cam: (N, 7) (x, y, z, l, h, w, ry) in rect camera coords,
            (x, y, z) at the box **bottom** center.
        r0_inv_v2c_inv: (4, 4) matrix mapping rect-camera homogeneous points
            to LiDAR frame, i.e. ``inv(Tr_velo_to_cam) @ inv(R0)`` padded.
    Returns:
        (N, 7) internal boxes (gravity center, dx=l, dy=w, dz=h,
        heading = -(ry + pi/2)).
    """
    xp = _xp(boxes_cam, r0_inv_v2c_inv)
    xyz_cam, l, h, w, ry = (
        boxes_cam[:, 0:3], boxes_cam[:, 3:4], boxes_cam[:, 4:5],
        boxes_cam[:, 5:6], boxes_cam[:, 6:7],
    )
    ones = xp.ones_like(xyz_cam[:, :1])
    xyz_lidar = (xp.concatenate([xyz_cam, ones], axis=-1)
                 @ r0_inv_v2c_inv.T)[:, :3]
    z = xyz_lidar[:, 2:3] + h / 2.0  # bottom → gravity center
    heading = -(ry + np.pi / 2.0)
    return xp.concatenate(
        [xyz_lidar[:, 0:2], z, l, w, h, heading], axis=-1
    )


def boxes_lidar_to_camera(boxes_lidar, r0_v2c):
    """Internal LiDAR boxes → KITTI camera boxes (inverse of above).

    Args:
        boxes_lidar: (N, 7) internal convention.
        r0_v2c: (4, 4) ``R0 @ Tr_velo_to_cam`` padded to 4x4.
    Returns:
        (N, 7) (x, y, z bottom-center in rect cam, l, h, w, ry).
    """
    xp = _xp(boxes_lidar, r0_v2c)
    xyz = boxes_lidar[:, 0:3]
    l, w, h = boxes_lidar[:, 3:4], boxes_lidar[:, 4:5], boxes_lidar[:, 5:6]
    heading = boxes_lidar[:, 6:7]
    xyz = xp.concatenate([xyz[:, 0:2], xyz[:, 2:3] - h / 2.0], axis=-1)
    ones = xp.ones_like(xyz[:, :1])
    xyz_cam = (xp.concatenate([xyz, ones], axis=-1) @ r0_v2c.T)[:, :3]
    ry = -heading - np.pi / 2.0
    return xp.concatenate([xyz_cam, l, h, w, ry], axis=-1)


def project_to_image(pts_3d, proj_mat):
    """Project LiDAR-frame points to image pixels.

    Args:
        pts_3d: (..., 3) points.
        proj_mat: (4, 4) full projection ``P2 @ R0 @ Tr_velo_to_cam``
            (the reference's ``lidar2img``, ``kitti_dataset.py:130-133``).
    Returns:
        (pts_2d (..., 2), depth (...,)) — pixel coords and camera depth.
    """
    xp = _xp(pts_3d, proj_mat)
    ones = xp.ones_like(pts_3d[..., :1])
    hom = xp.concatenate([pts_3d, ones], axis=-1) @ proj_mat.T
    depth = hom[..., 2]
    eps = 1e-6
    denom = xp.where(xp.abs(depth) < eps, eps, depth)
    return hom[..., 0:2] / denom[..., None], depth


def boxes_3d_to_2d(boxes, proj_mat, img_shape=None, min_depth=0.5,
                   min_corners=3):
    """Project 3D boxes to 2D xyxy with a validity mask.

    Mirrors reference ``ssl_modules/bbox_utils.py:372-441``
    (``bbox_3d_to_bbox_2d``): a box is valid if its center depth
    >= ``min_depth`` and at least ``min_corners`` of its 8 projected corners
    fall inside the image. The 2D box is the bounding rect of the projected
    corners, clipped to the image.

    Args:
        boxes: (N, 7).
        proj_mat: (4, 4) lidar→image.
        img_shape: (h, w) or None (no clipping / inside test skipped).
    Returns:
        (bboxes_2d (N, 4) xyxy, valid (N,) bool)
    """
    xp = _xp(boxes, proj_mat)
    corners = boxes_to_corners_3d(boxes)  # (N, 8, 3)
    pts2d, depth = project_to_image(corners, proj_mat)  # (N, 8, 2), (N, 8)
    _, cdepth = project_to_image(boxes[:, 0:3], proj_mat)
    x1y1 = xp.min(pts2d, axis=1)
    x2y2 = xp.max(pts2d, axis=1)
    bboxes = xp.concatenate([x1y1, x2y2], axis=-1)
    valid = cdepth >= min_depth
    if img_shape is not None:
        h, w = img_shape[0], img_shape[1]
        inside = (
            (pts2d[..., 0] >= 0) & (pts2d[..., 0] < w)
            & (pts2d[..., 1] >= 0) & (pts2d[..., 1] < h)
            & (depth > 0)
        )
        valid = valid & (xp.sum(inside.astype(bboxes.dtype), axis=1)
                         >= min_corners)
        lo = xp.zeros((4,), dtype=bboxes.dtype)
        hi = xp.asarray([w, h, w, h], dtype=bboxes.dtype)
        bboxes = xp.clip(bboxes, lo, hi)
    return bboxes, valid


def mask_boxes_outside_range(boxes, limit_range, min_num_corners=1):
    """Keep boxes with >= min_num_corners corners inside ``limit_range``.

    Reference: ``pcdet/utils/box_utils.py:56-72``.
    """
    xp = _xp(boxes)
    corners = boxes_to_corners_3d(boxes[:, :7])
    lo = xp.asarray(limit_range[0:3], dtype=boxes.dtype)
    hi = xp.asarray(limit_range[3:6], dtype=boxes.dtype)
    ok = xp.all((corners >= lo) & (corners <= hi), axis=2)
    return xp.sum(ok.astype(np.int32), axis=1) >= min_num_corners


def mask_points_by_range(points, limit_range):
    """BEV x/y range mask (reference ``common_utils.py:60-63``)."""
    return (
        (points[:, 0] >= limit_range[0]) & (points[:, 0] <= limit_range[3])
        & (points[:, 1] >= limit_range[1]) & (points[:, 1] <= limit_range[4])
    )


def in_range_bev(boxes, limit_range):
    """Box-center BEV range test (reference ObjectRangeFilter semantics:
    mmdet3d ``transforms_3d.py:727`` uses ``in_range_bev`` on centers)."""
    return (
        (boxes[:, 0] > limit_range[0]) & (boxes[:, 1] > limit_range[1])
        & (boxes[:, 0] < limit_range[3]) & (boxes[:, 1] < limit_range[4])
    )
