"""IoU / overlap computations (jnp, vmap-friendly, static shapes).

Provides axis-aligned 2D IoU/GIoU and rotated BEV / 3D IoU. The rotated
overlap uses the classic convex-intersection formulation (candidate vertices
= edge-pair intersections + contained corners, sorted by angle, shoelace),
the same math as the reference's CUDA kernel
(``pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu``) and numba kernel
(``mmdet3d/core/evaluation/kitti_utils/rotate_iou.py``) — but expressed as
fixed-shape vectorized ops for the TPU VPU instead of per-thread scalar code.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import geometry

EPS = 1e-8


# ---------------------------------------------------------------------------
# Axis-aligned 2D
# ---------------------------------------------------------------------------

def area2d(boxes):
    """(..., 4) xyxy → (...) area (clamped at 0)."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0)
    return w * h


def iou2d(boxes1, boxes2, mode="iou", aligned=False, eps=1e-6):
    """Axis-aligned IoU / IoF / GIoU between xyxy boxes.

    Args:
        boxes1: (N, 4); boxes2: (M, 4)   (or (N, 4) each if aligned=True).
        mode: 'iou' | 'iof' | 'giou'.
    Returns:
        (N, M) (or (N,) if aligned).
    """
    if not aligned:
        b1 = boxes1[:, None, :]
        b2 = boxes2[None, :, :]
    else:
        b1, b2 = boxes1, boxes2
    lt = jnp.maximum(b1[..., :2], b2[..., :2])
    rb = jnp.minimum(b1[..., 2:], b2[..., 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = area2d(b1)
    a2 = area2d(b2)
    if mode == "iof":
        union = a1
    else:
        union = a1 + a2 - inter
    union = jnp.maximum(union, eps)
    iou = inter / union
    if mode != "giou":
        return iou
    # enclosing box
    elt = jnp.minimum(b1[..., :2], b2[..., :2])
    erb = jnp.maximum(b1[..., 2:], b2[..., 2:])
    ewh = jnp.maximum(erb - elt, 0)
    earea = jnp.maximum(ewh[..., 0] * ewh[..., 1], eps)
    return iou - (earea - union) / earea


# ---------------------------------------------------------------------------
# Rotated BEV overlap
# ---------------------------------------------------------------------------

def _cross2(o, a, b):
    """z of cross(a-o, b-o)."""
    return ((a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1])
            - (a[..., 1] - o[..., 1]) * (b[..., 0] - o[..., 0]))


def _segment_intersections(c1, c2):
    """All pairwise edge-edge intersections of two quads.

    Args:
        c1, c2: (4, 2) corner arrays (CCW).
    Returns:
        pts (16, 2), valid (16,) bool.
    """
    p = c1  # (4,2)
    q = jnp.roll(c1, -1, axis=0) - c1  # edge dirs of quad 1
    r = c2
    s = jnp.roll(c2, -1, axis=0) - c2
    # Broadcast pairs: i over quad1 edges, j over quad2 edges.
    p_ = p[:, None, :]  # (4,1,2)
    q_ = q[:, None, :]
    r_ = r[None, :, :]
    s_ = s[None, :, :]
    denom = q_[..., 0] * s_[..., 1] - q_[..., 1] * s_[..., 0]  # (4,4)
    diff = r_ - p_
    t = (diff[..., 0] * s_[..., 1] - diff[..., 1] * s_[..., 0])
    u = (diff[..., 0] * q_[..., 1] - diff[..., 1] * q_[..., 0])
    safe = jnp.where(jnp.abs(denom) < EPS, 1.0, denom)
    t = t / safe
    u = u / safe
    valid = (
        (jnp.abs(denom) >= EPS)
        & (t >= 0.0) & (t <= 1.0) & (u >= 0.0) & (u <= 1.0)
    )
    pts = p_ + t[..., None] * q_
    return pts.reshape(16, 2), valid.reshape(16)


def _points_in_quad(pts, corners):
    """pts (K, 2) inside convex CCW quad ``corners`` (4, 2) → (K,) bool."""
    a = corners[None, :, :]  # (1,4,2)
    b = jnp.roll(corners, -1, axis=0)[None, :, :]
    cross = _cross2(a, b, pts[:, None, :])  # (K, 4)
    return jnp.all(cross >= -1e-6, axis=-1)


def _convex_area_from_candidates(pts, valid):
    """Area of the convex hull of masked candidate points.

    All valid points are vertices of a convex polygon (intersection of two
    convex sets), so sorting by angle around the mean and running shoelace is
    exact.
    """
    n = jnp.sum(valid)
    denom = jnp.maximum(n.astype(pts.dtype), 1.0)
    center = jnp.sum(jnp.where(valid[:, None], pts, 0.0), axis=0) / denom
    rel = pts - center
    ang = jnp.arctan2(rel[:, 1], rel[:, 0])
    ang = jnp.where(valid, ang, 1e9)  # invalid sorted to the end
    order = jnp.argsort(ang)
    spts = pts[order]
    svalid = valid[order]
    idx = jnp.arange(pts.shape[0])
    nxt = jnp.where(idx + 1 >= n, 0, idx + 1)  # wrap at n
    nxt_pts = spts[nxt]
    contrib = spts[:, 0] * nxt_pts[:, 1] - nxt_pts[:, 0] * spts[:, 1]
    contrib = jnp.where(svalid, contrib, 0.0)
    area = 0.5 * jnp.abs(jnp.sum(contrib))
    return jnp.where(n >= 3, area, 0.0)


def _rotated_overlap_single(box1, box2):
    """Intersection area of two BEV boxes (cx, cy, dx, dy, angle)."""
    c1 = geometry.boxes_to_corners_bev(box1[None])[0]  # (4, 2)
    c2 = geometry.boxes_to_corners_bev(box2[None])[0]
    ipts, ivalid = _segment_intersections(c1, c2)
    in1 = _points_in_quad(c2, c1)
    in2 = _points_in_quad(c1, c2)
    pts = jnp.concatenate([ipts, c2, c1], axis=0)  # (24, 2)
    valid = jnp.concatenate([ivalid, in1, in2], axis=0)
    return _convex_area_from_candidates(pts, valid)


# ---------------------------------------------------------------------------
# Structure-of-arrays rotated overlap: all per-pair quantities live in
# (M, N) planes so the TPU VPU lanes are fully utilized (the naive
# vmap-of-pairs layout puts 4-element corner dims in the lanes — ~3%
# utilization). Ordering of the ≤8 intersection-polygon vertices uses a
# static bitonic compare-swap network over 32 candidate planes instead of a
# per-pair argsort.
# ---------------------------------------------------------------------------

_BITONIC_32 = []
for _k in (2, 4, 8, 16, 32):
    _j = _k // 2
    while _j >= 1:
        for _i in range(32):
            _l = _i ^ _j
            if _l > _i:
                _BITONIC_32.append((_i, _l, (_i & _k) == 0))
        _j //= 2


def rotated_overlap_block(c1, c2):
    """Pairwise intersection areas from corner sets.

    Args:
        c1: (M, 4, 2) CCW corners; c2: (N, 4, 2).
    Returns:
        (M, N) areas. All math on (M, N) planes.
    """
    m, n = c1.shape[0], c2.shape[0]
    ax = [c1[:, i, 0][:, None] for i in range(4)]  # (M,1) each
    ay = [c1[:, i, 1][:, None] for i in range(4)]
    bx = [c2[:, i, 0][None, :] for i in range(4)]  # (1,N)
    by = [c2[:, i, 1][None, :] for i in range(4)]

    cand_x, cand_y, cand_ok = [], [], []

    # 16 edge-pair intersections
    for i in range(4):
        i2 = (i + 1) % 4
        px, py = ax[i], ay[i]
        qx, qy = ax[i2] - ax[i], ay[i2] - ay[i]
        for j in range(4):
            j2 = (j + 1) % 4
            rx, ry = bx[j], by[j]
            sx, sy = bx[j2] - bx[j], by[j2] - by[j]
            denom = qx * sy - qy * sx  # (M, N)
            dx, dy = rx - px, ry - py
            t = dx * sy - dy * sx
            u = dx * qy - dy * qx
            safe = jnp.where(jnp.abs(denom) < EPS, 1.0, denom)
            t = t / safe
            u = u / safe
            ok = ((jnp.abs(denom) >= EPS) & (t >= 0.0) & (t <= 1.0)
                  & (u >= 0.0) & (u <= 1.0))
            cand_x.append(px + t * qx)
            cand_y.append(py + t * qy)
            cand_ok.append(ok)

    # corners of A inside B / corners of B inside A (half-plane products)
    def inside(px, py, ex, ey):
        """point planes (broadcast to (M,N)) inside CCW quad given edge
        corner plane lists."""
        ok = None
        for j in range(4):
            j2 = (j + 1) % 4
            cross = ((ex[j2] - ex[j]) * (py - ey[j])
                     - (ey[j2] - ey[j]) * (px - ex[j]))
            c_ok = cross >= -1e-6
            ok = c_ok if ok is None else (ok & c_ok)
        return ok

    for i in range(4):
        ok = inside(ax[i], ay[i], bx, by)
        cand_x.append(jnp.broadcast_to(ax[i], (m, n)))
        cand_y.append(jnp.broadcast_to(ay[i], (m, n)))
        cand_ok.append(ok)
    for j in range(4):
        ok = inside(bx[j], by[j], ax, ay)
        cand_x.append(jnp.broadcast_to(bx[j], (m, n)))
        cand_y.append(jnp.broadcast_to(by[j], (m, n)))
        cand_ok.append(ok)

    # broadcast everything to full planes
    cand_x = [jnp.broadcast_to(x, (m, n)) for x in cand_x]
    cand_y = [jnp.broadcast_to(y, (m, n)) for y in cand_y]
    cand_ok = [jnp.broadcast_to(o, (m, n)) for o in cand_ok]

    # centroid of valid candidates
    okf = [o.astype(cand_x[0].dtype) for o in cand_ok]
    cnt = sum(okf)
    denom = jnp.maximum(cnt, 1.0)
    cx0 = sum(x * o for x, o in zip(cand_x, okf)) / denom
    cy0 = sum(y * o for y, o in zip(cand_y, okf)) / denom

    big = 1e9
    ang = [jnp.where(o, jnp.arctan2(y - cy0, x - cx0), big)
           for x, y, o in zip(cand_x, cand_y, cand_ok)]
    # pad to 32 planes for the bitonic network
    pad_plane = jnp.full((m, n), big, cand_x[0].dtype)
    zero_plane = jnp.zeros((m, n), cand_x[0].dtype)
    ang += [pad_plane] * (32 - len(ang))
    xs = cand_x + [zero_plane] * (32 - len(cand_x))
    ys = cand_y + [zero_plane] * (32 - len(cand_y))

    for i, l, up in _BITONIC_32:
        ki, kl = ang[i], ang[l]
        swap = (ki > kl) if up else (ki < kl)
        ang[i] = jnp.where(swap, kl, ki)
        ang[l] = jnp.where(swap, ki, kl)
        xi, xl = xs[i], xs[l]
        xs[i] = jnp.where(swap, xl, xi)
        xs[l] = jnp.where(swap, xi, xl)
        yi, yl = ys[i], ys[l]
        ys[i] = jnp.where(swap, yl, yi)
        ys[l] = jnp.where(swap, yi, yl)

    # invalid slots → first (valid) vertex, making the shoelace wrap exact
    valid0 = ang[0] < big / 2
    p0x = jnp.where(valid0, xs[0], 0.0)
    p0y = jnp.where(valid0, ys[0], 0.0)
    fx = [jnp.where(a < big / 2, x, p0x) for a, x in zip(ang, xs)]
    fy = [jnp.where(a < big / 2, y, p0y) for a, y in zip(ang, ys)]
    area = zero_plane
    for k in range(32):
        k2 = (k + 1) % 32
        area = area + (fx[k] * fy[k2] - fx[k2] * fy[k])
    area = 0.5 * jnp.abs(area)
    return jnp.where(cnt >= 3, area, 0.0)


def rotated_overlap_bev(boxes1, boxes2):
    """Pairwise intersection areas of rotated BEV boxes.

    Args:
        boxes1: (N, 5) (cx, cy, dx, dy, angle); boxes2: (M, 5).
    Returns:
        (N, M) intersection areas.
    """
    from . import geometry
    c1 = geometry.boxes_to_corners_bev(boxes1)
    c2 = geometry.boxes_to_corners_bev(boxes2)
    return rotated_overlap_block(c1, c2)


def rotated_iou_bev(boxes1, boxes2, eps=1e-6):
    """Pairwise rotated BEV IoU. boxes: (N, 5) / (M, 5)."""
    inter = rotated_overlap_bev(boxes1, boxes2)
    a1 = (boxes1[:, 2] * boxes1[:, 3])[:, None]
    a2 = (boxes2[:, 2] * boxes2[:, 3])[None, :]
    return inter / jnp.maximum(a1 + a2 - inter, eps)


def iou3d(boxes1, boxes2, eps=1e-6):
    """Pairwise 3D IoU of internal-convention boxes.

    Matches reference ``boxes_iou3d_gpu`` semantics
    (``pcdet/ops/iou3d_nms/iou3d_nms_utils.py``): rotated BEV overlap × z
    overlap / volume union.

    Args:
        boxes1: (N, 7); boxes2: (M, 7).
    """
    inter_bev = rotated_overlap_bev(
        geometry.boxes_to_bev(boxes1), geometry.boxes_to_bev(boxes2)
    )
    zmax1 = boxes1[:, 2] + boxes1[:, 5] / 2
    zmin1 = boxes1[:, 2] - boxes1[:, 5] / 2
    zmax2 = boxes2[:, 2] + boxes2[:, 5] / 2
    zmin2 = boxes2[:, 2] - boxes2[:, 5] / 2
    z_overlap = jnp.maximum(
        jnp.minimum(zmax1[:, None], zmax2[None, :])
        - jnp.maximum(zmin1[:, None], zmin2[None, :]),
        0.0,
    )
    inter = inter_bev * z_overlap
    vol1 = jnp.prod(boxes1[:, 3:6], axis=-1)[:, None]
    vol2 = jnp.prod(boxes2[:, 3:6], axis=-1)[None, :]
    return inter / jnp.maximum(vol1 + vol2 - inter, eps)


def nearest_bev_iou(boxes1, boxes2):
    """Axis-aligned nearest-BEV IoU of 7-dof boxes.

    Matches mmdet3d ``BboxOverlapsNearest3D`` / pcdet
    ``boxes3d_nearest_bev_iou`` semantics (heading snapped to nearest axis,
    then axis-aligned IoU). Used by the 3D target assigners.
    """
    b1 = geometry.boxes_to_aligned_bev(boxes1)
    b2 = geometry.boxes_to_aligned_bev(boxes2)
    return iou2d(b1, b2)
