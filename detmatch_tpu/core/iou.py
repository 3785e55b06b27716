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


def quantize(ious, bits=20):
    """Snap IoU values to a 2^-bits grid (exact fp32 ops for |x| <= 1).

    Target assigners break ties with exact comparisons against a max
    (``ious == gt_max``) and ``argmax``. Mathematically tied entries can
    come out of two differently-compiled XLA programs (e.g. batch-sharded
    vs not, with different FMA/fusion choices) differing by a few ulps,
    which flips those discrete decisions — the root cause of the
    data-parallel vs single-device divergence this repo's multichip
    equality suite guards. Rounding to a coarse power-of-two grid
    collapses ulp-level noise so ties resolve identically in every
    program layout. 2^-20 ≈ 1e-6 is far below any assignment threshold
    spacing and far above compilation noise (~1e-7 relative).
    """
    scale = jnp.float32(2.0 ** bits)
    return jnp.round(ious * scale) * (1.0 / scale)


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
# stacked (K, M, N) planes so the TPU VPU lanes are fully utilized (the
# naive vmap-of-pairs layout puts 4-element corner dims in the lanes —
# ~3% utilization).
# ---------------------------------------------------------------------------

def rotated_overlap_block(c1, c2):
    """Pairwise intersection areas from corner sets.

    Args:
        c1: (M, 4, 2) CCW corners; c2: (N, 4, 2).
    Returns:
        (M, N) areas.

    All per-pair quantities live in stacked (K, M, N) planes and vertex
    ordering is ONE three-operand ``lax.sort`` over the candidate axis —
    a compact program (~50 ops vs ~2000 for an unrolled compare-swap
    network; the fused student-3d XLA program must stay under the TPU
    compile helper's memory cap, and this kernel is instantiated with a
    VJP several times per step).
    """
    m, n = c1.shape[0], c2.shape[0]
    dt = c1.dtype
    ax = c1[:, :, 0].T[:, :, None]  # (4, M, 1)
    ay = c1[:, :, 1].T[:, :, None]
    bx = c2[:, :, 0].T[:, None, :]  # (4, 1, N)
    by = c2[:, :, 1].T[:, None, :]
    ax2 = jnp.roll(ax, -1, axis=0)
    ay2 = jnp.roll(ay, -1, axis=0)
    bx2 = jnp.roll(bx, -1, axis=0)
    by2 = jnp.roll(by, -1, axis=0)

    # 16 edge-pair intersections on a (4, 4, M, N) grid (i = A edge,
    # j = B edge)
    px, py = ax[:, None], ay[:, None]              # (4, 1, M, 1)
    qx, qy = (ax2 - ax)[:, None], (ay2 - ay)[:, None]
    rx, ry = bx[None, :], by[None, :]              # (1, 4, 1, N)
    sx, sy = (bx2 - bx)[None, :], (by2 - by)[None, :]
    denom = qx * sy - qy * sx
    dx, dy = rx - px, ry - py
    t = dx * sy - dy * sx
    u = dx * qy - dy * qx
    safe = jnp.where(jnp.abs(denom) < EPS, 1.0, denom)
    t = t / safe
    u = u / safe
    iok = ((jnp.abs(denom) >= EPS) & (t >= 0.0) & (t <= 1.0)
           & (u >= 0.0) & (u <= 1.0))
    ix = px + t * qx
    iy = py + t * qy
    inter_x = jnp.broadcast_to(ix, (4, 4, m, n)).reshape(16, m, n)
    inter_y = jnp.broadcast_to(iy, (4, 4, m, n)).reshape(16, m, n)
    inter_ok = iok.reshape(16, m, n)

    # corners of A inside B: cross of B edge (j) with A corner (i) over a
    # (corner, edge, M, N) grid, all() over the edge axis — and vice versa
    crossA = ((bx2 - bx)[None, :] * (ay[:, None] - by[None, :])
              - (by2 - by)[None, :] * (ax[:, None] - bx[None, :]))
    a_in = jnp.all(crossA >= -1e-6, axis=1)        # (4, M, N)
    crossB = ((ax2 - ax)[None, :] * (by[:, None] - ay[None, :])
              - (ay2 - ay)[None, :] * (bx[:, None] - ax[None, :]))
    b_in = jnp.all(crossB >= -1e-6, axis=1)        # (4, M, N)

    cand_x = jnp.concatenate([
        inter_x,
        jnp.broadcast_to(ax[:, :, :], (4, m, 1)) * jnp.ones((1, 1, n), dt),
        jnp.broadcast_to(bx[:, :, :], (4, 1, n)) * jnp.ones((1, m, 1), dt),
    ], axis=0)  # (24, M, N)
    cand_y = jnp.concatenate([
        inter_y,
        jnp.broadcast_to(ay, (4, m, 1)) * jnp.ones((1, 1, n), dt),
        jnp.broadcast_to(by, (4, 1, n)) * jnp.ones((1, m, 1), dt),
    ], axis=0)
    cand_ok = jnp.concatenate([inter_ok, a_in, b_in], axis=0)

    okf = cand_ok.astype(dt)
    cnt = jnp.sum(okf, axis=0)
    norm = jnp.maximum(cnt, 1.0)
    cx0 = jnp.sum(cand_x * okf, axis=0) / norm
    cy0 = jnp.sum(cand_y * okf, axis=0) / norm

    big = 1e9
    ang = jnp.where(cand_ok, jnp.arctan2(cand_y - cy0, cand_x - cx0), big)
    ang_s, xs, ys = jax.lax.sort((ang, cand_x, cand_y), dimension=0,
                                 num_keys=1)

    # invalid slots -> first (valid) vertex, making the shoelace wrap exact
    vmask = ang_s < big / 2
    p0x = jnp.where(vmask[0], xs[0], 0.0)
    p0y = jnp.where(vmask[0], ys[0], 0.0)
    fx = jnp.where(vmask, xs, p0x[None])
    fy = jnp.where(vmask, ys, p0y[None])
    fx2 = jnp.roll(fx, -1, axis=0)
    fy2 = jnp.roll(fy, -1, axis=0)
    area = 0.5 * jnp.abs(jnp.sum(fx * fy2 - fx2 * fy, axis=0))
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
