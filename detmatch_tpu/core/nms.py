"""Greedy NMS variants with static shapes (jit/vmap-friendly).

Exact greedy NMS in two phases:
1. the pairwise IoU matrix is computed up front in row chunks
   (``lax.map``), so the quadratic geometry work runs as wide vectorized
   VPU ops with bounded memory;
2. a fixed-point mask iteration (``while`` over whole-array keep-mask
   updates, converging when the keep set stops changing) reproduces the
   sequential greedy semantics of the reference's CUDA NMS
   (``pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu``, mmcv ``nms``) with a
   trivial loop body — important on TPU where complex loop bodies compile
   slowly and serialize. Worst case: a deep suppression chain (a
   staircase of boxes each overlapping only the next) needs up to n
   iterations of an O(N²) reduce; typical scenes converge in a handful
   (the ``it < n`` cap still yields the exact greedy vector).

All functions return fixed-size index buffers plus validity masks; invalid
slots point at index 0 with ``valid=False``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import geometry, iou

NEG_INF = -1e10


def _chunked_pairwise(fn, n, chunk):
    """Build (N, N) matrix by mapping ``fn`` over row chunks."""
    pad = (-n) % chunk
    starts = jnp.arange(0, n + pad, chunk)

    def one(start):
        return fn(start)  # (chunk, N)

    rows = jax.lax.map(one, starts)  # (n_chunks, chunk, N)
    return rows.reshape(-1, n)[:n]


def iou_matrix_bev(bev, chunk=None):
    """(N, 5) rotated BEV boxes → (N, N) IoU matrix, chunked rows.

    Uses the plane-major (structure-of-arrays) overlap kernel
    (``iou.rotated_overlap_block``); the row chunk bounds the ~96
    transient (chunk, N) planes of the vertex-sort network.
    """
    n = bev.shape[0]
    if chunk is None:
        chunk = max(8, min(256, (1 << 19) // max(n, 1)))
    corners = geometry.boxes_to_corners_bev(bev)  # (N, 4, 2)
    areas = bev[:, 2] * bev[:, 3]

    pad = (-n) % chunk
    corners_p = jnp.concatenate(
        [corners, jnp.zeros((pad, 4, 2), corners.dtype)], axis=0)
    areas_p = jnp.concatenate([areas, jnp.zeros((pad,), areas.dtype)])

    def rows(start):
        c1 = jax.lax.dynamic_slice_in_dim(corners_p, start, chunk, 0)
        a1 = jax.lax.dynamic_slice_in_dim(areas_p, start, chunk, 0)
        inter = iou.rotated_overlap_block(c1, corners)  # (chunk, N)
        return inter / jnp.maximum(a1[:, None] + areas[None, :] - inter,
                                   1e-6)

    return _chunked_pairwise(rows, n, chunk)


def iou_matrix_2d(boxes, chunk=1024):
    """(N, 4) xyxy → (N, N) IoU matrix (cheap; single shot)."""
    return iou.iou2d(boxes, boxes)


def _greedy_from_matrix(iou_mat, scores, iou_thr, max_out):
    """Greedy selection given a precomputed IoU matrix.

    Exact greedy-NMS semantics (reference ``nms_gpu`` / mmcv ``nms``)
    computed by fixed-point iteration instead of ``max_out`` sequential
    argmax steps: in descending-score order, ``keep[j]`` holds iff no
    kept ``i < j`` overlaps ``j`` above the threshold — the unique fixed
    point of ``keep = valid & ~any(S_upper & keep[:, None], axis=0)``.
    Iterating from all-valid converges in (suppression-chain depth)
    steps — single digits on real boxes vs 128 serial loop trips, and
    each step is one vectorized (N, N) mask reduce.
    """
    n = scores.shape[0]
    order = jnp.argsort(-scores)  # stable: ties keep lowest index first
    # inverse permutation: rank[i] = position of box i in score order —
    # "i suppresses j" needs rank[i] < rank[j]; comparing ranks in the
    # ORIGINAL index space avoids two (N, N) row gathers (a measured TPU
    # weak spot, see ops/spconv.py fencing notes)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    valid = scores > NEG_INF / 2
    sup = (iou_mat > iou_thr) & (rank[:, None] < rank[None, :])

    def cond(state):
        keep, prev, it = state
        return (it < n) & jnp.any(keep != prev)

    def body(state):
        keep, _, it = state
        new = valid & ~jnp.any(sup & keep[:, None], axis=0)
        return new, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros_like(valid), jnp.int32(0)))

    # first max_out kept boxes, in descending-score (selection) order
    keep_sorted = keep[order]
    pos = jnp.cumsum(keep_sorted) - 1
    slot = jnp.where(keep_sorted & (pos < max_out), pos, max_out)
    out_idx = jnp.zeros((max_out,), jnp.int32).at[slot].set(
        order.astype(jnp.int32), mode="drop")
    out_valid = jnp.arange(max_out) < jnp.sum(keep)
    return out_idx, out_valid


@partial(jax.jit, static_argnames=("max_out",))
def nms_bev(boxes, scores, iou_thr, max_out):
    """Rotated BEV NMS on internal 7-dof boxes.

    Matches reference ``nms_gpu`` (class-agnostic rotated-BEV NMS used by
    ``model_nms_utils.class_agnostic_nms``).

    Args:
        boxes: (N, 7) (or (N, 5) BEV); scores: (N,) with NEG_INF padding.
    Returns:
        (idx (max_out,), valid (max_out,))
    """
    bev = geometry.boxes_to_bev(boxes) if boxes.shape[-1] >= 7 else boxes
    mat = iou_matrix_bev(bev)
    return _greedy_from_matrix(mat, scores, iou_thr, max_out)


@partial(jax.jit, static_argnames=("max_out",))
def nms_2d(boxes, scores, iou_thr, max_out):
    """Axis-aligned 2D NMS (mmcv ``nms`` semantics).

    Args:
        boxes: (N, 4) xyxy; scores: (N,) with NEG_INF padding.
    """
    mat = iou.iou2d(boxes, boxes)
    return _greedy_from_matrix(mat, scores, iou_thr, max_out)


@partial(jax.jit, static_argnames=("max_out",))
def batched_nms_2d(boxes, scores, labels, iou_thr, max_out):
    """Class-aware 2D NMS via the coordinate-offset trick
    (mmcv ``batched_nms`` semantics: boxes of different classes never
    suppress each other)."""
    max_coord = jnp.max(jnp.abs(boxes)) + 1.0
    offsets = labels.astype(boxes.dtype)[:, None] * (4.0 * max_coord)
    return nms_2d(boxes + offsets, scores, iou_thr, max_out)


@partial(jax.jit, static_argnames=("max_out",))
def batched_nms_bev(boxes, scores, labels, iou_thr, max_out):
    """Class-aware rotated BEV NMS via BEV-center offsets.

    Reproduces per-class NMS semantics (reference
    ``box3d_multiclass_nms``, ``core/post_processing/box3d_nms.py:8``) in one
    fused pass: shifting each class to a disjoint BEV region guarantees zero
    cross-class overlap.
    """
    bev = geometry.boxes_to_bev(boxes)
    span = jnp.max(jnp.abs(bev[:, 0:2])) + jnp.max(bev[:, 2:4]) + 1.0
    off = labels.astype(bev.dtype)[:, None] * (4.0 * span)
    bev = bev.at[:, 0:2].add(jnp.concatenate([off, off * 0], axis=-1))
    return nms_bev(bev, scores, iou_thr, max_out)
