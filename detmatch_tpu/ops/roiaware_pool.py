"""RoI-aware voxel pooling (reference ``pcdet/ops/roiaware_pool3d``):
max/avg-pool point features into a fixed G³ voxel grid inside each rotated
3D box (used by Part-A2-style heads; points-in-box tests live in
``core.geometry.points_in_boxes``).

Static-shape formulation: per (box, point) compute the canonical-frame
voxel cell; pool by one-hot comparison against the G³ cell ids (segment
max/mean without scatters).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import geometry


@partial(jax.jit, static_argnames=("grid_size", "max_pts", "method"))
def roiaware_pool_capped(boxes, points, point_feats, points_valid,
                         grid_size=12, max_pts=128, method="max"):
    """RoI-aware pooling with a per-box point cap (reference
    ``RoIAwarePool3d(max_pts_each_voxel)``, ``roiaware_pool3d_utils.py``).

    Two-phase static-shape formulation for large N: (1) select the first
    ``max_pts`` in-box points per box by cumsum rank over the
    points-in-boxes mask (the CUDA kernel also keeps first-come points up
    to its cap); (2) pool the gathered (R, max_pts) set into the G^3 grid
    with segment max/sum — no (R, G^3, N) expansion.

    Args:
        boxes: (R, 7); points: (N, 3); point_feats: (N, C).
    Returns:
        (R, G, G, G, C) pooled features (0 where empty).
    """
    g = grid_size
    r = boxes.shape[0]
    n = points.shape[0]
    c = point_feats.shape[-1]
    local = points[None, :, :] - boxes[:, None, 0:3]  # (R, N, 3)
    local = geometry.rotate_points_z(local, -boxes[:, 6])
    half = boxes[:, None, 3:6] / 2.0
    inside = jnp.all(jnp.abs(local) <= half, axis=-1) & points_valid[None]

    # first-max_pts selection by cumsum rank (unique rank -> masked sum)
    rank = jnp.cumsum(inside.astype(jnp.int32), axis=1)
    cnt = jnp.minimum(rank[:, -1], max_pts)
    wr = jnp.where(inside & (rank <= max_pts), rank, 0)  # (R, N)
    arange_n = jnp.arange(n, dtype=jnp.int32)[None, :, None]
    eq = wr[:, :, None] == jnp.arange(1, max_pts + 1,
                                      dtype=jnp.int32)[None, None, :]
    idx = jnp.sum(jnp.where(eq, arange_n, 0), axis=1)  # (R, max_pts)
    slot_valid = jnp.arange(max_pts)[None, :] < cnt[:, None]

    sel_local = jnp.take_along_axis(local, idx[..., None], axis=1)
    sel_feats = point_feats[idx.reshape(-1)].reshape(r, max_pts, c)

    cell = jnp.floor((sel_local + half) / (half * 2.0 / g)).astype(jnp.int32)
    cell = jnp.clip(cell, 0, g - 1)
    cell_id = (cell[..., 0] * g + cell[..., 1]) * g + cell[..., 2]
    seg = jnp.where(slot_valid,
                    jnp.arange(r, dtype=jnp.int32)[:, None] * (g ** 3)
                    + cell_id, r * g ** 3)  # dropped bucket
    seg = seg.reshape(-1)
    flat_feats = sel_feats.reshape(-1, c)
    num_seg = r * g ** 3 + 1
    counts = jax.ops.segment_sum(
        jnp.ones((r * max_pts,), jnp.float32), seg, num_segments=num_seg)
    if method == "max":
        pooled = jax.ops.segment_max(flat_feats, seg, num_segments=num_seg)
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
    else:
        s = jax.ops.segment_sum(flat_feats, seg, num_segments=num_seg)
        pooled = s / jnp.maximum(counts[:, None], 1.0)
    pooled = jnp.where((counts > 0)[:, None], pooled, 0.0)
    return pooled[: r * g ** 3].reshape(r, g, g, g, c)


@partial(jax.jit, static_argnames=("grid_size", "method"))
def roiaware_pool(boxes, points, point_feats, points_valid, grid_size=6,
                  method="max"):
    """Pool point features into per-box voxel grids.

    Args:
        boxes: (R, 7) internal convention; points: (N, 3);
        point_feats: (N, C); points_valid: (N,).
    Returns:
        (R, G, G, G, C) pooled features (0 where empty).
    """
    g = grid_size
    r = boxes.shape[0]
    local = points[None, :, :] - boxes[:, None, 0:3]  # (R, N, 3)
    local = geometry.rotate_points_z(local, -boxes[:, 6])
    half = boxes[:, None, 3:6] / 2.0
    inside = jnp.all(jnp.abs(local) <= half, axis=-1) & points_valid[None]
    cell = jnp.floor((local + half) / (half * 2.0 / g)).astype(jnp.int32)
    cell = jnp.clip(cell, 0, g - 1)
    cell_id = (cell[..., 0] * g + cell[..., 1]) * g + cell[..., 2]
    cell_id = jnp.where(inside, cell_id, -1)  # (R, N)

    cells = jnp.arange(g ** 3, dtype=jnp.int32)
    # (R, G3, N) membership — pooled via max/mean over N
    member = cell_id[:, None, :] == cells[None, :, None]
    f = point_feats[None, :, :]  # (1, N, C)
    if method == "max":
        big = -1e10
        masked = jnp.where(member[:, :, :, None],
                           point_feats[None, None, :, :], big)
        pooled = jnp.max(masked, axis=2)
        count = jnp.sum(member, axis=2)
        pooled = jnp.where((count > 0)[..., None], pooled, 0.0)
    else:
        s = jnp.einsum("rgn,nc->rgc", member.astype(point_feats.dtype),
                       point_feats)
        count = jnp.sum(member, axis=2)
        pooled = s / jnp.maximum(count[..., None], 1.0)
        pooled = jnp.where((count > 0)[..., None], pooled, 0.0)
    return pooled.reshape(r, g, g, g, -1)