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