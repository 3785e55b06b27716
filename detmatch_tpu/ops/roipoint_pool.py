"""RoI point pooling (reference ``pcdet/ops/roipoint_pool3d``): gather the
first ``num_sampled`` points (+features) inside each (optionally enlarged)
box; boxes with fewer points repeat their first in-box point; empty boxes
are flagged.

Static-shape formulation: points-in-box mask → cumsum-rank first-K
selection (unique rank extracted by masked sum) → flat gather.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import geometry


@partial(jax.jit, static_argnames=("num_sampled",))
def roipoint_pool(boxes, points, point_feats, points_valid,
                  num_sampled=512, extra_width=(0.0, 0.0, 0.0)):
    """
    Args:
        boxes: (R, 7); points: (N, 3); point_feats: (N, C);
        points_valid: (N,).
    Returns:
        pooled (R, num_sampled, 3 + C) — raw xyz + features (NOT
        canonicalized; the head applies the canonical transform);
        empty (R,) bool.
    """
    r = boxes.shape[0]
    n = points.shape[0]
    big = geometry.enlarge_boxes(boxes, jnp.asarray(extra_width))
    inside = geometry.points_in_boxes(points, big) & points_valid[None]

    rank = jnp.cumsum(inside.astype(jnp.int32), axis=1)
    cnt = jnp.minimum(rank[:, -1], num_sampled)
    wr = jnp.where(inside & (rank <= num_sampled), rank, 0)
    arange_n = jnp.arange(n, dtype=jnp.int32)[None, :, None]
    eq = wr[:, :, None] == jnp.arange(1, num_sampled + 1,
                                      dtype=jnp.int32)[None, None, :]
    idx = jnp.sum(jnp.where(eq, arange_n, 0), axis=1)  # (R, K)
    slot_valid = jnp.arange(num_sampled)[None, :] < jnp.maximum(cnt, 1)[:, None]
    idx = jnp.where(slot_valid, idx, idx[:, :1])  # repeat first point

    data = jnp.concatenate([points, point_feats], axis=-1)
    pooled = data[idx.reshape(-1)].reshape(r, num_sampled, -1)
    empty = cnt == 0
    pooled = jnp.where(empty[:, None, None], 0.0, pooled)
    return pooled, empty
