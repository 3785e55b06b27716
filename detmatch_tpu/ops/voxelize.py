"""Point-cloud voxelization as a sort + segment reduction (pure XLA).

Replaces the reference's ``hard_voxelize`` CUDA kernel
(``pcdet/ops/voxel/src/voxelization_cuda.cu``; Python wrapper
``mmdet3d/ops/voxel/voxelize.py:10-120``) with a TPU-native formulation:
points are keyed by linearized voxel coordinate, sorted, and segment-reduced.
Static shapes throughout — the output is a fixed-capacity voxel buffer with
a validity count, which is exactly what the downstream sparse conv needs.

Semantics match the reference where it matters:
* out-of-range points are dropped;
* at most ``max_points`` points contribute to a voxel's features (the rest
  of the voxel's points are ignored, as in hard_voxelize);
* at most ``max_voxels`` voxels are kept (ordering differs from the CUDA
  first-come order — we keep the lexicographically smallest keys — which is
  irrelevant downstream since voxel sets are permutation-invariant).

Combined with the mean reduction this also fuses the reference's MeanVFE
(``pcdet/models/backbones_3d/vfe/mean_vfe.py``) into the voxelizer: one pass
produces mean features directly.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

INVALID_KEY = np.iinfo(np.int32).max


class VoxelizerSpec(NamedTuple):
    """Static voxelization config (hashable, closed over by jit)."""
    point_cloud_range: tuple  # (x0, y0, z0, x1, y1, z1)
    voxel_size: tuple         # (vx, vy, vz)
    max_voxels: int
    max_points: int

    @property
    def grid_size(self):
        """(X, Y, Z) integer grid dims (reference rounds: pcdet
        PointFeatureEncoder / DataProcessor grid computation)."""
        pcr = np.asarray(self.point_cloud_range, np.float64)
        vs = np.asarray(self.voxel_size, np.float64)
        return tuple(np.round((pcr[3:] - pcr[:3]) / vs).astype(np.int64))

    @property
    def spatial_shape(self):
        """(Z+1, Y, X) — the sparse shape used by the backbone (the +1 on z
        mirrors the reference: ``spconv_backbone.py:78``
        ``sparse_shape = grid_size[::-1] + [1, 0, 0]``)."""
        gx, gy, gz = self.grid_size
        return (int(gz) + 1, int(gy), int(gx))


def linearize(coords_zyx, spatial_shape):
    """(..., 3) int zyx coords → (...,) int32 keys, **y-major** mixed radix
    (y, x, z).

    Key order is a free internal choice (all consumers go through
    linearize/delinearize); y-major makes sorted keys spatially local in
    y, so a run of consecutive sorted voxels spans only a few y-rows.
    The windowed sparse-conv kernel exploits this: a 3x3x3 neighborhood
    of a sorted tile lives in a key window of ~(tile span + 2 rows),
    bounding its compare volume by O(window) instead of O(N).
    """
    Z, Y, X = spatial_shape
    return ((coords_zyx[..., 1] * X + coords_zyx[..., 2]) * Z
            + coords_zyx[..., 0]).astype(jnp.int32)


def delinearize(keys, spatial_shape):
    """(...,) keys → (..., 3) int32 zyx (inverse of y-major linearize)."""
    Z, Y, X = spatial_shape
    z = keys % Z
    q = keys // Z
    x = q % X
    y = q // X
    return jnp.stack([z, y, x], axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("spec",))
def voxelize_mean(points, points_valid, spec: VoxelizerSpec):
    """Voxelize one sample and mean-reduce point features per voxel.

    Args:
        points: (P, 3 + C) — xyz + features (C can be 1 for intensity).
        points_valid: (P,) bool — padding mask.
        spec: static VoxelizerSpec.
    Returns:
        dict with:
            features: (max_voxels, 3 + C) — per-voxel mean of the first
                ``max_points`` points (reference MeanVFE semantics).
            coords: (max_voxels, 3) int32 zyx (0 for invalid slots).
            keys: (max_voxels,) int32 sorted asc; INVALID_KEY for padding.
            num_voxels: () int32.
    """
    P = points.shape[0]
    pcr = jnp.asarray(spec.point_cloud_range, points.dtype)
    vs = jnp.asarray(spec.voxel_size, points.dtype)
    gx, gy, gz = spec.grid_size
    grid = jnp.asarray([gx, gy, gz], jnp.int32)

    cxyz = jnp.floor((points[:, :3] - pcr[:3]) / vs).astype(jnp.int32)
    in_range = jnp.all((cxyz >= 0) & (cxyz < grid), axis=-1) & points_valid
    coords_zyx = cxyz[:, ::-1]
    keys = linearize(coords_zyx, spec.spatial_shape)
    keys = jnp.where(in_range, keys, INVALID_KEY)

    # sort points by key; stable so same-voxel points keep arrival order
    order = jnp.argsort(keys, stable=True)
    skeys = keys[order]
    sfeat = points[order]

    first = jnp.concatenate(
        [jnp.ones((1,), bool), skeys[1:] != skeys[:-1]]
    ) & (skeys != INVALID_KEY)
    voxel_id = jnp.cumsum(first.astype(jnp.int32)) - 1  # (P,)
    total_voxels = jnp.sum(first.astype(jnp.int32))
    num_voxels = jnp.minimum(total_voxels, spec.max_voxels)

    # rank of each point within its voxel (for the max_points cap)
    pos = jnp.arange(P, dtype=jnp.int32)
    seg_start = jnp.zeros((spec.max_voxels,), jnp.int32)
    vid_clip = jnp.where(
        (voxel_id >= 0) & (voxel_id < spec.max_voxels) & first,
        voxel_id, spec.max_voxels,
    )
    seg_start = seg_start.at[vid_clip].set(pos, mode="drop")
    rank = pos - seg_start[jnp.clip(voxel_id, 0, spec.max_voxels - 1)]
    contrib = (
        (skeys != INVALID_KEY)
        & (rank < spec.max_points)
        & (voxel_id < spec.max_voxels)
        & (voxel_id >= 0)
    )

    scatter_id = jnp.where(contrib, voxel_id, spec.max_voxels)
    feat_sum = jnp.zeros((spec.max_voxels, points.shape[1]), points.dtype)
    feat_sum = feat_sum.at[scatter_id].add(
        jnp.where(contrib[:, None], sfeat, 0.0), mode="drop"
    )
    cnt = jnp.zeros((spec.max_voxels,), points.dtype)
    cnt = cnt.at[scatter_id].add(
        contrib.astype(points.dtype), mode="drop"
    )
    features = feat_sum / jnp.maximum(cnt[:, None], 1.0)

    # per-voxel key: scatter first-point keys
    vkeys = jnp.full((spec.max_voxels,), INVALID_KEY, jnp.int32)
    vkeys = vkeys.at[vid_clip].set(skeys, mode="drop")
    coords = delinearize(jnp.where(vkeys == INVALID_KEY, 0, vkeys),
                         spec.spatial_shape)
    coords = jnp.where((vkeys != INVALID_KEY)[:, None], coords, 0)
    return dict(features=features, coords=coords, keys=vkeys,
                num_voxels=num_voxels,
                # occupied voxels beyond max_voxels are silently cut by
                # the fixed-capacity buffer — surface the count so
                # training can LOG the truncation rate (SURVEY "no
                # silent caps"; reference train cap 16000:
                # configs/detmatch/001/detmatch/split_0.py:108-112)
                num_dropped_voxels=total_voxels - num_voxels,
                # grouped per-point view (for pillar/point VFEs):
                point_feats=sfeat, point_voxel_id=voxel_id,
                point_contrib=contrib, voxel_counts=cnt)
