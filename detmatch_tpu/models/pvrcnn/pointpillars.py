"""PointPillars detector (reference ``pcdet/models/detectors/pointpillar.py``
+ ``backbones_3d/vfe/pillar_vfe.py`` + ``map_to_bev/pointpillar_scatter.py``):
PillarVFE (augmented point features → shared MLP → per-pillar max) →
dense BEV scatter → BEV conv pyramid → AnchorHeadSingle.

TPU design: the pillar grouping reuses the voxelizer's sorted per-point
view; per-pillar max pooling is a one-hot-free segment scatter-max on flat
ids; the BEV scatter is the shared ``to_dense``.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...core import nms as nms_mod
from ...ops import spconv, voxelize
from ..layers import MaskedBatchNorm
from .anchor_head import AnchorHeadSingle
from .bev import BaseBEVBackbone
from .pvrcnn import DEFAULT_ANCHOR_CONFIGS


class PillarVFE(nn.Module):
    """Augmented per-point features → Linear+BN+ReLU → per-pillar max.

    Features (pcdet PillarVFE, use_absolute_xyz): [x, y, z, i,
    Δcluster(3), Δcenter(2)] = 10 with z-center included → here 10-dim.
    """
    out_features: int = 64
    voxel_size: Tuple[float, float, float] = (0.16, 0.16, 4.0)
    point_cloud_range: Tuple[float, ...] = (0, -39.68, -3, 69.12, 39.68, 1)
    use_running_average: bool = False

    @nn.compact
    def __call__(self, vox, max_voxels, train=False):
        """vox: output dict of ``voxelize_mean`` (per-sample, vmapped in).

        Returns (pillar_feats (max_voxels, out_features)).
        """
        pts = vox["point_feats"]          # (P, 4) sorted by pillar
        vid = vox["point_voxel_id"]       # (P,)
        contrib = vox["point_contrib"]    # (P,) bool
        means = vox["features"]           # (max_voxels, 4)
        coords = vox["coords"]            # (max_voxels, 3) zyx

        vid_c = jnp.clip(vid, 0, max_voxels - 1)
        cluster = pts[:, :3] - means[vid_c][:, :3]
        vs = jnp.asarray(self.voxel_size, pts.dtype)
        origin = jnp.asarray(self.point_cloud_range[:3], pts.dtype)
        centers = (coords[:, ::-1].astype(pts.dtype) + 0.5) * vs + origin
        center_off = pts[:, :2] - centers[vid_c][:, :2]
        f = jnp.concatenate([pts, cluster, center_off], axis=-1)  # (P, 9)
        dist = jnp.linalg.norm(pts[:, :3], axis=-1, keepdims=True)
        f = jnp.concatenate([f, dist], axis=-1)  # (P, 10)
        f = jnp.where(contrib[:, None], f, 0.0)

        x = nn.Dense(self.out_features, use_bias=False, name="pfn")(f)
        x = MaskedBatchNorm(
            name="pfn_bn", use_running_average=self.use_running_average,
        )(x, mask=contrib, use_running_average=not train)
        x = nn.relu(x)
        # per-pillar max via scatter-max on flat ids
        sid = jnp.where(contrib, vid_c, max_voxels)
        pooled = jnp.full((max_voxels + 1, self.out_features), -1e10,
                          x.dtype).at[sid].max(x, mode="drop")
        pooled = pooled[:max_voxels]
        has = vox["keys"] != voxelize.INVALID_KEY
        return jnp.where(has[:, None], pooled, 0.0)


class PointPillars(nn.Module):
    """One-stage pillar detector on the shared BEV/anchor stack."""
    num_classes: int = 3
    point_cloud_range: Tuple[float, ...] = (0, -39.68, -3, 69.12, 39.68, 1)
    voxel_size: Tuple[float, float, float] = (0.16, 0.16, 4.0)
    grid_size: Tuple[int, int, int] = (432, 496, 1)
    max_voxels: int = 12000
    anchor_configs: Tuple[Dict[str, Any], ...] = DEFAULT_ANCHOR_CONFIGS
    layer_nums: Tuple[int, ...] = (3, 5, 5)
    layer_strides: Tuple[int, ...] = (2, 2, 2)
    num_filters: Tuple[int, ...] = (64, 128, 256)
    upsample_strides: Tuple[int, ...] = (1, 2, 4)
    num_upsample_filters: Tuple[int, ...] = (128, 128, 128)

    def setup(self):
        self.vfe = PillarVFE(voxel_size=self.voxel_size,
                             point_cloud_range=self.point_cloud_range,
                             name="vfe")
        self.bev_backbone = BaseBEVBackbone(
            layer_nums=self.layer_nums, layer_strides=self.layer_strides,
            num_filters=self.num_filters,
            upsample_strides=self.upsample_strides,
            num_upsample_filters=self.num_upsample_filters,
            name="backbone2d")
        # anchors live on the stride-2 output of the pillar BEV pyramid
        cfgs = tuple(dict(c, feature_map_stride=2)
                     for c in self.anchor_configs)
        self.anchor_head = AnchorHeadSingle(
            num_classes=self.num_classes,
            point_cloud_range=self.point_cloud_range,
            grid_size=self.grid_size,
            anchor_configs=cfgs, name="dense_head")

    def __call__(self, batch, train: bool = False):
        """batch needs points/points_valid voxelized with the pillar spec
        (pass the full voxelize_mean dict per sample under 'pillars')."""
        vox = batch["pillars"]
        # process the batch jointly (BN over all pillars, like torch)
        b = vox["keys"].shape[0]
        flat = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]) if x.ndim > 1
            else x.reshape(-1), vox)
        # per-sample ids offset into a flat pillar table
        flat = dict(flat)
        flat["point_voxel_id"] = (
            vox["point_voxel_id"]
            + (jnp.arange(b) * self.max_voxels)[:, None]).reshape(-1)
        feats = self.vfe(flat, b * self.max_voxels, train=train)
        feats = feats.reshape(b, self.max_voxels, -1)

        st = spconv.SparseTensor(
            feats=feats, keys=vox["keys"],
            nvalid=jnp.sum(vox["keys"] != voxelize.INVALID_KEY, -1))
        Z = 1
        shape = (Z, self.grid_size[1], self.grid_size[0])
        dense = jax.vmap(spconv.to_dense, (0, None))(st, shape)
        bev_in = dense.reshape(b, shape[1], shape[2], -1)
        bev = self.bev_backbone(bev_in, train=train)
        head_preds = self.anchor_head(bev)
        boxes, cls = self.anchor_head.decode_boxes(head_preds)
        return dict(head_preds=head_preds, batch_box_preds=boxes,
                    batch_cls_preds=cls)

    def loss(self, out, batch):
        targets = self.anchor_head.targets(batch["gt_boxes"])
        losses = self.anchor_head.loss(out["head_preds"], targets)
        losses["loss"] = sum(losses.values())
        return losses
