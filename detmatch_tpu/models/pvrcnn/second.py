"""SECOND detector (reference ``pcdet/models/detectors/second_net.py``):
MeanVFE → VoxelBackbone8x → HeightCompression → BaseBEVBackbone →
AnchorHeadSingle. A strict subset of the PV-RCNN stack — the one-stage
dense 3D detector the reference ships alongside PV-RCNN.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...core import nms as nms_mod
from ..layers import MaskedBatchNorm
from .anchor_head import AnchorHeadSingle
from .backbone3d import VoxelBackbone8x
from .bev import BaseBEVBackbone, height_compression
from .pvrcnn import DEFAULT_ANCHOR_CONFIGS


class SECOND(nn.Module):
    num_classes: int = 3
    point_cloud_range: Tuple[float, ...] = (0, -40, -3, 70.4, 40, 1)
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.1)
    grid_size: Tuple[int, int, int] = (1408, 1600, 40)
    anchor_configs: Tuple[Dict[str, Any], ...] = DEFAULT_ANCHOR_CONFIGS
    backbone_caps: Tuple[int, int, int, int] = (24000, 16000, 10000, 10000)

    def setup(self):
        Z = self.grid_size[2] + 1
        self.backbone3d = VoxelBackbone8x(
            spatial_shape=(Z, self.grid_size[1], self.grid_size[0]),
            caps=self.backbone_caps, name="backbone3d")
        self.bev_backbone = BaseBEVBackbone(name="backbone2d")
        self.anchor_head = AnchorHeadSingle(
            num_classes=self.num_classes,
            point_cloud_range=self.point_cloud_range,
            grid_size=self.grid_size,
            anchor_configs=self.anchor_configs, name="dense_head")

    def __call__(self, batch, train: bool = False):
        ms = self.backbone3d(batch["voxel_features"], batch["voxel_keys"],
                             train=train)
        bev = self.bev_backbone(height_compression(ms["out"]), train=train)
        head_preds = self.anchor_head(bev)
        boxes, cls = self.anchor_head.decode_boxes(head_preds)
        return dict(head_preds=head_preds, batch_box_preds=boxes,
                    batch_cls_preds=cls)

    def loss(self, out, batch):
        targets = self.anchor_head.targets(batch["gt_boxes"])
        losses = self.anchor_head.loss(out["head_preds"], targets)
        losses["loss"] = sum(losses.values())
        return losses


class SECONDHead(nn.Module):
    """IoU-refinement RoI head of SECOND-IoU (reference
    ``pcdet/models/roi_heads/second_head.py``): 7x7 BEV RoI-grid bilinear
    pooling from spatial_features_2d, shared FCs, a single IoU output."""
    grid_size: int = 7
    shared_fc: Tuple[int, ...] = (256, 256)
    iou_fc: Tuple[int, ...] = (256, 256)
    dp_ratio: float = 0.3
    point_cloud_range: Tuple[float, ...] = (0, -40, -3, 70.4, 40, 1)
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.1)
    feature_stride: int = 8
    use_running_average: bool = False

    @nn.compact
    def __call__(self, rois, bev_features, train: bool = False):
        """rois (B, R, 7); bev_features (B, H, W, C) → iou preds (B, R, 1).

        BEV grid points: a g x g grid over the rotated roi footprint
        (reference ``second_head.py:roi_grid_pool`` via rotated grid +
        bilinear interpolation)."""
        from ...core import geometry
        from .vsa import bilinear_interpolate_batched

        b, r = rois.shape[:2]
        g = self.grid_size
        gx, gy = jnp.meshgrid(jnp.arange(g, dtype=jnp.float32),
                              jnp.arange(g, dtype=jnp.float32),
                              indexing="ij")
        cell = jnp.stack([gx, gy], -1).reshape(-1, 2)  # (g*g, 2)
        local = ((cell[None, None] + 0.5) / g - 0.5) * rois[..., None, 3:5]
        c, s = jnp.cos(rois[..., 6]), jnp.sin(rois[..., 6])
        wx = (local[..., 0] * c[..., None] - local[..., 1] * s[..., None]
              + rois[..., None, 0])
        wy = (local[..., 0] * s[..., None] + local[..., 1] * c[..., None]
              + rois[..., None, 1])
        vx = self.voxel_size[0] * self.feature_stride
        vy = self.voxel_size[1] * self.feature_stride
        fx = (wx - self.point_cloud_range[0]) / vx
        fy = (wy - self.point_cloud_range[1]) / vy
        pooled = bilinear_interpolate_batched(
            bev_features, fx.reshape(b, -1), fy.reshape(b, -1))
        x = pooled.reshape(b, r, -1)

        for i, f in enumerate(self.shared_fc):
            x = nn.Dense(f, use_bias=False, name=f"shared_fc{i}")(x)
            x = MaskedBatchNorm(
                name=f"shared_bn{i}",
                use_running_average=self.use_running_average)(
                x, use_running_average=not train)
            x = nn.relu(x)
            if i != len(self.shared_fc) - 1 and self.dp_ratio > 0:
                x = nn.Dropout(self.dp_ratio, deterministic=not train)(x)
        for i, f in enumerate(self.iou_fc):
            x = nn.Dense(f, use_bias=False, name=f"iou_fc{i}")(x)
            x = MaskedBatchNorm(
                name=f"iou_bn{i}",
                use_running_average=self.use_running_average)(
                x, use_running_average=not train)
            x = nn.relu(x)
            if i == 0 and self.dp_ratio >= 0:
                x = nn.Dropout(self.dp_ratio, deterministic=not train)(x)
        return nn.Dense(1, name="iou_out")(x)


class SECONDIoU(nn.Module):
    """SECOND-IoU (reference ``second_net_iou.py``): SECOND one-stage
    detector + SECONDHead IoU rectification; at test time the final score
    blends cls and predicted IoU."""
    num_classes: int = 3
    point_cloud_range: Tuple[float, ...] = (0, -40, -3, 70.4, 40, 1)
    voxel_size: Tuple[float, float, float] = (0.5, 0.5, 0.1)
    grid_size: Tuple[int, int, int] = (1408, 1600, 40)
    anchor_configs: Tuple[Dict[str, Any], ...] = DEFAULT_ANCHOR_CONFIGS
    backbone_caps: Tuple[int, int, int, int] = (24000, 16000, 10000, 10000)
    train_nms: Dict = None
    test_nms: Dict = None

    def setup(self):
        from .pvrcnn import TRAIN_NMS, TEST_NMS  # noqa: F401
        Z = self.grid_size[2] + 1
        self.backbone3d = VoxelBackbone8x(
            spatial_shape=(Z, self.grid_size[1], self.grid_size[0]),
            caps=self.backbone_caps, name="backbone3d")
        self.bev_backbone = BaseBEVBackbone(name="backbone2d")
        self.anchor_head = AnchorHeadSingle(
            num_classes=self.num_classes,
            point_cloud_range=self.point_cloud_range,
            grid_size=self.grid_size,
            anchor_configs=self.anchor_configs, name="dense_head")
        self.roi_head = SECONDHead(
            point_cloud_range=self.point_cloud_range,
            voxel_size=self.voxel_size, name="roi_head")

    def __call__(self, batch, train: bool = False):
        from .pvrcnn import TRAIN_NMS, TEST_NMS
        from .roi_head import assign_roi_targets, proposal_layer

        ms = self.backbone3d(batch["voxel_features"], batch["voxel_keys"],
                             train=train)
        bev = self.bev_backbone(height_compression(ms["out"]), train=train)
        head_preds = self.anchor_head(bev)
        boxes, cls = self.anchor_head.decode_boxes(head_preds)
        nms_cfg = dict(self.train_nms or TRAIN_NMS) if train else dict(
            self.test_nms or TEST_NMS)
        proposals = proposal_layer(boxes, cls, **nms_cfg)
        out = dict(head_preds=head_preds, batch_box_preds=boxes,
                   batch_cls_preds=cls, proposals=proposals)
        if train:
            targets = assign_roi_targets(
                self.make_rng("sampling"), proposals, batch["gt_boxes"])
            rois = targets["rois"]
            out["roi_targets"] = targets
            out["rois"] = rois
            out["roi_labels"] = targets["roi_labels"]
        else:
            rois = proposals["rois"]
            out["rois"] = rois
            out["roi_labels"] = proposals["roi_labels"]
            out["roi_scores"] = proposals["roi_scores"]
            out["roi_scores_full"] = proposals["roi_scores_full"]
        out["rcnn_iou"] = self.roi_head(rois, bev, train=train)
        out["batch_box_preds_rcnn"] = rois  # boxes are NOT re-regressed
        out["rcnn_cls"] = out["rcnn_iou"]
        return out

    def loss(self, out, batch):
        targets = self.anchor_head.targets(batch["gt_boxes"])
        losses = self.anchor_head.loss(out["head_preds"], targets)
        # BCE between predicted IoU and the sampled rois' gt IoU labels
        t = out["roi_targets"]
        labels = t["rcnn_cls_labels"]
        valid = (labels >= 0).astype(jnp.float32)
        p = jax.nn.sigmoid(out["rcnn_iou"][..., 0])
        eps = 1e-7
        bce = -(labels * jnp.log(jnp.clip(p, eps, 1.0))
                + (1 - labels) * jnp.log(jnp.clip(1 - p, eps, 1.0)))
        losses["rcnn_loss_iou"] = (jnp.sum(bce * valid)
                                   / jnp.maximum(jnp.sum(valid), 1.0))
        losses["loss"] = sum(losses.values())
        return losses


def second_post_processing(out, nms_pre=4096, nms_post=500, nms_thresh=0.01,
                           score_thresh=0.1):
    """SECOND post-processing: sigmoid class scores, class-agnostic NMS."""
    boxes = out["batch_box_preds"]
    probs = jax.nn.sigmoid(out["batch_cls_preds"])
    scores = jnp.max(probs, axis=-1)
    labels = jnp.argmax(probs, axis=-1).astype(jnp.int32) + 1

    def single(b, s, l, p):
        masked = jnp.where(s >= score_thresh, s, nms_mod.NEG_INF)
        k = min(nms_pre, masked.shape[0])
        top_s, top_i = jax.lax.top_k(masked, k)
        idx, valid = nms_mod.nms_bev(b[top_i], top_s, nms_thresh, nms_post)
        sel = top_i[idx]
        return (jnp.where(valid[:, None], b[sel], 0.0),
                jnp.where(valid, s[sel], 0.0),
                jnp.where(valid, l[sel], 0),
                jnp.where(valid[:, None], p[sel], 0.0), valid)

    bb, ss, ll, pp, vv = jax.vmap(single)(boxes, scores, labels, probs)
    return dict(boxes=bb, scores=ss, labels=ll, sem_scores_full=pp,
                valid=vv)
