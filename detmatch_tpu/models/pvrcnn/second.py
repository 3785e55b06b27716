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
