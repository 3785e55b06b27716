"""StandardRoIHead: RoIAlign extractor + Shared2FCBBoxHead.

Mirrors the external-mmdet head the reference configures
(``split_0.py:75-99``): RoIAlign 7x7 over strides [4..32], two shared
1024-FCs, **FocalLoss(sigmoid, gamma=2, alpha=0.5)** classification over
num_classes + 1 channels (bg trained as its own sigmoid channel — the
DetMatch-critical choice that makes scores per-class sigmoids,
``processors_2d.py:66-77``), class-specific L1 box regression
(stds 0.1/0.1/0.2/0.2). Train cfg: MaxIoU 0.5/0.5 (no low-quality match),
RandomSampler 512 @ pos 0.25 with gt-as-proposals (``split_0.py:463-476``).
"""
from __future__ import annotations

from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...core import losses, nms as nms_mod
from ...core.coders import DeltaXYWHCoder
from ...ops.roialign import multilevel_roi_align
from .rpn import max_iou_assign, random_sample

BBOX_STDS = (0.1, 0.1, 0.2, 0.2)


class Shared2FCBBoxHead(nn.Module):
    num_classes: int = 3
    fc_dim: int = 1024
    dtype: Any = None

    @nn.compact
    def __call__(self, roi_feats):
        """roi_feats: (R, 7, 7, C) → (cls (R, C+1), reg (R, C*4))."""
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype,
                             name="shared_fc0")(x))
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype,
                             name="shared_fc1")(x))
        x = x.astype(jnp.float32)
        cls = nn.Dense(self.num_classes + 1, name="fc_cls",
                       bias_init=nn.initializers.constant(
                           -float(np.log((1 - 0.01) / 0.01))))(x)
        reg = nn.Dense(self.num_classes * 4, name="fc_reg",
                       kernel_init=nn.initializers.normal(0.001))(x)
        return cls, reg


def sample_rcnn_targets(rng_key, proposals, prop_valid, gt_boxes, gt_labels,
                        gt_valid, num=512, pos_fraction=0.25):
    """Assign + sample RoIs for the second stage (one image).

    gt boxes are appended as proposals (add_gt_as_proposals=True).

    Returns dict(rois (num, 4), labels (num,) int32 [0..C-1 fg, C bg],
                 reg_targets (num, 4), is_pos (num,), slot_valid (num,)).
    """
    coder = DeltaXYWHCoder(target_stds=BBOX_STDS)
    cand = jnp.concatenate([gt_boxes, proposals], axis=0)
    cand_valid = jnp.concatenate([gt_valid, prop_valid], axis=0)
    assigned, _, _ = max_iou_assign(
        cand, cand_valid, gt_boxes, gt_valid, pos_thr=0.5, neg_thr=0.5,
        min_pos_iou=0.5, match_low_quality=False)
    idx, is_pos, slot_valid = random_sample(rng_key, assigned, num,
                                            pos_fraction)
    rois = cand[idx]
    gt_idx = jnp.clip(assigned[idx] - 1, 0, gt_boxes.shape[0] - 1)
    labels = jnp.where(is_pos, gt_labels[gt_idx], jnp.int32(-1))
    reg_targets = coder.encode(rois, gt_boxes[gt_idx])
    reg_targets = jnp.where(is_pos[:, None], reg_targets, 0.0)
    return dict(rois=rois, labels=labels, reg_targets=reg_targets,
                is_pos=is_pos, slot_valid=slot_valid)


def rcnn_loss(cls_logits, reg_preds, targets, num_classes=3,
              focal_gamma=2.0, focal_alpha=0.5):
    """Focal cls (bg = extra channel) + class-specific L1 reg.

    Args:
        cls_logits: (B, R, C+1); reg_preds: (B, R, C*4);
        targets: batched dict from sample_rcnn_targets.
    """
    labels = jnp.where(targets["is_pos"], targets["labels"], num_classes)
    valid = targets["slot_valid"].astype(jnp.float32)
    avg = jnp.maximum(jnp.sum(valid), 1.0)
    onehot = jax.nn.one_hot(labels, num_classes + 1)
    p = jax.nn.sigmoid(cls_logits)
    pt = (1 - p) * onehot + p * (1 - onehot)
    fw = (focal_alpha * onehot + (1 - focal_alpha) * (1 - onehot)
          ) * pt ** focal_gamma
    cls_l = jnp.sum(losses.sigmoid_ce_with_logits(cls_logits, onehot) * fw,
                    axis=-1)
    loss_cls = jnp.sum(cls_l * valid) / avg

    b, r = labels.shape
    reg = reg_preds.reshape(b, r, num_classes, 4)
    cls_idx = jnp.clip(labels, 0, num_classes - 1)
    reg_sel = jnp.take_along_axis(
        reg, cls_idx[..., None, None].repeat(4, -1), axis=2)[:, :, 0]
    reg_l = jnp.sum(jnp.abs(reg_sel - targets["reg_targets"]), axis=-1)
    loss_bbox = jnp.sum(reg_l * targets["is_pos"]) / avg
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)


def decode_rcnn(rois, cls_logits, reg_preds, num_classes, img_shape):
    """Per-class decoded boxes + sigmoid scores (test path,
    ``processors_2d.py:66-77`` semantics: sigmoid over C+1).

    Returns (boxes (R, C, 4), scores (R, C+1)).
    """
    coder = DeltaXYWHCoder(target_stds=BBOX_STDS)
    r = rois.shape[0]
    reg = reg_preds.reshape(r, num_classes, 4)
    boxes = coder.decode(rois[:, None, :].repeat(num_classes, 1), reg,
                         max_shape=img_shape)
    return boxes, jax.nn.sigmoid(cls_logits)


def multiclass_nms_2d(boxes_per_cls, scores, score_thr, iou_thr, max_num):
    """mmdet multiclass_nms over per-class boxes, keeping full score rows
    of survivors (the reference's ``modified_multiclass_nms`` /
    ``filter_by_nms_2d`` behavior, ``ssl_modules/bbox_utils.py:14-108``).

    Args:
        boxes_per_cls: (R, C, 4); scores: (R, C+1) (bg last, dropped).
    Returns:
        dict(boxes (max_num, 4), scores (max_num,), labels (max_num,),
             scores_full (max_num, C+1), valid (max_num,)).
    """
    r, c = boxes_per_cls.shape[:2]
    flat_boxes = boxes_per_cls.reshape(r * c, 4)
    flat_scores = scores[:, :c].reshape(r * c)
    flat_labels = jnp.tile(jnp.arange(c, dtype=jnp.int32), (r,))
    flat_rows = jnp.repeat(jnp.arange(r, dtype=jnp.int32), c)
    masked = jnp.where(flat_scores > score_thr, flat_scores,
                       nms_mod.NEG_INF)
    idx, valid = nms_mod.batched_nms_2d(flat_boxes, masked, flat_labels,
                                        iou_thr, max_num)
    return dict(
        boxes=jnp.where(valid[:, None], flat_boxes[idx], 0.0),
        scores=jnp.where(valid, flat_scores[idx], 0.0),
        labels=jnp.where(valid, flat_labels[idx], 0),
        scores_full=jnp.where(valid[:, None], scores[flat_rows[idx]], 0.0),
        valid=valid)
