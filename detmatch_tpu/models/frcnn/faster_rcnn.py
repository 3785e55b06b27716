"""Faster R-CNN R50-FPN detector (2D branch of DetMatch).

Assembles ResNet-50-caffe + FPN + RPN + StandardRoIHead per the reference
config (``configs/detmatch/001/detmatch/split_0.py:40-99``). Operates on a
fixed padded canvas (NHWC, caffe BGR normalization done by the data layer);
per-image true (h, w) is passed for box clipping.

Train path: RPN losses on 256 sampled anchors + RoI losses on 512 sampled
proposals (gt added as proposals). Test path: 1000 proposals → RoI head →
sigmoid scores over C+1 channels → multiclass NMS keeping full score rows.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.roialign import multilevel_roi_align
from .resnet import FPN, ResNet50
from .roi_head2d import (Shared2FCBBoxHead, decode_rcnn, multiclass_nms_2d,
                         rcnn_loss, sample_rcnn_targets)
from .rpn import RPNHead, grid_anchors, rpn_loss, rpn_proposals


class FasterRCNN(nn.Module):
    num_classes: int = 3
    canvas: Tuple[int, int] = (384, 1280)  # padded (H, W)
    train_rpn_nms_pre: int = 2000
    train_rpn_max: int = 1000
    test_rpn_nms_pre: int = 1000
    test_rpn_max: int = 1000
    rcnn_num_samples: int = 512
    # bf16 compute in backbone/FPN/RPN convs and RoI-head FCs (params,
    # FrozenBN constants, logits, losses, box math stay f32)
    compute_dtype: Any = None
    # ResNet50 overrides (stage_blocks, frozen_stages). Production uses
    # the reference depth (3,4,6,3); tiny/dryrun configs shrink it —
    # XLA-CPU compile time of the fwd+bwd graph scales with block count.
    backbone_cfg: Dict = None

    def setup(self):
        self.backbone = ResNet50(name="backbone",
                                 dtype=self.compute_dtype,
                                 **(self.backbone_cfg or {}))
        self.neck = FPN(name="neck", dtype=self.compute_dtype)
        self.rpn_head = RPNHead(name="rpn_head",
                                dtype=self.compute_dtype)
        self.bbox_head = Shared2FCBBoxHead(num_classes=self.num_classes,
                                           dtype=self.compute_dtype,
                                           name="bbox_head")
        h, w = self.canvas
        self._anchors = [
            jnp.asarray(grid_anchors(int(np.ceil(h / s)),
                                     int(np.ceil(w / s)), s))
            for s in (4, 8, 16, 32, 64)
        ]

    def extract_feat(self, images):
        return self.neck(self.backbone(images))

    def __call__(self, images, img_shapes, train: bool = False):
        """Feature + RPN forward (shared by train/test).

        Args:
            images: (B, H, W, 3); img_shapes: (B, 2) true (h, w).
        Returns:
            dict(feats, rpn_outs, proposals (B, P, 4),
                 proposal_scores (B, P)).
        """
        feats = self.extract_feat(images)
        rpn_outs = self.rpn_head(feats)
        nms_pre = self.train_rpn_nms_pre if train else self.test_rpn_nms_pre
        max_img = self.train_rpn_max if train else self.test_rpn_max

        anchors = self._anchors
        proposals, proposal_scores = jax.vmap(
            lambda louts, shape: rpn_proposals(louts, anchors, shape,
                                               nms_pre, max_img)
        )(rpn_outs, img_shapes)
        # proposals are RoI coordinates, not a differentiable prediction:
        # mmdet's RoIAlign backpropagates to features only, never to rois
        # (and RPN trains through its own loss head). Detaching here both
        # matches the reference and removes the backward slice through the
        # proposal NMS/decode machinery (measured 6.6 GB of backward
        # residuals at the production canvas, batch 4).
        proposals = jax.lax.stop_gradient(proposals)
        proposal_scores = jax.lax.stop_gradient(proposal_scores)
        if self.is_initializing():
            # create bbox_head params during init (loss/simple_test reach
            # them outside __call__)
            dummy = jnp.zeros((images.shape[0], 1, 4), images.dtype)
            self.roi_forward(feats, dummy)
        return dict(feats=feats, rpn_outs=rpn_outs, proposals=proposals,
                    proposal_scores=proposal_scores)

    def roi_forward(self, feats, rois_batched):
        """rois_batched: (B, R, 4) → (cls (B, R, C+1), reg (B, R, C*4))."""
        b, r = rois_batched.shape[:2]
        per_level = [f for f in feats[:4]]  # strides 4..32
        pooled = jax.vmap(
            lambda fl, rois: multilevel_roi_align(fl, rois,
                                                  strides=(4, 8, 16, 32))
        )(per_level, rois_batched)  # (B, R, o, o, C)
        # one fused (B*R) matmul through the shared-FC head (MXU-sized)
        cls, reg = self.bbox_head(pooled.reshape(b * r, *pooled.shape[2:]))
        return (cls.reshape(b, r, cls.shape[-1]),
                reg.reshape(b, r, reg.shape[-1]))

    def loss(self, rng_key, fwd, gt_boxes, gt_labels, gt_valid):
        """Full train losses dict (RPN + RoI).

        Args:
            fwd: output of __call__(train=True).
            gt_boxes: (B, G, 4); gt_labels: (B, G) int32 0-based;
            gt_valid: (B, G).
        """
        k_rpn, k_rcnn = jax.random.split(rng_key)
        out = rpn_loss(k_rpn, fwd["rpn_outs"], self._anchors, gt_boxes,
                       gt_valid)
        keys = jax.random.split(k_rcnn, gt_boxes.shape[0])
        targets = jax.vmap(
            lambda k, p, pv, gb, gl, gv: sample_rcnn_targets(
                k, p, pv, gb, gl, gv, num=self.rcnn_num_samples)
        )(keys, fwd["proposals"],
          fwd["proposal_scores"] > -1e9, gt_boxes, gt_labels, gt_valid)
        cls_logits, reg_preds = self.roi_forward(fwd["feats"],
                                                 targets["rois"])
        out.update(rcnn_loss(cls_logits, reg_preds, targets,
                             num_classes=self.num_classes))
        return out

    def simple_test(self, images, img_shapes, score_thr=0.05, iou_thr=0.5,
                    max_per_img=100, with_nms=True):
        """Standard eval path; also the teacher's SimpleTest_2D when
        with_nms=False (pre-NMS boxes + sigmoid scores,
        ``processors_2d.py:12-83``)."""
        fwd = self(images, img_shapes, train=False)
        cls_logits, reg_preds = self.roi_forward(fwd["feats"],
                                                 fwd["proposals"])
        num_classes = self.num_classes

        def single(props, cls_l, reg_p, shape, pvalid):
            boxes, scores = decode_rcnn(props, cls_l, reg_p,
                                        num_classes, shape)
            if with_nms:
                return multiclass_nms_2d(boxes, scores, score_thr,
                                         iou_thr, max_per_img)
            return dict(boxes=boxes, scores=scores, valid=pvalid)

        return jax.vmap(single)(fwd["proposals"], cls_logits, reg_preds,
                                img_shapes, fwd["proposal_scores"] > -1e9)
