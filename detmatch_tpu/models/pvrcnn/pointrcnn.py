"""PointRCNN detector (reference ``pcdet/models/detectors/point_rcnn.py``):
PointNet2MSG backbone (``pointnet2_backbone.py:9-104``) → PointHeadBox
per-point proposals (``point_head_box.py``) → PointRCNNHead with RoI point
pooling + canonical SA stack (``pointrcnn_head.py``).

TPU design: the reference's "batch" pointnet2 layout (fixed B x N) is the
native layout here; SA levels reuse the masked ``SABranch`` machinery from
VSA; FP layers use ``three_nn``/``three_interpolate``; RoI point pooling is
the cumsum-rank first-K selection (``ops/roipoint_pool.py``).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...core import geometry, losses
from ...core.coders import PointResidualCoder
from ...ops import pointnet
from ...ops.pallas.fps import fps_batched
from ...ops.roipoint_pool import roipoint_pool
from ..layers import MLP, MaskedBatchNorm
from .roi_head import (assign_roi_targets, decode_roi_boxes,
                       proposal_layer, roi_head_loss)
from .vsa import SABranch
from .pvrcnn import TRAIN_NMS, TEST_NMS


class PointNet2MSG(nn.Module):
    """4-level SA encoder + FP decoder (PointRCNN backbone config,
    upstream ``pointrcnn.yaml``)."""
    npoints: Tuple[int, ...] = (4096, 1024, 256, 64)
    radii: Tuple[Tuple[float, float], ...] = ((0.1, 0.5), (0.5, 1.0),
                                              (1.0, 2.0), (2.0, 4.0))
    nsamples: Tuple[Tuple[int, int], ...] = ((16, 32),) * 4
    mlps: Tuple = (((16, 16, 32), (32, 32, 64)),
                   ((64, 64, 128), (64, 96, 128)),
                   ((128, 196, 256), (128, 196, 256)),
                   ((256, 256, 512), (256, 384, 512)))
    fp_mlps: Tuple = ((128, 128), (256, 256), (512, 512), (512, 512))
    use_running_average: bool = False

    @nn.compact
    def __call__(self, points, points_valid, train: bool = False):
        """points: (B, N, 3+C) → per-point features (B, N, fp_mlps[0][-1])."""
        xyz = [points[..., :3]]
        valid = [points_valid]
        feats = [points[..., 3:] if points.shape[-1] > 3 else None]

        for lv in range(len(self.npoints)):
            kp_idx = fps_batched(xyz[lv], valid[lv], self.npoints[lv])
            new_xyz = pointnet.gather_rows(xyz[lv], kp_idx)
            new_valid = jnp.broadcast_to(
                jnp.any(valid[lv], axis=1)[:, None], new_xyz.shape[:2])
            out = SABranch(
                radii=self.radii[lv], nsamples=self.nsamples[lv],
                mlps=self.mlps[lv], name=f"sa{lv}",
                use_running_average=self.use_running_average)(
                new_xyz, new_valid, xyz[lv], valid[lv], feats[lv],
                train=train)
            xyz.append(new_xyz)
            valid.append(new_valid)
            feats.append(out)

        # FP decoder: coarse -> fine
        up = feats[-1]
        for lv in range(len(self.fp_mlps) - 1, -1, -1):
            fine_xyz, fine_valid = xyz[lv], valid[lv]
            coarse_xyz, coarse_valid = xyz[lv + 1], valid[lv + 1]
            dists, idx = jax.vmap(pointnet.three_nn)(
                fine_xyz, fine_valid, coarse_xyz, coarse_valid)
            interp = jax.vmap(pointnet.three_interpolate)(up, idx, dists)
            skip = feats[lv]
            cat = (jnp.concatenate([interp, skip], axis=-1)
                   if skip is not None and skip.shape[-1] > 0 else interp)
            up = MLP(self.fp_mlps[lv], name=f"fp{lv}",
                     use_running_average=self.use_running_average)(
                cat, mask=fine_valid, use_running_average=not train)
        return up  # (B, N, C)


class PointHeadBox(nn.Module):
    """Per-point cls + box regression head (reference
    ``point_head_box.py``); box targets via PointResidualCoder."""
    num_classes: int = 3
    cls_fc: Tuple[int, ...] = (256, 256)
    reg_fc: Tuple[int, ...] = (256, 256)
    extra_width: Tuple[float, float, float] = (0.2, 0.2, 0.2)
    use_running_average: bool = False

    @nn.compact
    def __call__(self, point_features, valid, train: bool = False):
        cls = MLP(self.cls_fc, name="cls_mlp",
                  use_running_average=self.use_running_average)(
            point_features, mask=valid, use_running_average=not train)
        cls_logits = nn.Dense(self.num_classes, name="cls_out")(cls)
        reg = MLP(self.reg_fc, name="reg_mlp",
                  use_running_average=self.use_running_average)(
            point_features, mask=valid, use_running_average=not train)
        box_reg = nn.Dense(PointResidualCoder().code_size,
                           name="reg_out")(reg)
        return cls_logits, box_reg

    def targets(self, points, valid, gt_boxes):
        """(B, N) labels 0/-1/1..C plus (B, N, 8) encoded box targets."""
        coder = PointResidualCoder()

        def single(pts, pv, gb):
            gt_cls = gb[:, 7].astype(jnp.int32)
            gt_valid = gt_cls > 0
            in_box = geometry.points_in_boxes(pts, gb[:, :7])
            in_box = in_box & gt_valid[:, None]
            enlarged = geometry.enlarge_boxes(
                gb[:, :7], jnp.asarray(self.extra_width))
            in_ext = (geometry.points_in_boxes(pts, enlarged)
                      & gt_valid[:, None])
            fg = jnp.any(in_box, axis=0)
            ign = jnp.any(in_ext, axis=0) & ~fg
            box_idx = jnp.argmax(in_box, axis=0)
            labels = jnp.where(fg, gt_cls[box_idx], jnp.where(ign, -1, 0))
            labels = jnp.where(pv, labels, -1)
            enc = coder.encode(gb[box_idx, :7], pts,
                               gt_cls[box_idx])
            enc = jnp.where(fg[:, None], enc, 0.0)
            return labels, enc

        return jax.vmap(single)(points, valid, gt_boxes)

    @staticmethod
    def loss(cls_logits, box_reg, labels, box_targets, num_classes):
        positives = labels > 0
        cared = labels >= 0
        pos_norm = jnp.maximum(jnp.sum(positives.astype(jnp.float32)), 1.0)
        w = cared.astype(jnp.float32) / pos_norm
        onehot = jax.nn.one_hot(jnp.maximum(labels, 0), num_classes + 1,
                                dtype=jnp.float32)[..., 1:]
        cls_loss = jnp.sum(losses.sigmoid_focal_loss(cls_logits, onehot, w))
        reg = losses.weighted_smooth_l1(box_reg, box_targets)
        reg_loss = (jnp.sum(jnp.sum(reg, axis=-1)
                            * positives.astype(jnp.float32)) / pos_norm)
        return cls_loss, reg_loss

    @staticmethod
    def generate_boxes(points, cls_logits, box_reg):
        """Decode per-point boxes (reference
        ``point_head_template.generate_predicted_boxes``)."""
        pred_classes = jnp.argmax(cls_logits, axis=-1).astype(jnp.int32) + 1
        boxes = PointResidualCoder().decode(box_reg, points, pred_classes)
        return boxes, cls_logits


class PointRCNNHead(nn.Module):
    """Canonical RoI refinement over pooled in-box points (reference
    ``pointrcnn_head.py``)."""
    num_sampled: int = 512
    depth_normalizer: float = 70.0
    xyz_up: Tuple[int, ...] = (128, 128)
    sa_npoints: Tuple[int, ...] = (128, 32, -1)
    sa_radii: Tuple[float, ...] = (0.2, 0.4, 100.0)
    sa_nsamples: Tuple[int, ...] = (16, 16, 512)
    sa_mlps: Tuple = ((128, 128, 128), (128, 128, 256), (256, 256, 512))
    cls_fc: Tuple[int, ...] = (256, 256)
    reg_fc: Tuple[int, ...] = (256, 256)
    use_running_average: bool = False

    @nn.compact
    def __call__(self, rois, points, points_valid, point_features,
                 point_scores, train: bool = False):
        """
        Args:
            rois: (B, R, 7); points: (B, N, 3); point_features: (B, N, C);
            point_scores: (B, N) max sigmoid seg score.
        Returns:
            (rcnn_cls (B, R, 1), rcnn_reg (B, R, 7)).
        """
        b, r = rois.shape[:2]
        depth = (jnp.linalg.norm(points, axis=-1)
                 / self.depth_normalizer - 0.5)
        extra = jnp.concatenate(
            [jax.lax.stop_gradient(point_scores)[..., None],
             depth[..., None], point_features], axis=-1)

        pooled, empty = jax.vmap(
            lambda bx, pc, pf, pv: roipoint_pool(
                bx, pc, pf, pv, num_sampled=self.num_sampled)
        )(rois, points, extra, points_valid)  # (B, R, K, 3+2+C)

        # canonical transform
        local = pooled[..., 0:3] - rois[..., None, 0:3]
        local = geometry.rotate_points_z(
            local.reshape(b * r, self.num_sampled, 3),
            -rois[..., 6].reshape(-1)).reshape(b, r, self.num_sampled, 3)
        pooled = jnp.concatenate([local, pooled[..., 3:]], axis=-1)
        pooled = jnp.where(empty[..., None, None], 0.0, pooled)
        pooled = pooled.reshape(b * r, self.num_sampled, -1)
        pv = jnp.broadcast_to((~empty).reshape(b * r, 1),
                              (b * r, self.num_sampled))

        # xyz-up on (local xyz, score, depth), merge with features
        xyz_feats = MLP(self.xyz_up, name="xyz_up",
                        use_running_average=self.use_running_average)(
            pooled[..., 0:5], mask=pv, use_running_average=not train)
        merged = jnp.concatenate([xyz_feats, pooled[..., 5:]], axis=-1)
        merged = MLP((128,), name="merge_down",
                     use_running_average=self.use_running_average)(
            merged, mask=pv, use_running_average=not train)

        xyz = pooled[..., 0:3]
        feats = merged
        valid = pv
        for lv, npoint in enumerate(self.sa_npoints):
            if npoint > 0:
                kp_idx = fps_batched(xyz, valid, npoint)
                new_xyz = pointnet.gather_rows(xyz, kp_idx)
                new_valid = jnp.broadcast_to(
                    jnp.any(valid, axis=1)[:, None], new_xyz.shape[:2])
            else:  # group_all: one giant ball at origin
                new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
                new_valid = jnp.any(valid, axis=1)[:, None]
            feats = SABranch(
                radii=(self.sa_radii[lv],),
                nsamples=(self.sa_nsamples[lv],),
                mlps=(self.sa_mlps[lv],), name=f"sa{lv}",
                use_running_average=self.use_running_average)(
                new_xyz, new_valid, xyz, valid, feats, train=train)
            xyz, valid = new_xyz, new_valid

        shared = feats[:, 0, :].reshape(b, r, -1)  # (B, R, 512)

        def head(x, fcs, final, name):
            x = MLP(fcs, name=f"{name}_mlp",
                    use_running_average=self.use_running_average)(
                x, use_running_average=not train)
            init = (nn.initializers.normal(0.001) if name == "reg"
                    else nn.initializers.lecun_normal())
            return nn.Dense(final, kernel_init=init, name=f"{name}_out")(x)

        rcnn_cls = head(shared, self.cls_fc, 1, "cls")
        rcnn_reg = head(shared, self.reg_fc, 7, "reg")
        return rcnn_cls, rcnn_reg


class PointRCNN(nn.Module):
    num_classes: int = 3
    train_nms: Dict = None
    test_nms: Dict = None

    def setup(self):
        self.backbone = PointNet2MSG(name="backbone3d")
        self.point_head = PointHeadBox(num_classes=self.num_classes,
                                       name="point_head")
        self.roi_head = PointRCNNHead(name="roi_head")

    def __call__(self, batch, train: bool = False):
        """batch: points (B, N, 3+C), points_valid (B, N)
        [+ gt_boxes (B, G, 8) in train]."""
        points = batch["points"]
        valid = batch["points_valid"]
        feats = self.backbone(points, valid, train=train)
        pt_cls, pt_reg = self.point_head(feats, valid, train=train)
        pt_scores = jnp.max(jax.nn.sigmoid(pt_cls), axis=-1)

        boxes, logits = PointHeadBox.generate_boxes(
            points[..., :3], pt_cls, pt_reg)
        nms_cfg = dict(self.train_nms or TRAIN_NMS) if train else dict(
            self.test_nms or TEST_NMS)
        masked_logits = jnp.where(valid[..., None], logits, -1e10)
        proposals = proposal_layer(boxes, masked_logits, **nms_cfg)

        out = dict(point_cls_logits=pt_cls, point_box_reg=pt_reg,
                   point_scores=pt_scores, proposals=proposals)

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

        rcnn_cls, rcnn_reg = self.roi_head(
            rois, points[..., :3], valid, feats, pt_scores, train=train)
        out["rcnn_cls"] = rcnn_cls
        out["rcnn_reg"] = rcnn_reg
        out["batch_box_preds_rcnn"] = decode_roi_boxes(rois, rcnn_reg)
        return out

    def loss(self, out, batch):
        labels, box_t = self.point_head.targets(
            batch["points"][..., :3], batch["points_valid"],
            batch["gt_boxes"])
        pcls, preg = PointHeadBox.loss(
            out["point_cls_logits"], out["point_box_reg"], labels, box_t,
            self.num_classes)
        rcnn = roi_head_loss(out["rcnn_cls"], out["rcnn_reg"],
                             out["roi_targets"])
        losses_d = dict(point_loss_cls=pcls, point_loss_box=preg, **rcnn)
        losses_d["loss"] = sum(losses_d.values())
        return losses_d
