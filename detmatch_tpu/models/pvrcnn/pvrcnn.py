"""PV-RCNN detector (reference ``pcdet/models/detectors/pv_rcnn.py`` +
``detector3d_template.py``): MeanVFE → VoxelBackbone8x → HeightCompression →
BaseBEVBackbone → AnchorHeadSingle → VoxelSetAbstraction → PointHeadSimple →
PVRCNNHead, with class-agnostic post-processing NMS.

Batch format (all fixed shapes):
    points: (B, P, 4); points_valid: (B, P)
    voxel_features: (B, V, 4); voxel_keys: (B, V)   [from ops.voxelize]
    gt_boxes: (B, G, 8) zero-padded, last col 1-based class (train only)
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...core import nms as nms_mod
from .anchor_head import AnchorHeadSingle
from .backbone3d import VoxelBackbone8x
from .bev import BaseBEVBackbone, height_compression
from .point_head import PointHeadSimple
from .roi_head import PVRCNNHead, proposal_layer
from .vsa import VoxelSetAbstraction

# DetMatch PV-RCNN anchor config (``split_0.py:132-160``)
DEFAULT_ANCHOR_CONFIGS = (
    dict(class_name="Pedestrian", anchor_sizes=[[0.8, 0.6, 1.73]],
         anchor_rotations=[0, 1.57], anchor_bottom_heights=[-0.6],
         align_center=False, feature_map_stride=8,
         matched_threshold=0.5, unmatched_threshold=0.35),
    dict(class_name="Cyclist", anchor_sizes=[[1.76, 0.6, 1.73]],
         anchor_rotations=[0, 1.57], anchor_bottom_heights=[-0.6],
         align_center=False, feature_map_stride=8,
         matched_threshold=0.5, unmatched_threshold=0.35),
    dict(class_name="Car", anchor_sizes=[[3.9, 1.6, 1.56]],
         anchor_rotations=[0, 1.57], anchor_bottom_heights=[-1.78],
         align_center=False, feature_map_stride=8,
         matched_threshold=0.6, unmatched_threshold=0.45),
)

TRAIN_NMS = dict(nms_pre=9000, nms_post=512, nms_thresh=0.8)
TEST_NMS = dict(nms_pre=1024, nms_post=100, nms_thresh=0.7)
POST_NMS = dict(nms_pre=4096, nms_post=500, nms_thresh=0.1,
                score_thresh=0.1)


class PVRCNN(nn.Module):
    num_classes: int = 3
    point_cloud_range: Tuple[float, ...] = (0, -40, -3, 70.4, 40, 1)
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.1)
    grid_size: Tuple[int, int, int] = (1408, 1600, 40)
    anchor_configs: Tuple[Dict[str, Any], ...] = DEFAULT_ANCHOR_CONFIGS
    num_keypoints: int = 2048
    backbone_caps: Tuple[int, int, int, int] = (24000, 16000, 10000, 10000)
    train_nms: Dict = None
    test_nms: Dict = None
    # bf16 compute in the dense conv / grouped-MLP / FC paths (params,
    # BN statistics, losses, box math stay f32). None = full f32.
    compute_dtype: Any = None
    # PVRCNNHead overrides (grid_size, pool_nsamples, target_cfg, ...).
    # Production uses the reference defaults; tiny/dryrun configs shrink
    # the RoI head here — its grouped-gather backward (scatter-add of
    # roi_per_image*G^3*nsample rows) dominates small-host runtimes.
    roi_head_cfg: Dict = None
    # VoxelBackbone8x overrides (channels, out_channels) and
    # BaseBEVBackbone overrides (layer_nums, num_filters, ...) for
    # tiny/dryrun configs — XLA-CPU compile time of the fwd+bwd graph
    # scales with layer count. Production uses the reference defaults.
    backbone3d_cfg: Dict = None
    bev_cfg: Dict = None

    def setup(self):
        Z = self.grid_size[2] + 1
        self.backbone3d = VoxelBackbone8x(
            spatial_shape=(Z, self.grid_size[1], self.grid_size[0]),
            caps=self.backbone_caps, name="backbone3d",
            **(self.backbone3d_cfg or {}))
        self.bev_backbone = BaseBEVBackbone(name="backbone2d",
                                            dtype=self.compute_dtype,
                                            **(self.bev_cfg or {}))
        self.anchor_head = AnchorHeadSingle(
            num_classes=self.num_classes,
            point_cloud_range=self.point_cloud_range,
            grid_size=self.grid_size,
            anchor_configs=self.anchor_configs, name="dense_head")
        self.vsa = VoxelSetAbstraction(
            num_keypoints=self.num_keypoints,
            voxel_size=self.voxel_size,
            dtype=self.compute_dtype,
            point_cloud_range=self.point_cloud_range, name="pfe")
        self.point_head = PointHeadSimple(name="point_head")
        self.roi_head = PVRCNNHead(num_classes=self.num_classes,
                                   name="roi_head",
                                   dtype=self.compute_dtype,
                                   **(self.roi_head_cfg or {}))

    def __call__(self, batch, train: bool = False):
        """Full forward. Returns a dict of predictions / loss ingredients.

        In training mode requires rngs {'sampling', 'dropout'} and
        batch['gt_boxes'].
        """
        ms = self.backbone3d(batch["voxel_features"], batch["voxel_keys"],
                             train=train)
        return self.forward_from_ms(batch, ms, train=train)

    def backbone_fwd(self, batch, train: bool = False):
        """Segment 1 of the two-segment gradient split: just the sparse
        backbone (compiled as its own XLA program; see
        ``ssl_step.make_stu3d_segmented``)."""
        return self.backbone3d(batch["voxel_features"],
                               batch["voxel_keys"], train=train)

    def forward_from_ms(self, batch, ms, train: bool = False):
        """Everything after the 3D backbone (segment 2)."""
        spatial_features = height_compression(ms["out"])  # (B, H, W, 256)
        bev = self.bev_backbone(spatial_features, train=train)
        head_preds = self.anchor_head(bev)
        batch_box_preds, batch_cls_preds = self.anchor_head.decode_boxes(
            head_preds)

        vsa_out = self.vsa(batch["points"], batch["points_valid"],
                           spatial_features, ms, train=train)
        point_logits = self.point_head(
            vsa_out["point_features_before_fusion"], vsa_out["kp_valid"],
            train=train)
        point_scores = jax.nn.sigmoid(point_logits[..., 0])

        nms_cfg = dict(self.train_nms or TRAIN_NMS) if train else dict(
            self.test_nms or TEST_NMS)
        proposals = proposal_layer(batch_box_preds, batch_cls_preds,
                                   **nms_cfg)

        out = dict(
            head_preds=head_preds,
            batch_box_preds=batch_box_preds,
            batch_cls_preds=batch_cls_preds,
            point_logits=point_logits,
            point_scores=point_scores,
            keypoints=vsa_out["keypoints"],
            kp_valid=vsa_out["kp_valid"],
            proposals=proposals,
        )

        if train:
            targets = self.roi_head.assign_targets(
                self.make_rng("sampling"), proposals, batch["gt_boxes"])
            rois = targets["rois"]
            out["roi_targets"] = targets
            out["rois"] = rois
            out["roi_labels"] = targets["roi_labels"]
            out["roi_scores_full"] = targets["roi_scores_full"]
        else:
            rois = proposals["rois"]
            out["rois"] = rois
            out["roi_labels"] = proposals["roi_labels"]
            out["roi_scores"] = proposals["roi_scores"]
            out["roi_scores_full"] = proposals["roi_scores_full"]

        rcnn_cls, rcnn_reg = self.roi_head(
            rois, vsa_out["keypoints"], vsa_out["kp_valid"],
            vsa_out["point_features"], point_scores, train=train)
        out["rcnn_cls"] = rcnn_cls
        out["rcnn_reg"] = rcnn_reg
        out["batch_box_preds_rcnn"] = PVRCNNHead.decode_boxes(rois, rcnn_reg)
        return out

    def loss(self, out, batch):
        """Total training loss = rpn + point + rcnn
        (``pv_rcnn.py:24-31``)."""
        rpn_targets = self.anchor_head.targets(batch["gt_boxes"])
        rpn = self.anchor_head.loss(out["head_preds"], rpn_targets)
        pt_targets = self.point_head.targets(
            out["keypoints"], out["kp_valid"], batch["gt_boxes"])
        point_loss = PointHeadSimple.loss(out["point_logits"], pt_targets)
        rcnn = PVRCNNHead.loss(out["rcnn_cls"], out["rcnn_reg"],
                               out["roi_targets"])
        losses = dict(rpn, point_loss_cls=point_loss, **rcnn)
        losses["loss"] = sum(losses.values())
        return losses

    def loss_grouped(self, out, batch, groups):
        """Training loss over a concatenated batch, regrouped per
        sub-batch: for each ``name -> (mask (B,) bool, weight)`` entry,
        the losses over the masked samples are normalized exactly as a
        separate forward over just those samples would normalize them
        (per-sample rpn means; batch-global positive counts for the point
        and RoI heads restricted to the group). Lets the SSL step run ONE
        PV-RCNN pass over labeled+unlabeled samples instead of two.

        Returns {'<name>.<loss>': scalar, ..., 'loss': weighted total}.
        """
        from .roi_head import roi_head_loss_terms

        rpn_targets = self.anchor_head.targets(batch["gt_boxes"])
        rpn_per = self.anchor_head.loss_per_sample(out["head_preds"],
                                                   rpn_targets)
        pt_targets = self.point_head.targets(
            out["keypoints"], out["kp_valid"], batch["gt_boxes"])
        pt_numer, pt_pos = PointHeadSimple.loss_terms(out["point_logits"],
                                                      pt_targets)
        rcnn_terms = roi_head_loss_terms(out["rcnn_cls"], out["rcnn_reg"],
                                         out["roi_targets"])
        result = {}
        total = 0.0
        for name, (mask, weight) in groups.items():
            m = mask.astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            sub = {k: jnp.sum(v * m) / cnt for k, v in rpn_per.items()}
            sub["point_loss_cls"] = (jnp.sum(pt_numer * m)
                                     / jnp.maximum(jnp.sum(pt_pos * m),
                                                   1.0))
            for k, (nu, de) in rcnn_terms.items():
                sub[k] = jnp.sum(nu * m) / jnp.maximum(jnp.sum(de * m),
                                                       1.0)
            for k, v in sub.items():
                result[f"{name}.{k}"] = v
            total = total + weight * sum(sub.values())
        result["loss"] = total
        return result


@partial(jax.jit, static_argnames=("nms_pre", "nms_post", "no_nms"))
def post_processing(out, nms_pre=4096, nms_post=500, nms_thresh=0.1,
                    score_thresh=0.1, no_nms=False):
    """Class-agnostic final NMS (reference
    ``detector3d_template.py:176-309`` incl. DetMatch sem_scores_full).

    Returns fixed-size per-image dict:
        boxes (B, K, 7), scores (B, K), labels (B, K) 1-based,
        sem_scores_full (B, K, C) sigmoid, valid (B, K).
    """
    boxes = out["batch_box_preds_rcnn"]
    cls = jax.nn.sigmoid(out["rcnn_cls"][..., 0])  # (B, N)
    labels = out["roi_labels"]
    full = jax.nn.sigmoid(out["roi_scores_full"])

    if no_nms:
        valid = cls >= score_thresh
        return dict(boxes=boxes, scores=cls, labels=labels,
                    sem_scores_full=full, valid=valid)

    def single(b, s, l, f):
        masked = jnp.where(s >= score_thresh, s, nms_mod.NEG_INF)
        k = min(nms_pre, masked.shape[0])
        top_s, top_i = jax.lax.top_k(masked, k)
        idx, valid = nms_mod.nms_bev(b[top_i], top_s, nms_thresh, nms_post)
        sel = top_i[idx]
        return (jnp.where(valid[:, None], b[sel], 0.0),
                jnp.where(valid, s[sel], 0.0),
                jnp.where(valid, l[sel], 0),
                jnp.where(valid[:, None], f[sel], 0.0),
                valid)

    bb, ss, ll, ff, vv = jax.vmap(single)(boxes, cls, labels, full)
    return dict(boxes=bb, scores=ss, labels=ll, sem_scores_full=ff,
                valid=vv)
