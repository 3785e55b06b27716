"""SSL processors: box transforms between teacher/student frames, 3D→2D
projection, and the DetMatch fusion Hungarian matching — all batched,
static-shape, on-device.

Mirrors reference ``ssl_modules/processors/*`` and
``ssl_modules/bbox_utils.py``; the scipy Hungarian is replaced by the
on-device JV solver (``core/hungarian.py``).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..core import geometry, hungarian, losses, nms as nms_mod, transforms
from ..core.coders import xyxy_to_cxcywh
from . import boxset


def transform_3d(bs, aug3d: transforms.Aug3D, reverse: bool):
    """BboxesTransform_3D (``processors_3d.py:12-56``): apply/reverse a
    recorded per-sample 3D aug on a 3D BoxSet. aug3d fields are batched
    (B,)-leading."""
    fn = (transforms.reverse_aug3d_boxes if reverse
          else transforms.apply_aug3d_boxes)
    boxes = jax.vmap(fn)(bs["boxes"], aug3d)
    boxes = jnp.where(bs["valid"][..., None], boxes, 0.0)
    return dict(boxes=boxes, scores=bs["scores"], valid=bs["valid"])


def transform_2d(bs, aug2d: transforms.Aug2D, reverse: bool):
    """BboxesTransform_2D (``processors_2d.py:135-192``)."""
    fn = (transforms.reverse_aug2d_boxes if reverse
          else transforms.apply_aug2d_boxes)
    boxes = jax.vmap(fn)(bs["boxes"], aug2d)
    boxes = jnp.where(bs["valid"][..., None], boxes, 0.0)
    return dict(boxes=boxes, scores=bs["scores"], valid=bs["valid"])


def boxes_3d_to_2d(bs, lidar2img, ori_shape, min_depth=0.5, min_corners=3):
    """Bboxes3DTo2D (``processors_3d.py:82-155`` / ``bbox_utils.py:372-441``):
    project a 3D BoxSet to 2D xyxy with validity.

    Args:
        lidar2img: (B, 4, 4); ori_shape: (B, 2) per-image (h, w), or None
            to skip clipping / the inside-image test.
    Returns a 2D BoxSet (same slots/scores).
    """
    def single(boxes, proj, shape):
        return geometry.boxes_3d_to_2d(boxes, proj, img_shape=shape,
                                       min_depth=min_depth,
                                       min_corners=min_corners)

    if ori_shape is None:
        boxes2d, ok = jax.vmap(lambda b, p: single(b, p, None))(
            bs["boxes"], lidar2img)
    else:
        boxes2d, ok = jax.vmap(single)(bs["boxes"], lidar2img, ori_shape)
    valid = bs["valid"] & ok
    return dict(boxes=jnp.where(valid[..., None], boxes2d, 0.0),
                scores=bs["scores"], valid=valid)


def nms_2d_boxset(bs, score_thr, iou_thr, max_num):
    """BboxesNMS_2D on a (possibly projected) 2D BoxSet
    (``bbox_utils.py:282-369`` filter_by_nms_2d): class-aware NMS over
    per-class scores, survivors keep their full score rows."""
    b, k, c = bs["scores"].shape

    def single(boxes, scores, valid):
        flat_scores = scores.reshape(-1)  # (K*C,)
        flat_boxes = jnp.repeat(boxes, c, axis=0)
        flat_labels = jnp.tile(jnp.arange(c, dtype=jnp.int32), (k,))
        flat_valid = jnp.repeat(valid, c)
        masked = jnp.where(flat_valid & (flat_scores > score_thr),
                           flat_scores, nms_mod.NEG_INF)
        idx, ok = nms_mod.batched_nms_2d(flat_boxes, masked, flat_labels,
                                         iou_thr, max_num)
        rows = idx // c
        return rows, ok

    rows, ok = jax.vmap(single)(bs["boxes"], bs["scores"], bs["valid"])
    return boxset.gather(bs, rows, ok)


def fusion_hungarian_matching(bs3d, bs2d, lidar2img, ori_shape,
                              cost_thr=-1.5,
                              cls_weight=2.0, l1_weight=5.0, iou_weight=2.0,
                              project_3d_to_2d=True, max_match=128):
    """FusionHungarianMatching (``processors_fusion.py:52-223``).

    Projects teacher 3D boxes to 2D (optionally), builds the DETR-style cost
    (double-sided focal + normalized-L1 + gIoU), solves the assignment
    on-device, rejects matches with cost > cost_thr, and returns slot-aligned
    matched 3D and 2D BoxSets plus per-slot match costs.

    Args:
        bs3d: 3D BoxSet (boxes (B,K3,7) or already-projected (B,K3,4) if
            project_3d_to_2d=False); bs2d: 2D BoxSet.
        ori_shape: (B, 2) per-image un-augmented (h, w) for normalization.
    """
    # bound the square assignment problem: the JV augmenting loop is
    # O(K^3) sequential (~450 ms at K=500 on v5e); compacting to the
    # top-scoring valid slots is exact while <= max_match boxes survive
    # the score filters
    if max_match is not None:
        if bs3d["boxes"].shape[1] > max_match:
            bs3d = boxset.topk(bs3d, max_match)
        if bs2d["boxes"].shape[1] > max_match:
            bs2d = boxset.topk(bs2d, max_match)
    if project_3d_to_2d:
        proj = boxes_3d_to_2d(
            dict(boxes=bs3d["boxes"], scores=bs3d["scores"],
                 valid=jnp.ones_like(bs3d["valid"])),
            lidar2img, None)  # validity "completely tossed out" (ref TODO)
        boxes3d_2d = proj["boxes"]
    else:
        boxes3d_2d = bs3d["boxes"]

    k3 = bs3d["boxes"].shape[1]
    k2 = bs2d["boxes"].shape[1]
    kk = max(k3, k2)

    def cost_single(b3p, s3, v3, b2, s2, v2, shape):
        eps = 1e-6
        l3 = jnp.log(jnp.clip(s3, eps, 1 - eps)
                     / (1 - jnp.clip(s3, eps, 1 - eps)))
        l2 = jnp.log(jnp.clip(s2, eps, 1 - eps)
                     / (1 - jnp.clip(s2, eps, 1 - eps)))
        h, w = shape[0], shape[1]
        factor = jnp.stack([w, h, w, h]).astype(b2.dtype)
        p3n = xyxy_to_cxcywh(b3p) / factor
        cost = (losses.double_sided_focal_cost(l3, l2, weight=cls_weight)
                + losses.bbox_l1_cost(p3n, b2 / factor, weight=l1_weight)
                + losses.giou_cost(b3p, b2, weight=iou_weight))
        # pad to square (K, K); the assignment is solved on detached costs
        # (reference detaches before scipy, modified_hungarian_assigner.py:128
        # — and lax.while_loop is not reverse-differentiable)
        cost = jax.lax.stop_gradient(cost)
        cost_sq = jnp.full((kk, kk), hungarian.BIG, cost.dtype)
        cost_sq = jax.lax.dynamic_update_slice(cost_sq, cost, (0, 0))
        rv = jnp.zeros((kk,), bool).at[:k3].set(v3)
        cv = jnp.zeros((kk,), bool).at[:k2].set(v2)
        return cost_sq, rv, cv

    cost_sq, rv, cv = jax.vmap(cost_single)(
        boxes3d_2d, bs3d["scores"], bs3d["valid"],
        bs2d["boxes"], bs2d["scores"], bs2d["valid"], ori_shape)
    # ONE batched solve for the whole image batch (Pallas in-VMEM JV on
    # TPU) instead of a vmapped per-image lax.cond that runs both
    # orientation branches through dispatch-bound XLA while loops
    col4row_b, mcost_b = hungarian.assign_batched(cost_sq, rv, cv)

    def post_single(col4row, mcost):
        col4row = col4row[:k3]
        mcost = mcost[:k3]
        if cost_thr is not None:
            keep = (col4row >= 0) & (mcost <= cost_thr)
        else:
            keep = col4row >= 0
        # compact matched rows to the front (stable) for downstream slots
        order = jnp.argsort(~keep, stable=True)
        rows = order.astype(jnp.int32)
        cols = jnp.where(keep[order], col4row[order], 0).astype(jnp.int32)
        return rows, cols, keep[order], mcost[order]

    rows, cols, ok, mcost = jax.vmap(post_single)(col4row_b, mcost_b)
    out3d = boxset.gather(bs3d, rows, ok)
    out2d = boxset.gather(bs2d, cols, ok)
    return out3d, out2d, jnp.where(ok, mcost, jnp.inf)


def hungarian_consistency_loss(bs_in, bs_target, img_shape,
                               cls_w=2.0, l1_w=20.0, iou_w=2.0,
                               focal_alpha=0.25, focal_gamma=2.0):
    """HungarianConsistency (``consumers_3d.py:12-118``): slot-aligned
    student (projected 3D) boxes regress toward teacher 2D boxes.

    Per-image mean losses, averaged over images with >=1 match; weights
    cls 2 / l1 5*4 / iou 2 (``split_0.py:401-412``).

    Args:
        img_shape: (B, 2) true per-image (h, w) in the student-aug frame.
    """
    pair_valid = bs_in["valid"] & bs_target["valid"]
    pv = pair_valid.astype(jnp.float32)
    n_pairs = jnp.sum(pv, axis=1)  # per image
    img_has = n_pairs > 0
    denom_img = jnp.maximum(jnp.sum(img_has.astype(jnp.float32)), 1.0)
    per_pair_denom = jnp.maximum(n_pairs, 1.0)

    eps = 1e-6
    s_in = jnp.clip(bs_in["scores"], eps, 1 - eps)
    logits = jnp.log(s_in / (1 - s_in))
    labels = jnp.argmax(bs_target["scores"], axis=-1)
    c = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, c)
    p = jax.nn.sigmoid(logits)
    pt = (1 - p) * onehot + p * (1 - onehot)
    fw = (focal_alpha * onehot + (1 - focal_alpha) * (1 - onehot)
          ) * pt ** focal_gamma
    focal = jnp.sum(losses.sigmoid_ce_with_logits(logits, onehot) * fw,
                    axis=-1)
    cls_per_img = jnp.sum(focal * pv, axis=1) / per_pair_denom
    cls_loss = jnp.sum(cls_per_img * img_has) / denom_img

    hw = img_shape.astype(bs_in["boxes"].dtype)
    factor = jnp.stack([hw[:, 1], hw[:, 0], hw[:, 1], hw[:, 0]],
                       axis=-1)[:, None, :]
    # mmdet L1Loss(reduction='mean') averages over elements (N*4)
    l1 = jnp.mean(jnp.abs(bs_in["boxes"] / factor
                          - bs_target["boxes"] / factor), axis=-1)
    l1_per_img = jnp.sum(l1 * pv, axis=1) / per_pair_denom
    l1_loss = jnp.sum(l1_per_img * img_has) / denom_img

    from ..core import iou as iou_mod
    g = iou_mod.iou2d(bs_in["boxes"].reshape(-1, 4),
                      bs_target["boxes"].reshape(-1, 4),
                      mode="giou", aligned=True)
    g = g.reshape(pv.shape)
    giou_per_img = jnp.sum((1.0 - g) * pv, axis=1) / per_pair_denom
    giou_loss = jnp.sum(giou_per_img * img_has) / denom_img

    return dict(cls_loss=cls_loss * cls_w, l1_loss=l1_loss * l1_w,
                iou_loss=giou_loss * iou_w)
