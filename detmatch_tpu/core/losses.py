"""Loss functions and DETR-style match costs (pure jnp, no reductions
hidden — callers mask and normalize explicitly, which is how the padded
static-shape formulation keeps reference semantics).

3D losses mirror ``pcdet/utils/loss_utils.py``; 2D losses mirror the
external mmdet losses the reference configures (FocalLoss sigmoid, CE,
L1, GIoU — ``configs/detmatch/001/detmatch/split_0.py:72-99, 402-405``);
match costs mirror mmdet FocalLossCost / BBoxL1Cost / IoUCost plus the
in-repo DoubleSidedFocalLossCost
(``mmdet3d/core/bbox/match_costs/modified_match_cost.py``).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import iou as iou_mod


def sigmoid_ce_with_logits(logits, targets):
    """Numerically-stable sigmoid BCE (tf semantics,
    ``loss_utils.py:24-42``)."""
    return (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def sigmoid_focal_loss(logits, targets, weights, gamma=2.0, alpha=0.25):
    """pcdet SigmoidFocalClassificationLoss (``loss_utils.py:9-73``).

    Args:
        logits / targets: (..., C) one-hot targets.
        weights: (...) anchor-wise weights (broadcast over classes).
    Returns:
        unreduced (..., C).
    """
    p = jax.nn.sigmoid(logits)
    alpha_w = targets * alpha + (1 - targets) * (1 - alpha)
    pt = targets * (1.0 - p) + (1.0 - targets) * p
    focal_w = alpha_w * jnp.power(pt, gamma)
    loss = focal_w * sigmoid_ce_with_logits(logits, targets)
    return loss * weights[..., None]


def smooth_l1(diff, beta):
    if beta < 1e-5:
        return jnp.abs(diff)
    n = jnp.abs(diff)
    return jnp.where(n < beta, 0.5 * n ** 2 / beta, n - 0.5 * beta)


def weighted_smooth_l1(pred, target, weights=None, beta=1.0 / 9.0,
                       code_weights=None):
    """pcdet WeightedSmoothL1Loss (``loss_utils.py:76-137``); nan targets
    are ignored. Returns unreduced (..., #codes)."""
    target = jnp.where(jnp.isnan(target), pred, target)
    diff = pred - target
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, diff.dtype)
    loss = smooth_l1(diff, beta)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_cross_entropy(logits, targets_onehot, weights):
    """pcdet WeightedCrossEntropyLoss (``loss_utils.py:182-209``)."""
    target = jnp.argmax(targets_onehot, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    return loss * weights


def corner_loss_lidar(pred_boxes, gt_boxes):
    """Flip-invariant corner smooth-L1 (``loss_utils.py:211-234``).

    Args: (N, 7) each. Returns (N,).
    """
    from . import geometry
    pred_c = geometry.boxes_to_corners_3d(pred_boxes)
    gt_c = geometry.boxes_to_corners_3d(gt_boxes)
    gt_flip = gt_boxes.at[:, 6].add(np.pi) if hasattr(gt_boxes, "at") else None
    if gt_flip is None:
        gt_flip = jnp.concatenate(
            [gt_boxes[:, :6], gt_boxes[:, 6:7] + np.pi], axis=-1)
    gt_c_flip = geometry.boxes_to_corners_3d(gt_flip)
    d = jnp.linalg.norm(pred_c - gt_c, axis=2)
    d_flip = jnp.linalg.norm(pred_c - gt_c_flip, axis=2)
    dist = jnp.minimum(d, d_flip)
    return jnp.mean(smooth_l1(dist, 1.0), axis=1)


# ---------------------------------------------------------------------------
# mmdet-style losses (2D branch)
# ---------------------------------------------------------------------------

def mmdet_focal_loss(logits, labels, num_classes, gamma=2.0, alpha=0.25,
                     valid=None, avg_factor=None):
    """mmdet sigmoid FocalLoss with integer labels.

    ``labels == num_classes`` means background (all-zero one-hot).
    Returns scalar mean over (valid) entries unless avg_factor given.
    """
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    pt = (1 - p) * onehot + p * (1 - onehot)
    focal_w = (alpha * onehot + (1 - alpha) * (1 - onehot)) * pt ** gamma
    loss = sigmoid_ce_with_logits(logits, onehot) * focal_w
    loss = jnp.sum(loss, axis=-1)
    if valid is not None:
        loss = loss * valid
        denom = avg_factor if avg_factor is not None else jnp.maximum(
            jnp.sum(valid), 1.0)
    else:
        denom = avg_factor if avg_factor is not None else loss.size
    return jnp.sum(loss) / denom


def binary_ce_loss(logits, targets, valid=None):
    """Sigmoid BCE mean (mmdet CrossEntropyLoss(use_sigmoid=True))."""
    loss = sigmoid_ce_with_logits(logits, targets)
    if valid is not None:
        loss = loss * valid
        return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.mean(loss)


def softmax_ce_loss(logits, labels, valid=None):
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if valid is not None:
        loss = loss * valid
        return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.mean(loss)


def l1_loss(pred, target, valid=None, avg_factor=None):
    loss = jnp.sum(jnp.abs(pred - target), axis=-1)
    if valid is not None:
        loss = loss * valid
        denom = avg_factor if avg_factor is not None else jnp.maximum(
            jnp.sum(valid), 1.0)
        return jnp.sum(loss) / denom
    return jnp.mean(loss)


def giou_loss(pred, target, valid=None, avg_factor=None):
    """1 - GIoU over aligned xyxy box pairs (mmdet GIoULoss)."""
    g = iou_mod.iou2d(pred, target, mode="giou", aligned=True)
    loss = 1.0 - g
    if valid is not None:
        loss = loss * valid
        denom = avg_factor if avg_factor is not None else jnp.maximum(
            jnp.sum(valid), 1.0)
        return jnp.sum(loss) / denom
    return jnp.mean(loss)


# ---------------------------------------------------------------------------
# Match costs (DETR-style, used by FusionHungarianMatching)
# ---------------------------------------------------------------------------

def focal_loss_cost(logits, labels, weight=1.0, alpha=0.25, gamma=2.0,
                    eps=1e-12):
    """mmdet FocalLossCost: (N, C) logits × (M,) labels → (N, M)."""
    p = jax.nn.sigmoid(logits)
    neg = -jnp.log(1 - p + eps) * (1 - alpha) * p ** gamma
    pos = -jnp.log(p + eps) * alpha * (1 - p) ** gamma
    cost = pos[:, labels] - neg[:, labels]
    return cost * weight


def double_sided_focal_cost(logits1, logits2, weight=1.0, alpha=0.25,
                            gamma=2.0):
    """Symmetric focal cost (``modified_match_cost.py:9-33``):
    (FL(p1, argmax p2) + FL(p2, argmax p1)^T) / 2 → (N1, N2)."""
    lbl1 = jnp.argmax(jax.nn.sigmoid(logits1), axis=1)
    lbl2 = jnp.argmax(jax.nn.sigmoid(logits2), axis=1)
    c12 = focal_loss_cost(logits1, lbl2, weight=weight, alpha=alpha,
                          gamma=gamma)
    c21 = focal_loss_cost(logits2, lbl1, weight=weight, alpha=alpha,
                          gamma=gamma)
    return (c12 + c21.T) / 2.0


def bbox_l1_cost(pred_cxcywh_norm, gt_xyxy_norm, weight=1.0):
    """mmdet BBoxL1Cost (box_format='xyxy'): pred normalized cxcywh is
    converted to xyxy, cdist-1 against normalized gt xyxy → (N, M)."""
    from .coders import cxcywh_to_xyxy
    pred = cxcywh_to_xyxy(pred_cxcywh_norm)
    cost = jnp.sum(jnp.abs(pred[:, None, :] - gt_xyxy_norm[None, :, :]),
                   axis=-1)
    return cost * weight


def giou_cost(pred_xyxy, gt_xyxy, weight=1.0):
    """mmdet IoUCost(iou_mode='giou'): -GIoU → (N, M)."""
    return -iou_mod.iou2d(pred_xyxy, gt_xyxy, mode="giou") * weight
