"""RPN head + 2D anchors + MaxIoU assignment + random sampling.

Mirrors the external-mmdet components the reference configures
(``split_0.py:59-73`` RPNHead; train/test cfgs ``:440-461, 506-512``):
anchor scales [8], ratios [0.5, 1, 2], strides [4..64]; sigmoid-BCE cls +
L1 reg on a 256-anchor random sample (pos fraction 0.5, MaxIoU 0.7/0.3,
match_low_quality); proposals = per-level topk → decode → level-wise NMS
(iou 0.7) → top max_per_img.

Static-shape notes: anchors are dense per padded canvas; sampling is
masked random ranking; per-level topk uses static ks; proposal count is a
fixed buffer with NEG_INF score padding.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...core import iou as iou_mod, losses, nms as nms_mod
from ...core.coders import DeltaXYWHCoder


def base_anchors(stride, scales=(8,), ratios=(0.5, 1.0, 2.0)):
    """mmdet AnchorGenerator base anchors (center_offset 0)."""
    out = []
    for r in ratios:
        for s in scales:
            h = stride * s * np.sqrt(r)
            w = stride * s * np.sqrt(1.0 / r)
            out.append([-w / 2, -h / 2, w / 2, h / 2])
    return np.asarray(out, np.float32)  # (A0, 4)


def grid_anchors(feat_h, feat_w, stride, scales=(8,),
                 ratios=(0.5, 1.0, 2.0)):
    """(feat_h * feat_w * A0, 4) anchors for one level."""
    base = base_anchors(stride, scales, ratios)  # (A0, 4)
    xs = np.arange(feat_w, dtype=np.float32) * stride
    ys = np.arange(feat_h, dtype=np.float32) * stride
    shift = np.stack(np.meshgrid(xs, ys), axis=-1)  # (H, W, 2) [x, y]
    shift = np.concatenate([shift, shift], axis=-1)  # (H, W, 4)
    anchors = shift[:, :, None, :] + base[None, None, :, :]
    return anchors.reshape(-1, 4)


def max_iou_assign(anchors_or_props, valid, gt_boxes, gt_valid,
                   pos_thr, neg_thr, min_pos_iou, match_low_quality):
    """mmdet MaxIoUAssigner, vectorized.

    Returns:
        assigned: (N,) int32: -1 ignore / 0 bg / 1-based gt index.
    """
    ious = iou_mod.iou2d(anchors_or_props, gt_boxes)  # (N, G)
    # snap to a 2^-20 grid: the ==max force-match and argmax tie-breaks
    # below must be invariant to ulp-level compilation noise (see
    # core.iou.quantize) or data-parallel == single-device breaks
    ious = iou_mod.quantize(ious)
    ious = jnp.where(gt_valid[None, :], ious, -1.0)
    ious = jnp.where(valid[:, None], ious, -1.0)
    max_iou = jnp.max(ious, axis=1)
    argmax = jnp.argmax(ious, axis=1)

    assigned = jnp.full(max_iou.shape, -1, jnp.int32)
    assigned = jnp.where((max_iou >= 0) & (max_iou < neg_thr), 0, assigned)
    assigned = jnp.where(max_iou >= pos_thr,
                         argmax.astype(jnp.int32) + 1, assigned)
    if match_low_quality:
        gt_max = jnp.max(ious, axis=0)  # (G,)
        # anchor achieving a gt's max iou (>= min_pos_iou) is forced to it
        force = (ious == gt_max[None, :]) & (gt_max[None, :] >=
                                             min_pos_iou) & gt_valid[None, :]
        force_gt = jnp.argmax(force, axis=1).astype(jnp.int32)
        has_force = jnp.any(force, axis=1)
        assigned = jnp.where(has_force, force_gt + 1, assigned)
    return jnp.where(valid, assigned, -1), max_iou, argmax


def random_sample(rng_key, assigned, num, pos_fraction):
    """mmdet RandomSampler (without replacement).

    Returns (idx (num,), is_pos (num,), slot_valid (num,)).
    """
    pos_mask = assigned > 0
    neg_mask = assigned == 0
    n_pos = jnp.sum(pos_mask.astype(jnp.int32))
    n_neg = jnp.sum(neg_mask.astype(jnp.int32))
    k1, k2 = jax.random.split(rng_key)
    n = assigned.shape[0]
    pos_cap = int(num * pos_fraction)

    r1 = jax.random.uniform(k1, (n,))
    pos_order = jnp.argsort(jnp.where(pos_mask, r1, 2.0))
    r2 = jax.random.uniform(k2, (n,))
    neg_order = jnp.argsort(jnp.where(neg_mask, r2, 2.0))

    pos_take = jnp.minimum(pos_cap, n_pos)
    neg_take = jnp.minimum(num - pos_take, n_neg)
    slots = jnp.arange(num)
    is_pos = slots < pos_take
    idx = jnp.where(is_pos, pos_order[slots],
                    neg_order[jnp.clip(slots - pos_take, 0, n - 1)])
    slot_valid = slots < (pos_take + neg_take)
    return idx.astype(jnp.int32), is_pos & slot_valid, slot_valid


class RPNHead(nn.Module):
    feat_channels: int = 256
    num_base_anchors: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, feats):
        """feats: tuple of (B, H, W, C) → per-level (cls (B,H,W,A),
        reg (B,H,W,A*4))."""
        conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="rpn_conv")
        cls_conv = nn.Conv(
            self.num_base_anchors, (1, 1),
            bias_init=nn.initializers.constant(
                -float(np.log((1 - 0.01) / 0.01))),
            name="rpn_cls")
        reg_conv = nn.Conv(self.num_base_anchors * 4, (1, 1),
                           name="rpn_reg")
        outs = []
        for f in feats:
            x = nn.relu(conv(f))
            # head logits in f32 (losses / box decode)
            outs.append((cls_conv(x.astype(jnp.float32)),
                         reg_conv(x.astype(jnp.float32))))
        return outs


def rpn_proposals(rpn_outs, anchors_per_level, img_shape, nms_pre,
                  max_per_img, iou_thr=0.7):
    """Generate proposals for ONE image (vmap over batch outside).

    Args:
        rpn_outs: per-level (cls (H,W,A), reg (H,W,A*4)).
        anchors_per_level: per-level (N_l, 4) jnp arrays.
        img_shape: (h, w) for clipping.
    Returns:
        (proposals (max_per_img, 4), scores (max_per_img,) with NEG_INF
         padding).
    """
    coder = DeltaXYWHCoder()
    all_boxes, all_scores, all_ids = [], [], []
    for lvl, ((cls, reg), anchors) in enumerate(
            zip(rpn_outs, anchors_per_level)):
        scores = jax.nn.sigmoid(cls.reshape(-1))
        deltas = reg.reshape(-1, 4)
        k = min(nms_pre, scores.shape[0])
        top_s, top_i = jax.lax.top_k(scores, k)
        boxes = coder.decode(anchors[top_i], deltas[top_i],
                             max_shape=img_shape)
        all_boxes.append(boxes)
        all_scores.append(top_s)
        all_ids.append(jnp.full((k,), lvl, jnp.int32))
    boxes = jnp.concatenate(all_boxes, axis=0)
    scores = jnp.concatenate(all_scores, axis=0)
    ids = jnp.concatenate(all_ids, axis=0)
    idx, valid = nms_mod.batched_nms_2d(
        boxes, jnp.where(scores > 0, scores, nms_mod.NEG_INF), ids,
        iou_thr, max_per_img)
    props = jnp.where(valid[:, None], boxes[idx], 0.0)
    pscores = jnp.where(valid, scores[idx], nms_mod.NEG_INF)
    return props, pscores


def rpn_loss(rng_key, rpn_outs, anchors_per_level, gt_boxes, gt_valid,
             num_samples=256, pos_fraction=0.5):
    """RPN training loss for a batch.

    Args:
        rpn_outs: per-level (cls (B,H,W,A), reg (B,H,W,A*4)).
        gt_boxes: (B, G, 4); gt_valid: (B, G).
    """
    coder = DeltaXYWHCoder()
    cls_flat = jnp.concatenate(
        [c.reshape(c.shape[0], -1) for c, _ in rpn_outs], axis=1)
    reg_flat = jnp.concatenate(
        [r.reshape(r.shape[0], -1, 4) for _, r in rpn_outs], axis=1)
    anchors = jnp.concatenate(anchors_per_level, axis=0)  # (N, 4)

    def single(key, cls, reg, gb, gv):
        valid = jnp.ones(anchors.shape[0], bool)
        assigned, _, _ = max_iou_assign(
            anchors, valid, gb, gv, pos_thr=0.7, neg_thr=0.3,
            min_pos_iou=0.3, match_low_quality=True)
        idx, is_pos, slot_valid = random_sample(
            key, assigned, num_samples, pos_fraction)
        n_total = jnp.maximum(jnp.sum(slot_valid.astype(jnp.float32)), 1.0)
        s_cls = cls[idx]
        cls_t = is_pos.astype(jnp.float32)
        cls_l = losses.sigmoid_ce_with_logits(s_cls, cls_t)
        cls_loss = jnp.sum(cls_l * slot_valid) / n_total
        gt_idx = jnp.clip(assigned[idx] - 1, 0, gb.shape[0] - 1)
        reg_t = coder.encode(anchors[idx], gb[gt_idx])
        reg_l = jnp.sum(jnp.abs(reg[idx] - reg_t), axis=-1)
        reg_loss = jnp.sum(reg_l * is_pos) / n_total
        return cls_loss, reg_loss

    keys = jax.random.split(rng_key, cls_flat.shape[0])
    cls_loss, reg_loss = jax.vmap(single)(
        keys, cls_flat, reg_flat, gt_boxes, gt_valid)
    return dict(loss_rpn_cls=jnp.mean(cls_loss),
                loss_rpn_bbox=jnp.mean(reg_loss))
