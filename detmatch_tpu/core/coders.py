"""Box encode/decode transforms.

ResidualCoder mirrors reference ``pcdet/utils/box_coder_utils.py:5-79``
(7-dof residuals over anchors, log-dims, optional sin/cos heading).
DeltaXYWHCoder mirrors the external mmdet ``DeltaXYWHBBoxCoder`` used by the
Faster R-CNN branch (configured at
``configs/detmatch/001/detmatch/split_0.py:68-71, 88-92``).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class ResidualCoder:
    """7-dof anchor-residual coder (code_size 7, +1 if sincos heading)."""

    def __init__(self, code_size=7, encode_angle_by_sincos=False):
        self.code_size = code_size + (1 if encode_angle_by_sincos else 0)
        self.encode_angle_by_sincos = encode_angle_by_sincos

    def encode(self, boxes, anchors):
        """boxes, anchors: (..., 7+C) → (..., code_size+C)."""
        dxa = jnp.maximum(anchors[..., 3], 1e-5)
        dya = jnp.maximum(anchors[..., 4], 1e-5)
        dza = jnp.maximum(anchors[..., 5], 1e-5)
        dxg = jnp.maximum(boxes[..., 3], 1e-5)
        dyg = jnp.maximum(boxes[..., 4], 1e-5)
        dzg = jnp.maximum(boxes[..., 5], 1e-5)
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        xt = (boxes[..., 0] - anchors[..., 0]) / diag
        yt = (boxes[..., 1] - anchors[..., 1]) / diag
        zt = (boxes[..., 2] - anchors[..., 2]) / dza
        dxt = jnp.log(dxg / dxa)
        dyt = jnp.log(dyg / dya)
        dzt = jnp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            rts = [
                jnp.cos(boxes[..., 6]) - jnp.cos(anchors[..., 6]),
                jnp.sin(boxes[..., 6]) - jnp.sin(anchors[..., 6]),
            ]
        else:
            rts = [boxes[..., 6] - anchors[..., 6]]
        out = [xt, yt, zt, dxt, dyt, dzt, *rts]
        out = jnp.stack(out, axis=-1)
        if boxes.shape[-1] > 7:
            out = jnp.concatenate(
                [out, boxes[..., 7:] - anchors[..., 7:]], axis=-1
            )
        return out

    def decode(self, encodings, anchors):
        """encodings: (..., code_size+C), anchors: (..., 7+C) → (..., 7+C)."""
        diag = jnp.sqrt(anchors[..., 3] ** 2 + anchors[..., 4] ** 2)
        xg = encodings[..., 0] * diag + anchors[..., 0]
        yg = encodings[..., 1] * diag + anchors[..., 1]
        zg = encodings[..., 2] * anchors[..., 5] + anchors[..., 2]
        dxg = jnp.exp(encodings[..., 3]) * anchors[..., 3]
        dyg = jnp.exp(encodings[..., 4]) * anchors[..., 4]
        dzg = jnp.exp(encodings[..., 5]) * anchors[..., 5]
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(
                encodings[..., 7] + jnp.sin(anchors[..., 6]),
                encodings[..., 6] + jnp.cos(anchors[..., 6]),
            )
            extra_from = 8
        else:
            rg = encodings[..., 6] + anchors[..., 6]
            extra_from = 7
        out = jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg], axis=-1)
        if anchors.shape[-1] > 7:
            out = jnp.concatenate(
                [out, encodings[..., extra_from:] + anchors[..., 7:]],
                axis=-1,
            )
        return out


class PointResidualCoder:
    """Point-anchored 8-code coder (reference
    ``pcdet/utils/box_coder_utils.py:144-230``): offsets normalized by
    per-class mean sizes, log-dims, cos/sin heading. Used by PointHeadBox
    (PointRCNN)."""

    def __init__(self, mean_size=((3.9, 1.6, 1.56), (0.8, 0.6, 1.73),
                                  (1.76, 0.6, 1.73)), use_mean_size=True):
        self.code_size = 8
        self.use_mean_size = use_mean_size
        self.mean_size = np.asarray(mean_size, np.float32)

    def _anchor_dims(self, classes):
        """classes: (...,) int 1-based → (..., 3) mean sizes."""
        ms = jnp.asarray(self.mean_size)
        return ms[jnp.clip(classes - 1, 0, ms.shape[0] - 1)]

    def encode(self, gt_boxes, points, gt_classes=None):
        """gt_boxes (..., 7), points (..., 3) → (..., 8)."""
        dims = jnp.maximum(gt_boxes[..., 3:6], 1e-5)
        if self.use_mean_size:
            a = self._anchor_dims(gt_classes)
        else:
            a = jnp.ones_like(dims)
        diag = jnp.sqrt(a[..., 0] ** 2 + a[..., 1] ** 2)
        xt = (gt_boxes[..., 0] - points[..., 0]) / diag
        yt = (gt_boxes[..., 1] - points[..., 1]) / diag
        zt = (gt_boxes[..., 2] - points[..., 2]) / a[..., 2]
        dxt = jnp.log(dims[..., 0] / a[..., 0])
        dyt = jnp.log(dims[..., 1] / a[..., 1])
        dzt = jnp.log(dims[..., 2] / a[..., 2])
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt,
                          jnp.cos(gt_boxes[..., 6]),
                          jnp.sin(gt_boxes[..., 6])], axis=-1)

    def decode(self, encodings, points, pred_classes=None):
        """encodings (..., 8), points (..., 3) → (..., 7)."""
        if self.use_mean_size:
            a = self._anchor_dims(pred_classes)
        else:
            a = jnp.ones(encodings.shape[:-1] + (3,), encodings.dtype)
        diag = jnp.sqrt(a[..., 0] ** 2 + a[..., 1] ** 2)
        xg = encodings[..., 0] * diag + points[..., 0]
        yg = encodings[..., 1] * diag + points[..., 1]
        zg = encodings[..., 2] * a[..., 2] + points[..., 2]
        dims = jnp.exp(encodings[..., 3:6]) * a
        rg = jnp.arctan2(encodings[..., 7], encodings[..., 6])
        return jnp.concatenate(
            [jnp.stack([xg, yg, zg], -1), dims, rg[..., None]], axis=-1)


class DeltaXYWHCoder:
    """mmdet-style 2D delta coder (xyxy boxes ↔ (dx, dy, dw, dh) deltas)."""

    def __init__(self, target_means=(0., 0., 0., 0.),
                 target_stds=(1., 1., 1., 1.), wh_ratio_clip=16 / 1000):
        self.means = np.asarray(target_means, np.float32)
        self.stds = np.asarray(target_stds, np.float32)
        self.wh_ratio_clip = wh_ratio_clip

    def encode(self, proposals, gt):
        """proposals, gt: (..., 4) xyxy → (..., 4) deltas."""
        px = (proposals[..., 0] + proposals[..., 2]) * 0.5
        py = (proposals[..., 1] + proposals[..., 3]) * 0.5
        pw = proposals[..., 2] - proposals[..., 0]
        ph = proposals[..., 3] - proposals[..., 1]
        gx = (gt[..., 0] + gt[..., 2]) * 0.5
        gy = (gt[..., 1] + gt[..., 3]) * 0.5
        gw = gt[..., 2] - gt[..., 0]
        gh = gt[..., 3] - gt[..., 1]
        pw = jnp.maximum(pw, 1e-6)
        ph = jnp.maximum(ph, 1e-6)
        dx = (gx - px) / pw
        dy = (gy - py) / ph
        dw = jnp.log(jnp.maximum(gw, 1e-6) / pw)
        dh = jnp.log(jnp.maximum(gh, 1e-6) / ph)
        deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
        return (deltas - self.means) / self.stds

    def decode(self, proposals, deltas, max_shape=None):
        """proposals (..., 4) xyxy + deltas (..., 4) → (..., 4) xyxy."""
        deltas = deltas * self.stds + self.means
        max_ratio = abs(float(np.log(self.wh_ratio_clip)))
        dx, dy = deltas[..., 0], deltas[..., 1]
        dw = jnp.clip(deltas[..., 2], -max_ratio, max_ratio)
        dh = jnp.clip(deltas[..., 3], -max_ratio, max_ratio)
        px = (proposals[..., 0] + proposals[..., 2]) * 0.5
        py = (proposals[..., 1] + proposals[..., 3]) * 0.5
        pw = proposals[..., 2] - proposals[..., 0]
        ph = proposals[..., 3] - proposals[..., 1]
        gx = px + pw * dx
        gy = py + ph * dy
        gw = pw * jnp.exp(dw)
        gh = ph * jnp.exp(dh)
        x1, y1 = gx - gw * 0.5, gy - gh * 0.5
        x2, y2 = gx + gw * 0.5, gy + gh * 0.5
        out = jnp.stack([x1, y1, x2, y2], axis=-1)
        if max_shape is not None:
            h, w = max_shape[0], max_shape[1]
            lim = jnp.asarray([w, h, w, h], out.dtype)
            out = jnp.clip(out, 0, lim)
        return out


def xyxy_to_cxcywh(boxes):
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return jnp.stack([cx, cy, w, h], axis=-1)


def cxcywh_to_xyxy(boxes):
    cx, cy, w, h = (boxes[..., 0], boxes[..., 1], boxes[..., 2],
                    boxes[..., 3])
    return jnp.stack(
        [cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1
    )
