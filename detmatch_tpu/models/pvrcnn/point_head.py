"""PointHeadSimple: keypoint foreground-score head (reference
``pcdet/models/dense_heads/point_head_simple.py:7-91`` +
``point_head_template.py`` target assignment).

Class-agnostic: target 1 for keypoints inside a gt box, -1 (ignore) for
keypoints inside the 0.2m-enlarged box but outside the box, 0 otherwise.
Loss: sigmoid focal, normalized by positive count. The predicted sigmoid
scores later scale point features in the RoI-grid pool
(``pvrcnn_head.py:91``).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...core import geometry, losses
from ..layers import MLP


class PointHeadSimple(nn.Module):
    cls_fc: Tuple[int, ...] = (256, 256)
    extra_width: Tuple[float, float, float] = (0.2, 0.2, 0.2)
    use_running_average: bool = False

    @nn.compact
    def __call__(self, point_features, kp_valid, train: bool = False):
        """point_features: (B, M, C) (before-fusion features per config
        USE_POINT_FEATURES_BEFORE_FUSION=True) → logits (B, M, 1)."""
        x = MLP(self.cls_fc, name="cls_mlp", eps=1e-5,
                use_running_average=self.use_running_average)(
            point_features, mask=kp_valid, use_running_average=not train)
        logits = nn.Dense(1, name="cls_out")(x)
        return logits

    def targets(self, keypoints, kp_valid, gt_boxes):
        """Point-in-box targets (vmapped over batch).

        Args:
            keypoints: (B, M, 3); gt_boxes: (B, G, 8) zero-padded.
        Returns:
            (B, M) float targets: 1 fg / 0 bg / -1 ignore.
        """
        def single(kp, kpv, gb):
            valid_gt = gb[:, 7] > 0
            in_box = geometry.points_in_boxes(kp, gb[:, :7])  # (G, M)
            in_box = in_box & valid_gt[:, None]
            enlarged = geometry.enlarge_boxes(gb[:, :7],
                                              jnp.asarray(self.extra_width))
            in_ext = geometry.points_in_boxes(kp, enlarged) & valid_gt[:, None]
            fg = jnp.any(in_box, axis=0)
            ign = jnp.any(in_ext, axis=0) & ~fg
            t = jnp.where(fg, 1.0, jnp.where(ign, -1.0, 0.0))
            return jnp.where(kpv, t, -1.0)

        return jax.vmap(single)(keypoints, kp_valid, gt_boxes)

    @staticmethod
    def loss_terms(logits, targets):
        """Per-sample (numerator, positive-count) pairs; any group's loss
        is sum(numer)/max(sum(pos), 1) — exactly the batch-global
        normalization of :meth:`loss` restricted to that group."""
        positives = targets > 0
        cared = targets >= 0
        onehot = positives.astype(jnp.float32)[..., None]
        raw = losses.sigmoid_focal_loss(logits, onehot,
                                        cared.astype(jnp.float32))
        return (jnp.sum(raw, axis=(1, 2)),
                jnp.sum(positives.astype(jnp.float32), axis=1))

    @staticmethod
    def loss(logits, targets, weight=1.0):
        """Reference ``point_head_template.get_cls_layer_loss``."""
        numer, pos = PointHeadSimple.loss_terms(logits, targets)
        return jnp.sum(numer) / jnp.maximum(jnp.sum(pos), 1.0) * weight
