"""AnchorHeadSingle + AxisAlignedTargetAssigner, vectorized static-shape.

Mirrors reference ``anchor_head_single.py``, ``anchor_head_template.py`` and
``axis_aligned_target_assigner.py`` semantics:

* dense per-class anchor grids over the stride-8 BEV map (sizes/rotations/
  bottom-heights from config; non-aligned centers span the full range with
  stride range/(n-1), ``anchor_generator.py:27-36``);
* 1×1 convs for cls/box/dir predictions;
* target assignment per class by nearest-BEV (axis-aligned) IoU with
  matched/unmatched thresholds, force-matching each gt's best anchor;
* losses: sigmoid focal cls (norm by #pos), smooth-L1 with sin-difference
  heading + code weights, direction-bin CE (offset 0.78539, 2 bins);
* ``generate_predicted_boxes`` decodes all anchors and applies the
  direction classifier snap.

The reference loops over batch and classes with dynamic gt counts
(``axis_aligned_target_assigner.py:50-130``); here assignment is one
vmapped, masked computation over the padded (B, M, 8) gt tensor — no host
sync, no data-dependent shapes.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...core import geometry, iou as iou_mod, losses
from ...core.coders import ResidualCoder


def generate_anchors(point_cloud_range, grid_size, anchor_configs):
    """Dense anchors, one set per class.

    Returns:
        anchors: (num_classes, H, W, num_rot, 7) numpy — H=y, W=x, matching
            the NHWC BEV feature layout (z-major removed; one size & one
            bottom-height per class as in the DetMatch config).
    """
    pcr = np.asarray(point_cloud_range, np.float32)
    all_anchors = []
    for cfg in anchor_configs:
        stride = cfg.get("feature_map_stride", 8)
        nx = int(grid_size[0] // stride)
        ny = int(grid_size[1] // stride)
        assert not cfg.get("align_center", False)
        x_stride = (pcr[3] - pcr[0]) / (nx - 1)
        y_stride = (pcr[4] - pcr[1]) / (ny - 1)
        xs = pcr[0] + np.arange(nx, dtype=np.float32) * x_stride
        ys = pcr[1] + np.arange(ny, dtype=np.float32) * y_stride
        (size,) = cfg["anchor_sizes"]
        (zbot,) = cfg["anchor_bottom_heights"]
        rots = cfg["anchor_rotations"]
        # (H=y, W=x, R, 7)
        a = np.zeros((ny, nx, len(rots), 7), np.float32)
        a[..., 0] = xs[None, :, None]
        a[..., 1] = ys[:, None, None]
        a[..., 2] = zbot + size[2] / 2.0  # shift to box center
        a[..., 3:6] = np.asarray(size, np.float32)
        a[..., 6] = np.asarray(rots, np.float32)[None, None, :]
        all_anchors.append(a)
    return np.stack(all_anchors, axis=0)  # (C, H, W, R, 7)


def flatten_anchors(anchors):
    """(C, H, W, R, 7) → (H*W*C*R, 7) matching the head's channel layout
    (reference concatenates per-class grids along the size axis:
    ``anchor_head_template.py:177-183``, giving (H, W, C, R) order)."""
    c, h, w, r, _ = anchors.shape
    return anchors.transpose(1, 2, 0, 3, 4).reshape(h * w * c * r, 7)


def flat_anchors_traced(point_cloud_range, grid_size, anchor_configs):
    """Traced (iota/broadcast) version of generate_anchors+flatten.

    Anchor grids are pure functions of static config; building them with
    numpy at trace time embeds them as multi-MB dense literals in the XLA
    program (the (A, 7) grid alone is ~12 MB, and it appears once per
    fwd/bwd instance). Building them from jnp.arange keeps the program a
    handful of ops; XLA folds them at compile time anyway.
    """
    pcr = np.asarray(point_cloud_range, np.float32)
    strides = {cfg.get("feature_map_stride", 8) for cfg in anchor_configs}
    assert len(strides) == 1, "traced anchors assume a uniform stride"
    stride = strides.pop()
    nx = int(grid_size[0] // stride)
    ny = int(grid_size[1] // stride)
    c = len(anchor_configs)
    rots = anchor_configs[0]["anchor_rotations"]
    assert all(tuple(cfg["anchor_rotations"]) == tuple(rots)
               for cfg in anchor_configs)
    r = len(rots)
    xs = pcr[0] + jnp.arange(nx, dtype=jnp.float32) * (
        (pcr[3] - pcr[0]) / (nx - 1))
    ys = pcr[1] + jnp.arange(ny, dtype=jnp.float32) * (
        (pcr[4] - pcr[1]) / (ny - 1))
    sizes = np.asarray([cfg["anchor_sizes"][0] for cfg in anchor_configs],
                       np.float32)  # (C, 3)
    zc = np.asarray([cfg["anchor_bottom_heights"][0] + s[2] / 2.0
                     for cfg, s in zip(anchor_configs, sizes)], np.float32)
    shp = (ny, nx, c, r)
    cols = [
        jnp.broadcast_to(xs[None, :, None, None], shp),
        jnp.broadcast_to(ys[:, None, None, None], shp),
        jnp.broadcast_to(jnp.asarray(zc)[None, None, :, None], shp),
        jnp.broadcast_to(jnp.asarray(sizes[:, 0])[None, None, :, None], shp),
        jnp.broadcast_to(jnp.asarray(sizes[:, 1])[None, None, :, None], shp),
        jnp.broadcast_to(jnp.asarray(sizes[:, 2])[None, None, :, None], shp),
        jnp.broadcast_to(jnp.asarray(np.asarray(rots, np.float32))
                         [None, None, None, :], shp),
    ]
    return jnp.stack(cols, axis=-1).reshape(ny * nx * c * r, 7)


def assign_targets(anchors_flat, per_anchor_class, gt_boxes, match_thr,
                   unmatch_thr, coder: ResidualCoder):
    """Vectorized axis-aligned target assignment for one sample.

    Args:
        anchors_flat: (A, 7).
        per_anchor_class: (A,) int32 — 0-based class id of each anchor.
        gt_boxes: (M, 8) padded with zero rows; last col = 1-based class.
        match_thr / unmatch_thr: (A,) per-anchor thresholds.
    Returns:
        (fg (A,) bool, neg (A,) bool, a2g_arg (A,) int32) — the caller
        gathers the assigned gt rows (fenced, batch-flattened) and builds
        labels/targets.
    """
    gt_cls = gt_boxes[:, 7].astype(jnp.int32)
    gt_valid = gt_cls > 0
    ious = iou_mod.nearest_bev_iou(anchors_flat, gt_boxes[:, :7])  # (A, M)
    # snap to a 2^-20 grid so the ==max force-match / argmax tie-breaks
    # are invariant to ulp-level compilation noise (core.iou.quantize)
    ious = iou_mod.quantize(ious)
    # class-restricted: anchor of class c only sees gts of class c
    same = (per_anchor_class[:, None] + 1) == gt_cls[None, :]
    ious = jnp.where(same & gt_valid[None, :], ious, -1.0)

    a2g_max = jnp.max(ious, axis=1)
    a2g_arg = jnp.argmax(ious, axis=1)
    # force-match: anchors achieving each gt's max IoU (> 0)
    g2a_max = jnp.max(ious, axis=0)  # (M,)
    forced = jnp.any(
        (ious == g2a_max[None, :]) & (g2a_max[None, :] > 0)
        & gt_valid[None, :], axis=1)

    pos = a2g_max >= match_thr
    neg = (a2g_max < unmatch_thr) & ~forced
    fg = pos | forced
    # the (A,)-row gathers of assigned gt boxes happen OUTSIDE (fenced,
    # batch-flattened): an in-graph gather here lowers to a serial
    # per-anchor dynamic-slice loop on TPU (~2 s for 1.7M anchors)
    return fg, neg, a2g_arg


class AnchorHeadSingle(nn.Module):
    num_classes: int = 3
    num_rot: int = 2
    num_dir_bins: int = 2
    dir_offset: float = 0.78539
    dir_limit_offset: float = 0.0
    point_cloud_range: Tuple[float, ...] = (0, -40, -3, 70.4, 40, 1)
    grid_size: Tuple[int, int, int] = (1408, 1600, 40)
    anchor_configs: Tuple[Dict[str, Any], ...] = ()
    loss_weights: Dict[str, Any] = None

    def setup(self):
        anchors = generate_anchors(self.point_cloud_range, self.grid_size,
                                   list(self.anchor_configs))
        c, h, w, r, _ = anchors.shape
        self._num_anchors = c * h * w * r
        self._num_rot_cfg = r
        self.coder = ResidualCoder()
        na = c * r  # anchors per location
        self.conv_cls = nn.Conv(
            na * self.num_classes, (1, 1),
            bias_init=nn.initializers.constant(-np.log((1 - 0.01) / 0.01)),
            name="conv_cls")
        self.conv_box = nn.Conv(
            na * self.coder.code_size, (1, 1),
            kernel_init=nn.initializers.normal(0.001), name="conv_box")
        self.conv_dir = nn.Conv(na * self.num_dir_bins, (1, 1),
                                name="conv_dir")

    def __call__(self, bev_features):
        """bev_features: (B, H, W, C) → dict of flat per-anchor preds."""
        b = bev_features.shape[0]
        cls = self.conv_cls(bev_features).reshape(b, -1, self.num_classes)
        box = self.conv_box(bev_features).reshape(b, -1,
                                                  self.coder.code_size)
        dirp = self.conv_dir(bev_features).reshape(b, -1, self.num_dir_bins)
        return dict(cls_preds=cls, box_preds=box, dir_preds=dirp)

    def _anchors(self):
        """(A, 7) anchors built in-trace (never a baked dense literal)."""
        return flat_anchors_traced(self.point_cloud_range, self.grid_size,
                                   list(self.anchor_configs))

    def targets(self, gt_boxes):
        """gt_boxes: (B, M, 8) → per-anchor targets (vmapped assigner)."""
        anchors = self._anchors()
        # flat (H, W, C, R) order → class id = (a // R) % C
        pac = (jnp.arange(self._num_anchors, dtype=jnp.int32)
               // self._num_rot_cfg) % len(self.anchor_configs)
        mt = jnp.asarray(np.array(
            [cfg["matched_threshold"] for cfg in self.anchor_configs],
            np.float32))[pac]
        ut = jnp.asarray(np.array(
            [cfg["unmatched_threshold"] for cfg in self.anchor_configs],
            np.float32))[pac]
        fg, neg, a2g = jax.vmap(
            lambda gb: assign_targets(anchors, pac, gb, mt, ut, self.coder)
        )(gt_boxes)
        from ...ops.pointnet import gather_rows
        assigned = gather_rows(gt_boxes, a2g)  # (B, A, 8), fenced
        gt_cls = assigned[..., 7].astype(jnp.int32)
        labels = jnp.where(fg, gt_cls, jnp.where(neg, 0, -1))
        tgt = self.coder.encode(assigned[..., :7], anchors[None])
        reg_targets = jnp.where(fg[..., None], tgt, 0.0)
        return labels, reg_targets, fg.astype(jnp.float32)

    def loss_per_sample(self, preds, targets):
        """Per-sample loss components (each (B,)): the reference's
        ``get_loss`` equals ``mean_over_batch`` of these. Exposed so the
        SSL concat-batch step can regroup labeled/unlabeled sub-batches
        exactly as if they ran in separate passes."""
        labels, reg_targets, reg_weights = targets
        lw = self.loss_weights or dict(cls_weight=1.0, loc_weight=2.0,
                                       dir_weight=0.2,
                                       code_weights=[1.0] * 7)
        cared = labels >= 0
        positives = labels > 0
        pos_norm = jnp.maximum(
            jnp.sum(positives, axis=1, keepdims=True).astype(jnp.float32),
            1.0)
        cls_w = (cared.astype(jnp.float32)) / pos_norm
        onehot = jax.nn.one_hot(
            jnp.where(cared, labels, 0), self.num_classes + 1
        )[..., 1:]
        cls_loss = jnp.sum(losses.sigmoid_focal_loss(
            preds["cls_preds"], onehot, cls_w),
            axis=(1, 2)) * lw["cls_weight"]

        reg_w = positives.astype(jnp.float32) / pos_norm
        bp, rt = preds["box_preds"], reg_targets
        sin_p = jnp.sin(bp[..., 6:7]) * jnp.cos(rt[..., 6:7])
        sin_t = jnp.cos(bp[..., 6:7]) * jnp.sin(rt[..., 6:7])
        bp_sin = jnp.concatenate([bp[..., :6], sin_p], axis=-1)
        rt_sin = jnp.concatenate([rt[..., :6], sin_t], axis=-1)
        loc_loss = jnp.sum(losses.weighted_smooth_l1(
            bp_sin, rt_sin, weights=reg_w,
            code_weights=lw["code_weights"]),
            axis=(1, 2)) * lw["loc_weight"]

        anchors = self._anchors()
        rot_gt = reg_targets[..., 6] + anchors[None, :, 6]
        offset_rot = geometry.limit_period(
            rot_gt - self.dir_offset, 0, 2 * np.pi)
        dir_t = jnp.clip(
            jnp.floor(offset_rot / (2 * np.pi / self.num_dir_bins)),
            0, self.num_dir_bins - 1).astype(jnp.int32)
        dir_onehot = jax.nn.one_hot(dir_t, self.num_dir_bins)
        dir_loss = jnp.sum(losses.weighted_cross_entropy(
            preds["dir_preds"], dir_onehot, reg_w),
            axis=1) * lw["dir_weight"]  # CE is already class-reduced
        return dict(rpn_loss_cls=cls_loss, rpn_loss_loc=loc_loss,
                    rpn_loss_dir=dir_loss)

    def loss(self, preds, targets):
        """Reference get_loss (``anchor_head_template.py:102-215``) —
        batch mean of the per-sample components."""
        per = self.loss_per_sample(preds, targets)
        return {k: jnp.mean(v) for k, v in per.items()}

    def decode_boxes(self, preds):
        """generate_predicted_boxes: decode all anchors + dir snap.

        Returns (batch_box_preds (B, A, 7), batch_cls_preds (B, A, C))."""
        anchors = self._anchors()[None]
        boxes = self.coder.decode(preds["box_preds"], anchors)
        dir_labels = jnp.argmax(preds["dir_preds"], axis=-1)
        period = 2 * np.pi / self.num_dir_bins
        dir_rot = geometry.limit_period(
            boxes[..., 6] - self.dir_offset, self.dir_limit_offset, period)
        heading = (dir_rot + self.dir_offset
                   + period * dir_labels.astype(boxes.dtype))
        boxes = jnp.concatenate([boxes[..., :6], heading[..., None]],
                                axis=-1)
        return boxes, preds["cls_preds"]
