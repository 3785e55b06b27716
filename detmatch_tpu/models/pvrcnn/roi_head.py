"""PVRCNNHead: proposal NMS, RoI target sampling, RoI-grid pooling, second
stage refinement (reference ``pcdet/models/roi_heads/pvrcnn_head.py``,
``roi_head_template.py``, ``target_assigner/proposal_target_layer.py``).

DetMatch-specific behaviors preserved:
* ``roi_scores_full`` (full-class logits of surviving proposals) is carried
  through UNdetached (``roi_head_template.py:98-104``);
* decoded boxes are generated even in training (``pvrcnn_head.py:197-209``).

TPU design notes:
* the proposal layer's zero-padding of RoI slots is *also* the reference's
  behavior (its fixed NMS_POST_MAXSIZE buffer is zero-initialized), so
  padded slots legitimately act as easy-background candidates downstream;
* fg/bg subsampling is re-expressed as masked random ranking (fg without
  replacement, bg with replacement — matching
  ``proposal_target_layer.py:137-215``) with static 128-slot output.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...core import geometry, iou as iou_mod, losses, nms as nms_mod
from ...core.coders import ResidualCoder
from ..layers import MLP, MaskedBatchNorm
from .vsa import SAGroupMLP
from ...ops.pallas.ball_query import ball_query_batched, sort_points_by_y


def proposal_layer(batch_box_preds, batch_cls_preds, nms_pre, nms_post,
                   nms_thresh):
    """Class-agnostic NMS over decoded dense-head boxes.

    Args:
        batch_box_preds: (B, A, 7); batch_cls_preds: (B, A, C) raw logits.
    Returns:
        dict(rois (B, nms_post, 7), roi_scores (B, nms_post),
             roi_labels (B, nms_post) int32 1-based,
             roi_scores_full (B, nms_post, C), roi_valid (B, nms_post)).
        Invalid slots are zero (reference zero-init buffers).
    """
    def single(boxes, cls):
        scores = jnp.max(cls, axis=-1)
        labels = jnp.argmax(cls, axis=-1).astype(jnp.int32)
        k = min(nms_pre, scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(scores, k)
        sel_boxes = boxes[top_idx]
        idx, valid = nms_mod.nms_bev(sel_boxes, top_scores, nms_thresh,
                                     nms_post)
        sel = top_idx[idx]
        rois = jnp.where(valid[:, None], boxes[sel], 0.0)
        roi_scores = jnp.where(valid, scores[sel], 0.0)
        roi_labels = jnp.where(valid, labels[sel] + 1, 0)
        roi_full = jnp.where(valid[:, None], cls[sel], 0.0)
        return rois, roi_scores, roi_labels, roi_full, valid

    rois, scores, labels, full, valid = jax.vmap(single)(
        batch_box_preds, batch_cls_preds)
    return dict(rois=jax.lax.stop_gradient(rois),
                roi_scores=jax.lax.stop_gradient(scores),
                roi_labels=labels,
                roi_scores_full=full,  # NOT detached (DetMatch change)
                roi_valid=valid)


def _pick(rng_key, cand_mask, n_slots, with_replacement):
    """Random selection indices from a masked candidate set, static shape.

    Returns (idx (n_slots,) int32, avail () int32 = candidate count).
    Without replacement: random permutation of candidates, first n_slots
    (meaningless past `avail`). With replacement: uniform draws.
    """
    n = cand_mask.shape[0]
    avail = jnp.sum(cand_mask.astype(jnp.int32))
    if with_replacement:
        # compact candidate indices to the front, draw uniform ints
        order = jnp.argsort(~cand_mask, stable=True)  # candidates first
        draws = jax.random.randint(rng_key, (n_slots,), 0,
                                   jnp.maximum(avail, 1))
        return order[draws].astype(jnp.int32), avail
    r = jax.random.uniform(rng_key, (n,))
    key = jnp.where(cand_mask, r, 2.0)
    order = jnp.argsort(key)
    return order[:n_slots].astype(jnp.int32), avail


def sample_rois_single(rng_key, rois, roi_labels, roi_scores, roi_full,
                       gt_boxes, cfg):
    """ProposalTargetLayer.sample_rois_for_rcnn + subsample_rois for one
    sample, static 128-slot output."""
    n_roi = rois.shape[0]
    gt_cls = gt_boxes[:, 7].astype(jnp.int32)
    gt_valid = gt_cls > 0
    # same-class max IoU (SAMPLE_ROI_BY_EACH_CLASS)
    ious = iou_mod.iou3d(rois, gt_boxes[:, :7])  # (R, G)
    same = roi_labels[:, None] == gt_cls[None, :]
    ious = jnp.where(same & gt_valid[None, :], ious, 0.0)
    max_ov = jnp.max(ious, axis=1)
    gt_assign = jnp.argmax(ious, axis=1)

    fg_thresh = min(cfg["reg_fg_thresh"], cfg["cls_fg_thresh"])
    fg_mask = max_ov >= fg_thresh
    easy_bg = max_ov < cfg["cls_bg_thresh_lo"]
    hard_bg = (max_ov < cfg["reg_fg_thresh"]) & (max_ov >=
                                                 cfg["cls_bg_thresh_lo"])

    k_fg, k_hard, k_easy, k_fg2 = jax.random.split(rng_key, 4)
    n_sample = cfg["roi_per_image"]
    fg_cap = int(np.round(cfg["fg_ratio"] * n_sample))

    fg_idx, n_fg = _pick(k_fg, fg_mask, n_sample, False)
    fg_rep_idx, _ = _pick(k_fg2, fg_mask, n_sample, True)
    hard_idx, n_hard = _pick(k_hard, hard_bg, n_sample, True)
    easy_idx, n_easy = _pick(k_easy, easy_bg, n_sample, True)
    n_bg = n_hard + n_easy

    fg_take = jnp.minimum(fg_cap, n_fg)
    # if no bg at all but fg exists: fill everything with fg (w/ replacement)
    only_fg = (n_fg > 0) & (n_bg == 0)
    fg_take = jnp.where(only_fg, n_sample, fg_take)
    bg_needed = n_sample - fg_take
    hard_take = jnp.where(
        (n_hard > 0) & (n_easy > 0),
        jnp.minimum((bg_needed.astype(jnp.float32)
                     * cfg["hard_bg_ratio"]).astype(jnp.int32), n_hard),
        jnp.where(n_hard > 0, bg_needed, 0),
    )

    slots = jnp.arange(n_sample)
    is_fg_slot = slots < fg_take
    is_hard_slot = (slots >= fg_take) & (slots < fg_take + hard_take)
    # fg slots: without replacement while slot < n_fg, else repeated draws
    fg_sel = jnp.where(slots < n_fg, fg_idx[slots], fg_rep_idx[slots])
    sel = jnp.where(
        is_fg_slot, fg_sel,
        jnp.where(is_hard_slot, hard_idx[slots], easy_idx[slots]))
    slot_valid = (n_fg + n_bg) > 0
    sel = jnp.where(slot_valid, sel, 0)

    out = dict(
        rois=rois[sel],
        roi_labels=roi_labels[sel],
        roi_scores=roi_scores[sel],
        roi_scores_full=roi_full[sel],
        roi_ious=max_ov[sel],
        gt_of_rois=gt_boxes[gt_assign[sel]],
        reg_valid_mask=(max_ov[sel] > cfg["reg_fg_thresh"]) & slot_valid,
    )
    # roi_iou soft cls labels (CLS_SCORE_TYPE='roi_iou')
    iou_sel = max_ov[sel]
    fg_m = iou_sel > cfg["cls_fg_thresh"]
    bg_m = iou_sel < cfg["cls_bg_thresh"]
    mid = (~fg_m) & (~bg_m)
    soft = jnp.where(
        fg_m, 1.0,
        jnp.where(mid, (iou_sel - cfg["cls_bg_thresh"])
                  / (cfg["cls_fg_thresh"] - cfg["cls_bg_thresh"]), 0.0))
    out["rcnn_cls_labels"] = jnp.where(slot_valid, soft, -1.0)
    return out


def canonical_transform(targets):
    """gt_of_rois → RoI-canonical frame with heading flip/clamp
    (``roi_head_template.py:109-135``)."""
    rois = targets["rois"]
    gt = targets["gt_of_rois"]
    roi_center = rois[..., 0:3]
    roi_ry = rois[..., 6] % (2 * np.pi)
    local = gt[..., 0:3] - roi_center
    b, n = local.shape[:2]
    local = geometry.rotate_points_z(
        local.reshape(-1, 1, 3), -roi_ry.reshape(-1)).reshape(b, n, 3)
    heading = (gt[..., 6] - roi_ry) % (2 * np.pi)
    opposite = (heading > np.pi * 0.5) & (heading < np.pi * 1.5)
    heading = jnp.where(opposite, (heading + np.pi) % (2 * np.pi), heading)
    heading = jnp.where(heading > np.pi, heading - 2 * np.pi, heading)
    heading = jnp.clip(heading, -np.pi / 2, np.pi / 2)
    return jnp.concatenate(
        [local, gt[..., 3:6], heading[..., None]], axis=-1)


def roi_grid_points(rois, grid_size):
    """(B, N, 7) rois → (B, N*G^3, 3) global grid points
    (``pvrcnn_head.py:126-147``)."""
    b, n = rois.shape[:2]
    g = grid_size
    idx = np.stack(np.meshgrid(np.arange(g), np.arange(g), np.arange(g),
                               indexing="ij"), axis=-1).reshape(-1, 3)
    dense_idx = jnp.asarray(idx, jnp.float32)  # (G^3, 3) [x, y, z]
    sizes = rois[..., 3:6]  # (B, N, 3)
    local = ((dense_idx[None, None] + 0.5) / g * sizes[:, :, None, :]
             - sizes[:, :, None, :] / 2)  # (B, N, G^3, 3)
    flat = local.reshape(b, n, -1, 3)
    rot = geometry.rotate_points_z(
        flat.reshape(b * n, -1, 3), rois[..., 6].reshape(-1))
    glob = rot.reshape(b, n, -1, 3) + rois[..., None, 0:3]
    return glob.reshape(b, -1, 3)


def default_target_cfg():
    return dict(roi_per_image=128, fg_ratio=0.5, reg_fg_thresh=0.55,
                cls_fg_thresh=0.75, cls_bg_thresh=0.25,
                cls_bg_thresh_lo=0.1, hard_bg_ratio=0.8)


def assign_roi_targets(rng_key, proposals, gt_boxes, cfg=None):
    """Batch RoI sampling + target assignment (pure, no params)."""
    cfg = cfg or default_target_cfg()
    keys = jax.random.split(rng_key, proposals["rois"].shape[0])
    targets = jax.vmap(
        lambda k, r, rl, rs, rf, gb: sample_rois_single(
            k, r, rl, rs, rf, gb, cfg)
    )(keys, proposals["rois"], proposals["roi_labels"],
      proposals["roi_scores"], proposals["roi_scores_full"], gt_boxes)
    targets["gt_of_rois_src"] = targets["gt_of_rois"]
    targets["gt_of_rois_ct"] = canonical_transform(targets)
    return jax.tree.map(jax.lax.stop_gradient, targets)


def decode_roi_boxes(rois, rcnn_reg):
    """generate_predicted_boxes (``roi_head_template.py:235-260``).

    ``local_roi`` keeps the RoI heading, so the coder's heading decode
    (rg = rt + ra) ALREADY yields rt + roi_yaw — adding the yaw again
    here over-rotated every refined box by its RoI heading (caught by
    ``tests/test_pvrcnn_full_torch_parity.py::test_roi_head_parity``:
    BEV orientation systematically wrong at eval while the reg loss,
    which encodes canonically, stayed healthy)."""
    coder = ResidualCoder()
    local_roi = jnp.concatenate(
        [jnp.zeros_like(rois[..., 0:3]), rois[..., 3:7]], axis=-1)
    dec = coder.decode(rcnn_reg, local_roi)
    b, n = rois.shape[:2]
    rot = geometry.rotate_points_z(
        dec[..., 0:3].reshape(b * n, 1, 3),
        rois[..., 6].reshape(-1)).reshape(b, n, 3)
    center = rot + rois[..., 0:3]
    return jnp.concatenate([center, dec[..., 3:]], axis=-1)


def roi_head_loss_terms(rcnn_cls, rcnn_reg, targets, loss_weights=None):
    """Per-sample (numerator, denominator) pairs for the RoI losses; a
    group's loss is sum(numer)/max(sum(denom), 1) * weight — the batch-
    global normalization of ``roi_head_loss`` restricted to the group."""
    lw = loss_weights or dict(rcnn_cls_weight=1.0, rcnn_reg_weight=1.0,
                              rcnn_corner_weight=1.0,
                              code_weights=[1.0] * 7)
    coder = ResidualCoder()
    cls_labels = targets["rcnn_cls_labels"]
    cls_valid = (cls_labels >= 0).astype(jnp.float32)
    p = jax.nn.sigmoid(rcnn_cls[..., 0])
    eps = 1e-7
    bce = -(cls_labels * jnp.log(jnp.clip(p, eps, 1.0))
            + (1 - cls_labels) * jnp.log(jnp.clip(1 - p, eps, 1.0)))
    cls_numer = jnp.sum(bce * cls_valid, axis=1) * lw["rcnn_cls_weight"]
    cls_denom = jnp.sum(cls_valid, axis=1)

    fg = targets["reg_valid_mask"].astype(jnp.float32)
    rois = targets["rois"]
    rois_anchor = jnp.concatenate(
        [jnp.zeros_like(rois[..., 0:3]), rois[..., 3:6],
         jnp.zeros_like(rois[..., 6:7])], axis=-1)
    reg_targets = coder.encode(targets["gt_of_rois_ct"][..., :7],
                               rois_anchor)
    reg_loss = losses.weighted_smooth_l1(
        rcnn_reg, reg_targets, code_weights=lw["code_weights"])
    reg_numer = (jnp.sum(jnp.sum(reg_loss, axis=-1) * fg, axis=1)
                 * lw["rcnn_reg_weight"])

    decoded = decode_roi_boxes(rois, rcnn_reg)
    b, n = decoded.shape[:2]
    corner = losses.corner_loss_lidar(
        decoded.reshape(-1, 7),
        targets["gt_of_rois_src"][..., :7].reshape(-1, 7))
    corner_numer = (jnp.sum(corner.reshape(b, n) * fg, axis=1)
                    * lw["rcnn_corner_weight"])
    fg_denom = jnp.sum(fg, axis=1)
    return dict(rcnn_loss_cls=(cls_numer, cls_denom),
                rcnn_loss_reg=(reg_numer, fg_denom),
                rcnn_loss_corner=(corner_numer, fg_denom))


def roi_head_loss(rcnn_cls, rcnn_reg, targets, loss_weights=None):
    """BCE cls (roi_iou soft labels) + smooth-L1 reg + corner loss
    (``roi_head_template.py:140-230``)."""
    terms = roi_head_loss_terms(rcnn_cls, rcnn_reg, targets, loss_weights)
    return {k: jnp.sum(numer) / jnp.maximum(jnp.sum(denom), 1.0)
            for k, (numer, denom) in terms.items()}


class PVRCNNHead(nn.Module):
    num_classes: int = 3  # for roi_scores_full width
    grid_size: int = 6
    shared_fc: Tuple[int, ...] = (256, 256)
    cls_fc: Tuple[int, ...] = (256, 256)
    reg_fc: Tuple[int, ...] = (256, 256)
    dp_ratio: float = 0.3
    pool_radii: Tuple[float, ...] = (0.8, 1.6)
    pool_nsamples: Tuple[int, ...] = (16, 16)
    pool_mlps: Tuple[Tuple[int, ...], ...] = ((64, 64), (64, 64))
    target_cfg: Dict = None
    use_running_average: bool = False
    dtype: Any = None  # bf16 halves the grouped/pooled HBM traffic

    @staticmethod
    def default_target_cfg():
        return dict(roi_per_image=128, fg_ratio=0.5, reg_fg_thresh=0.55,
                    cls_fg_thresh=0.75, cls_bg_thresh=0.25,
                    cls_bg_thresh_lo=0.1, hard_bg_ratio=0.8)

    @nn.compact
    def __call__(self, rois, keypoints, kp_valid, point_features,
                 point_cls_scores, train: bool = False):
        """Second-stage refinement.

        Args:
            rois: (B, N, 7); keypoints: (B, M, 3);
            point_features: (B, M, C); point_cls_scores: (B, M) sigmoid.
        Returns:
            (rcnn_cls (B, N, 1), rcnn_reg (B, N, 7)).
        """
        b, n = rois.shape[:2]
        pf = point_features * point_cls_scores[..., None]
        grid = roi_grid_points(rois, self.grid_size)  # (B, N*G^3, 3)
        grid_valid = jnp.ones(grid.shape[:2], bool)
        # one y-sort of the keypoint table, shared by both pool groups
        kp_s, kv_s, kperm = sort_points_by_y(
            jax.lax.stop_gradient(keypoints), kp_valid)

        outs = []
        for gi, (r, ns, mlp) in enumerate(zip(
                self.pool_radii, self.pool_nsamples, self.pool_mlps)):
            # ball query OUTSIDE the remat: integer-only (no grads), so
            # recomputing its distance scan in the backward would be
            # pure waste; the (B, R*G^3, ns) int32 indices are tiny
            # residuals next to the grouped activations remat drops
            idx, cnt = ball_query_batched(grid, grid_valid, kp_s, kv_s,
                                          r, ns, point_perm=kperm)

            # remat the group+MLP+pool region: its grouped
            # (B, R*G^3, ns, C) tensor is the model's biggest activation
            # (~2 GB at train batch 8) — recompute it in the backward
            def pool_group(mdl, grid_, kp_, pf_, idx_, cnt_, gi=gi,
                           ns=ns, mlp=mlp):
                slot_valid = (jnp.arange(ns)[None, None, :]
                              < cnt_[..., None])
                out, empty = SAGroupMLP(
                    tuple(mlp), name=f"pool_mlp{gi}", dtype=mdl.dtype,
                    use_running_average=mdl.use_running_average)(
                    grid_, kp_, pf_, idx_, slot_valid, cnt_,
                    use_running_average=not train,
                    return_empty_const=True)
                out = jnp.where(slot_valid[..., None], out,
                                jnp.asarray(-1e10, out.dtype))
                pooled = jnp.max(out, axis=2)
                # eval: reference empty-ball constant MLP_stack(0)
                # (see SAGroupMLP); train: clean zero for masked BN
                fill = (empty[None, None].astype(pooled.dtype)
                        if not train else jnp.zeros((), pooled.dtype))
                return jnp.where((cnt_ > 0)[..., None], pooled, fill)

            outs.append(nn.remat(pool_group)(
                self, grid, keypoints, pf, idx, cnt))
        pooled = jnp.concatenate(outs, axis=-1)  # (B, N*G^3, C)

        # (B, N, G^3 * C) — reference reshapes (BN, C, G, G, G) then
        # flattens channel-major; flatten order only permutes the fc input
        # dims so it is functionally equivalent for training from scratch.
        c = pooled.shape[-1]
        pooled = pooled.reshape(b, n, self.grid_size ** 3 * c)

        x = pooled
        for i, f in enumerate(self.shared_fc):
            x = nn.Dense(f, use_bias=False, name=f"shared_fc{i}",
                         dtype=self.dtype)(x)
            x = MaskedBatchNorm(
                name=f"shared_bn{i}", eps=1e-5,
                use_running_average=self.use_running_average)(
                x, use_running_average=not train)
            x = nn.relu(x)
            if i != len(self.shared_fc) - 1 and self.dp_ratio > 0:
                x = nn.Dropout(self.dp_ratio, deterministic=not train)(x)
        shared = x

        def head(x, feats, final, name):
            for i, f in enumerate(feats):
                x = nn.Dense(f, use_bias=False, name=f"{name}_fc{i}",
                             dtype=self.dtype)(x)
                x = MaskedBatchNorm(
                    name=f"{name}_bn{i}", eps=1e-5,
                    use_running_average=self.use_running_average)(
                    x, use_running_average=not train)
                x = nn.relu(x)
                if i == 0 and self.dp_ratio >= 0:
                    x = nn.Dropout(self.dp_ratio,
                                   deterministic=not train)(x)
            init = (nn.initializers.normal(0.001) if name == "reg"
                    else nn.initializers.lecun_normal())
            return nn.Dense(final, kernel_init=init,
                            name=f"{name}_out")(x)

        rcnn_cls = head(shared, self.cls_fc, 1, "cls")
        rcnn_reg = head(shared, self.reg_fc, 7, "reg")
        return (rcnn_cls.astype(jnp.float32),
                rcnn_reg.astype(jnp.float32))

    # ---------------- pure helpers (no params) ----------------

    def assign_targets(self, rng_key, proposals, gt_boxes):
        return assign_roi_targets(rng_key, proposals, gt_boxes,
                                  self.target_cfg or default_target_cfg())

    decode_boxes = staticmethod(decode_roi_boxes)
    loss = staticmethod(roi_head_loss)
