"""DetMatch SSL detector: teacher/student orchestration, EMA, loss weights.

Mirrors reference ``mmdet3d/models/detectors/ssl.py`` + the DetMatch module
pipeline (``configs/detmatch/001/detmatch/split_0.py:275-425``), re-expressed
as one pure jittable function over fixed-shape pytrees:

* teacher = EMA of student with true-average rampup
  (``ssl.py:129-163``: decay = min(1 - 1/(iter + round(1/(1-d0))), d_max));
* unlabeled-loss exponential rampup weight (``ssl.py:165-181``);
* labeled pipeline: supervised 3D + 2D losses on the student;
* unlabeled pipeline: teacher inference (3D post-NMS, 2D NMS'd), de-aug to
  the clean frame, score filters, fusion Hungarian matching with cost
  threshold, re-aug into the student frame, hard pseudo-label losses
  (3D full; 2D cls-only ×4), student 3D→2D projection + second matching +
  Hungarian consistency loss.

Everything runs on-device: no host round-trips inside the step.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.transforms import Aug2D, Aug3D
from ..models.frcnn.faster_rcnn import FasterRCNN
from ..models.pvrcnn.pvrcnn import PVRCNN, post_processing
from . import boxset, modules


@dataclass(frozen=True)
class SSLConfig:
    """DetMatch train_cfg.ssl (``split_0.py:434-441``) + module params."""
    ema_decay: float = 0.999
    true_avg_rampup: bool = True
    rampup_start_decay: float = 0.99
    use_student_bn_stats_for_teacher: bool = False
    ssl_weight: float = 1.0
    ssl_weight_rampup_start_iter: int = 0
    ssl_weight_rampup_num_iter: int = 0
    # module params (split_0.py:275-425)
    score_filter_3d: float = 0.1
    score_filter_2d: float = 0.1
    nms_2d_cfg: Tuple[float, float, int] = (0.05, 0.5, 100)
    proj_nms_2d_cfg: Tuple[float, float, int] = (0.1, 0.5, 100)
    cost_thr: float = -1.5
    pseudo_score_thr_3d: float = 0.1
    pseudo_score_thr_2d: float = 0.1
    hard_pseudo_2d_weight: float = 4.0
    consistency_weights: Tuple[float, float, float] = (2.0, 20.0, 2.0)
    max_pseudo_gt: int = 64
    # widths of the student-boxes decode feeding the consistency branch
    # (reference Opd_HardPseudoLabel_3D out_bboxes path, no_nms=False);
    # tiny/dryrun configs shrink these with the rest of the model
    stu_boxes_nms: Tuple[int, int] = (128, 128)
    # pipeline switches: full DetMatch = (True, True, True, True);
    # ConfThr baselines (reference configs/detmatch/*/confthr_*) disable
    # fusion and one modality, thresholding teacher boxes directly.
    enable_3d: bool = True
    enable_2d: bool = True
    fusion: bool = True
    consistency: bool = True
    # run the student's labeled+unlabeled 3D passes as ONE concatenated
    # forward (halves the compiled program and fills the MXU better);
    # losses are regrouped per sub-batch exactly (PVRCNN.loss_grouped).
    # Deviation from the reference's two sequential passes: BatchNorm
    # statistics are computed over the union batch.
    concat_student_batch: bool = True


def ema_decay_at(it, cfg: SSLConfig):
    """``ssl.py:129-144``."""
    if not cfg.true_avg_rampup:
        return jnp.asarray(cfg.ema_decay, jnp.float32)
    start = max(round(1.0 / (1.0 - cfg.rampup_start_decay)), 2)
    return jnp.minimum(1.0 - 1.0 / (it + start), cfg.ema_decay)


def ssl_weight_at(it, cfg: SSLConfig):
    """``ssl.py:165-181``."""
    if cfg.ssl_weight_rampup_num_iter == 0:
        return jnp.asarray(cfg.ssl_weight, jnp.float32)
    current = jnp.clip(it - cfg.ssl_weight_rampup_start_iter, 0,
                       cfg.ssl_weight_rampup_num_iter)
    phase = 1.0 - current / cfg.ssl_weight_rampup_num_iter
    w = cfg.ssl_weight * jnp.exp(-5.0 * phase * phase)
    return jnp.where(it < cfg.ssl_weight_rampup_start_iter, 0.0, w)


def ema_update(teacher_params, student_params, decay,
               use_student_bn_stats=False):
    """``ssl.py:146-163``: teacher = decay*teacher + (1-decay)*student.

    Applied to the full variable trees; with use_student_bn_stats the
    batch_stats subtree is copied from the student instead of averaged.
    """
    def avg(t, s):
        return t * decay + s * (1.0 - decay)

    out = jax.tree.map(avg, teacher_params, student_params)
    if use_student_bn_stats:
        for det in out:
            if "batch_stats" in out[det]:
                out[det]["batch_stats"] = student_params[det]["batch_stats"]
    return out


def pseudo_gt_from_boxset(bs, score_thr, max_gt):
    """Thresholded BoxSet → (B, max_gt, 8) zero-padded gt tensor
    (Opd_HardPseudoLabel_3D, ``ssl_modules/consumers/openpcdet.py:98-209``).
    """
    max_s = jnp.max(bs["scores"], axis=-1)
    labels = jnp.argmax(bs["scores"], axis=-1).astype(jnp.float32) + 1.0
    keep = bs["valid"] & (max_s > score_thr)

    def single(boxes, lab, k):
        order = jnp.argsort(~k, stable=True)[:max_gt]
        kk = k[order]
        gt = jnp.concatenate([boxes[order], lab[order][:, None]], axis=-1)
        return jnp.where(kk[:, None], gt, 0.0)

    return jax.vmap(single)(bs["boxes"], labels, keep)


class SSLDetector:
    """Functional teacher/student pair over PVRCNN + FasterRCNN.

    State layout (a pytree; 'student' is the trainable half):
        {'student': {'det3d': vars, 'det2d': vars},
         'teacher': {'det3d': vars, 'det2d': vars}}
    where vars are flax variable dicts ({'params', 'batch_stats'/'frozen'}).
    """

    def __init__(self, pvrcnn: PVRCNN, frcnn: FasterRCNN,
                 cfg: SSLConfig = SSLConfig()):
        self.pvrcnn = pvrcnn
        self.frcnn = frcnn
        self.cfg = cfg

    # ---------------- init ----------------

    def init_states(self, rng, batch3d, images, img_shapes):
        """Initialize teacher+student variable trees.

        Uses ``lazy_init`` so no full-size forward is executed/compiled
        just to create parameters (a cold-start of tens of minutes through
        remote-compile tunnels otherwise).
        """
        k1, k2 = jax.random.split(rng)
        abstract = lambda t: jax.tree.map(  # noqa: E731
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                           jnp.result_type(x)), t)
        v3 = self.pvrcnn.lazy_init(
            {"params": k1, "sampling": k1, "dropout": k1},
            abstract(batch3d), train=True)
        v2 = self.frcnn.lazy_init({"params": k2}, abstract(images),
                                  abstract(img_shapes), train=True)
        student = {"det3d": dict(v3), "det2d": dict(v2)}
        # a REAL buffer copy, not an alias: the train loop donates the
        # student buffers to the jitted step, and donating an aliased
        # teacher would delete the teacher's arrays out from under it
        teacher = jax.tree.map(jnp.copy, student)
        return {"student": student, "teacher": teacher}

    # ---------------- branch helpers ----------------

    def _det3d_train(self, variables, batch, rng):
        out, mut = self.pvrcnn.apply(
            variables, batch, train=True,
            rngs={"sampling": rng, "dropout": rng},
            mutable=["batch_stats"])
        losses = self.pvrcnn.apply(variables, out, batch,
                                   method=PVRCNN.loss)
        return out, losses, mut

    def _det3d_teacher_boxes(self, variables, batch):
        out = self.pvrcnn.apply(variables, batch, train=False)
        post = post_processing(out)
        return dict(boxes=post["boxes"], scores=post["sem_scores_full"],
                    valid=post["valid"])

    def _det3d_student_boxes(self, out_train):
        """Student boxes from the training forward (DetMatch
        out_bboxes_key path, no_nms=False)."""
        pre, post_k = self.cfg.stu_boxes_nms
        post = post_processing(out_train, nms_pre=pre, nms_post=post_k)
        return dict(boxes=post["boxes"], scores=post["sem_scores_full"],
                    valid=post["valid"])

    def _det2d_teacher_boxes(self, variables, batch, cfg):
        """SimpleTest_2D + BboxesNMS_2D (scores keep the bg column in the
        reference; we strip it after NMS — ``processors_fusion.py:118``)."""
        score_thr, iou_thr, max_num = cfg
        res = self.frcnn.apply(
            variables, batch["img"], batch["img_shape"],
            score_thr, iou_thr, max_num, True,
            method=FasterRCNN.simple_test)
        return dict(boxes=res["boxes"],
                    scores=res["scores_full"][..., :-1],  # strip bg
                    valid=res["valid"])

    # ---------------- staged API (separate jits) ----------------
    # The monolithic step is a very large XLA program (teacher inference +
    # two student train passes + grads); some compiler services OOM on it.
    # The pipeline splits naturally at the stop-gradient boundary: teacher
    # pseudo-label generation has no grads and compiles separately.

    def teacher_pseudo_labels(self, teacher_state, batch):
        """Unlabeled-teacher phase → detached pseudo-label BoxSets.

        Returns dict(m3d_stu, m2d_stu, m2d_clean, logs).
        """
        cfg = self.cfg
        tea = jax.tree.map(jax.lax.stop_gradient, teacher_state)
        u_tea = batch["unlab"]["tea"]
        u_stu = batch["unlab"]["stu"]
        logs = {}
        tea3d_noaug = tea2d_noaug = None
        if cfg.enable_3d:
            tea3d = self._det3d_teacher_boxes(tea["det3d"], u_tea)
            tea3d_noaug = modules.transform_3d(tea3d, u_tea["aug3d"],
                                               reverse=True)
        if cfg.enable_2d:
            tea2d = self._det2d_teacher_boxes(tea["det2d"], u_tea,
                                              cfg.nms_2d_cfg)
            tea2d_noaug = modules.transform_2d(tea2d, u_tea["aug2d"],
                                               reverse=True)
        if cfg.fusion:
            tea3d_filt = boxset.max_score_filter(tea3d_noaug,
                                                 cfg.score_filter_3d)
            tea2d_filt = boxset.max_score_filter(tea2d_noaug,
                                                 cfg.score_filter_2d)
            m3d, m2d, _ = modules.fusion_hungarian_matching(
                tea3d_filt, tea2d_filt, u_stu["lidar2img"],
                u_stu["ori_shape"], cost_thr=cfg.cost_thr)
            logs["metrics.num_tea_hung"] = boxset.num_valid(m3d)
        else:
            m3d, m2d = tea3d_noaug, tea2d_noaug
        out = dict(logs=logs)
        if cfg.enable_3d:
            out["m3d_stu"] = boxset.detach(
                modules.transform_3d(m3d, u_stu["aug3d"], reverse=False))
        if cfg.enable_2d:
            out["m2d_stu"] = boxset.detach(
                modules.transform_2d(m2d, u_stu["aug2d"], reverse=False))
            out["m2d_clean"] = boxset.detach(m2d)
        return out

    def _consistency_branch(self, out3d_sub, u_stu, m2d_clean):
        """The HungarianConsistency branch (shared by every student-3d
        loss variant): student 3D boxes → de-aug → project to the image
        → 2D NMS → second Hungarian match vs the clean teacher-2D set →
        re-aug both into the student-2D frame → focal/L1/gIoU loss
        (reference ``ssl_modules/processors_fusion.py`` Bboxes3DTo2D +
        FusionHungarianMatching + HungarianConsistency,
        ``split_0.py:379-425``).

        Returns (loss dict, num-matched metric).
        """
        cfg = self.cfg
        stu3d = self._det3d_student_boxes(out3d_sub)
        stu3d_noaug = modules.transform_3d(stu3d, u_stu["aug3d"],
                                           reverse=True)
        stu3d_proj = modules.boxes_3d_to_2d(
            stu3d_noaug, u_stu["lidar2img"], u_stu["ori_shape"])
        stu3d_proj = modules.nms_2d_boxset(stu3d_proj,
                                           *cfg.proj_nms_2d_cfg)
        s3d_m, t2d_m, _ = modules.fusion_hungarian_matching(
            stu3d_proj, m2d_clean, u_stu["lidar2img"],
            u_stu["ori_shape"], cost_thr=cfg.cost_thr,
            project_3d_to_2d=False)
        s3d_m_aug = modules.transform_2d(s3d_m, u_stu["aug2d"],
                                         reverse=False)
        t2d_m_aug = modules.transform_2d(
            boxset.detach(t2d_m), u_stu["aug2d"], reverse=False)
        cw, lw, iw = cfg.consistency_weights
        cons = modules.hungarian_consistency_loss(
            s3d_m_aug, t2d_m_aug, u_stu["img_shape"],
            cls_w=cw, l1_w=lw, iou_w=iw)
        return cons, boxset.num_valid(s3d_m)

    def student_losses(self, student, batch, pseudo, it, rng):
        """Supervised + pseudo-label + consistency losses for the student.

        Differentiable w.r.t. ``student``; ``pseudo`` comes from
        :meth:`teacher_pseudo_labels` (already detached).
        """
        cfg = self.cfg
        stu = student
        k3, k2, k3u, k2u = jax.random.split(rng, 4)
        logs = dict(pseudo["logs"]) if "logs" in pseudo else {}
        new_stats = {}
        sup_losses = {}
        ssl_losses = {}

        lab = batch["lab"]["stu"]
        if cfg.enable_3d:
            out3d, sup3d, mut3d = self._det3d_train(stu["det3d"], lab, k3)
            new_stats["det3d"] = mut3d["batch_stats"]
            sup_losses.update({f"sup.3d.{k}": v for k, v in sup3d.items()
                               if k != "loss"})
        if cfg.enable_2d:
            fwd2d = self.frcnn.apply(stu["det2d"], lab["img"],
                                     lab["img_shape"], train=True)
            sup2d = self.frcnn.apply(
                stu["det2d"], k2, fwd2d, lab["gt_boxes2d"],
                lab["gt_labels2d"], lab["gt2d_valid"],
                method=FasterRCNN.loss)
            sup_losses.update({f"sup.2d.{k}": v for k, v in sup2d.items()})

        u_stu = batch["unlab"]["stu"]
        out3d_u = None
        if cfg.enable_3d:
            pseudo_gt3d = pseudo_gt_from_boxset(
                pseudo["m3d_stu"], cfg.pseudo_score_thr_3d,
                cfg.max_pseudo_gt)
            u_stu_3d = dict(u_stu, gt_boxes=pseudo_gt3d)
            out3d_u, pl3d, mut3d_u = self._det3d_train(
                dict(stu["det3d"], batch_stats=new_stats["det3d"]),
                u_stu_3d, k3u)
            new_stats["det3d"] = mut3d_u["batch_stats"]
            ssl_losses.update({f"hard_pseudo_3d.{k}": v
                               for k, v in pl3d.items() if k != "loss"})

        if cfg.enable_2d:
            m2d_stu = pseudo["m2d_stu"]
            max2d = jnp.max(m2d_stu["scores"], axis=-1)
            keep2d = m2d_stu["valid"] & (max2d > cfg.pseudo_score_thr_2d)
            pseudo2d_labels = jnp.argmax(m2d_stu["scores"], axis=-1)
            fwd2d_u = self.frcnn.apply(stu["det2d"], u_stu["img"],
                                       u_stu["img_shape"], train=True)
            pl2d = self.frcnn.apply(
                stu["det2d"], k2u, fwd2d_u, m2d_stu["boxes"],
                pseudo2d_labels.astype(jnp.int32), keep2d,
                method=FasterRCNN.loss)
            ssl_losses["hard_pseudo_2d.loss_rpn_cls"] = (
                pl2d["loss_rpn_cls"] * cfg.hard_pseudo_2d_weight)
            ssl_losses["hard_pseudo_2d.loss_cls"] = (
                pl2d["loss_cls"] * cfg.hard_pseudo_2d_weight)

        if cfg.consistency and cfg.fusion and cfg.enable_3d \
                and cfg.enable_2d:
            cons, n_match = self._consistency_branch(
                out3d_u, u_stu, pseudo["m2d_clean"])
            logs["metrics.num_2D_to_3D_hung"] = n_match
            ssl_losses.update({f"2D_to_3D_hung.{k}": v
                               for k, v in cons.items()})

        w = ssl_weight_at(it, cfg)
        total = sum(sup_losses.values()) + w * sum(ssl_losses.values())
        logs.update(sup_losses)
        logs.update({f"ssl.unlab.{k}": v for k, v in ssl_losses.items()})
        logs["ssl.weight"] = w
        logs["ssl.ema_decay"] = ema_decay_at(it, cfg)
        logs["loss"] = total
        return total, dict(logs=logs, batch_stats=new_stats)

    def student_losses_3d(self, det3d_vars, batch, pseudo, it, rng):
        """det3d-only losses (sup + hard pseudo + 2D consistency) — the
        gradient graph w.r.t. det3d params is independent of det2d."""
        cfg = self.cfg
        k3, k3u = jax.random.split(rng)
        logs = {}
        new_stats = {}
        lab = batch["lab"]["stu"]
        out3d, sup3d, mut3d = self._det3d_train(det3d_vars, lab, k3)
        new_stats["det3d"] = mut3d["batch_stats"]
        sup_losses = {f"sup.3d.{k}": v for k, v in sup3d.items()
                      if k != "loss"}
        ssl_losses = {}
        u_stu = batch["unlab"]["stu"]
        pseudo_gt3d = pseudo_gt_from_boxset(
            pseudo["m3d_stu"], cfg.pseudo_score_thr_3d, cfg.max_pseudo_gt)
        u_stu_3d = dict(u_stu, gt_boxes=pseudo_gt3d)
        out3d_u, pl3d, mut3d_u = self._det3d_train(
            dict(det3d_vars, batch_stats=new_stats["det3d"]), u_stu_3d,
            k3u)
        new_stats["det3d"] = mut3d_u["batch_stats"]
        ssl_losses.update({f"hard_pseudo_3d.{k}": v
                           for k, v in pl3d.items() if k != "loss"})
        if cfg.consistency and cfg.fusion and cfg.enable_2d:
            cons, n_match = self._consistency_branch(
                out3d_u, u_stu, pseudo["m2d_clean"])
            logs["metrics.num_2D_to_3D_hung"] = n_match
            ssl_losses.update({f"2D_to_3D_hung.{k}": v
                               for k, v in cons.items()})
        w = ssl_weight_at(it, cfg)
        total = sum(sup_losses.values()) + w * sum(ssl_losses.values())
        logs.update(sup_losses)
        logs.update({f"ssl.unlab.{k}": v for k, v in ssl_losses.items()})
        return total, dict(logs=logs, batch_stats=new_stats)

    def _concat_student_batch(self, batch, pseudo):
        """Concatenate labeled (real gt) + unlabeled (pseudo gt) student
        views into one PV-RCNN batch; returns (cat, n_labeled)."""
        cfg = self.cfg
        lab = batch["lab"]["stu"]
        u_stu = batch["unlab"]["stu"]
        pseudo_gt3d = pseudo_gt_from_boxset(
            pseudo["m3d_stu"], cfg.pseudo_score_thr_3d, cfg.max_pseudo_gt)
        g = max(lab["gt_boxes"].shape[1], pseudo_gt3d.shape[1])

        def padg(x):
            if x.shape[1] == g:
                return x
            pad = jnp.zeros((x.shape[0], g - x.shape[1], x.shape[2]),
                            x.dtype)
            return jnp.concatenate([x, pad], axis=1)

        cat = {k: jnp.concatenate([lab[k], u_stu[k]], axis=0)
               for k in ("points", "points_valid", "voxel_features",
                         "voxel_keys")}
        cat["gt_boxes"] = jnp.concatenate(
            [padg(lab["gt_boxes"]), padg(pseudo_gt3d)], axis=0)
        return cat, lab["points"].shape[0]

    def _stu3d_grouped_losses(self, det3d_vars, out, cat, bl, batch,
                              pseudo, it):
        """Grouped sup/pseudo losses + consistency from a concat-batch
        forward output. Returns (total, logs)."""
        cfg = self.cfg
        u_stu = batch["unlab"]["stu"]
        w = ssl_weight_at(it, cfg)
        b = cat["points"].shape[0]
        mask_lab = jnp.arange(b) < bl
        grouped = self.pvrcnn.apply(
            det3d_vars, out, cat,
            # log-key naming matches the non-concat paths (sup.3d.* /
            # ssl.unlab.hard_pseudo_3d.*) so log.json consumers see one
            # schema regardless of the step variant
            {"sup.3d": (mask_lab, 1.0),
             "ssl.unlab.hard_pseudo_3d": (~mask_lab, w)},
            method=PVRCNN.loss_grouped)
        total = grouped.pop("loss")
        logs = {k: v for k, v in grouped.items()}

        if cfg.consistency and cfg.fusion and cfg.enable_2d:
            sub = {k: jax.tree.map(lambda x: x[bl:], out[k])
                   for k in ("batch_box_preds_rcnn", "rcnn_cls",
                             "roi_labels", "roi_scores_full")}
            cons, n_match = self._consistency_branch(
                sub, u_stu, pseudo["m2d_clean"])
            logs["metrics.num_2D_to_3D_hung"] = n_match
            for k, v in cons.items():
                logs[f"ssl.unlab.2D_to_3D_hung.{k}"] = v
                total = total + w * v
        return total, logs

    # ---- two-segment gradient (backbone | heads) -------------------
    # The fused student-3d fwd+bwd program exceeds the TPU compile
    # helper's memory cap; splitting the gradient at the multi-scale
    # feature boundary yields three modest programs. The backbone is
    # recomputed in the backward segment (cheap: ~19 ms fwd).

    @staticmethod
    def split_ms(ms):
        """Split backbone output into (feats, dynamic aux arrays); the
        static shape/stride meta must NOT cross jit boundaries (it would
        become traced) — it is re-attached from config via _ms_meta."""
        feats = {k: lv["feats"] for k, lv in ms.items()
                 if isinstance(lv, dict) and "feats" in lv}
        aux = {k: {kk: lv[kk] for kk in ("keys", "mask")}
               for k, lv in ms.items()
               if isinstance(lv, dict) and "feats" in lv}
        return feats, aux

    def _ms_meta(self):
        from ..models.pvrcnn.backbone3d import static_level_meta
        gx, gy, gz = self.pvrcnn.grid_size
        return static_level_meta((int(gz) + 1, int(gy), int(gx)))

    def stu3d_seg_backbone(self, det3d_vars, batch, pseudo):
        """Segment 1: concat batch + backbone forward (no grads)."""
        cat, bl = self._concat_student_batch(batch, pseudo)
        ms, mut = self.pvrcnn.apply(det3d_vars, cat, train=True,
                                    mutable=["batch_stats"],
                                    method=PVRCNN.backbone_fwd)
        feats, aux = self.split_ms(ms)
        return cat, feats, aux, mut["batch_stats"]

    def stu3d_seg_heads(self, det3d_vars, cat, ms_feats, ms_aux, batch,
                        pseudo, it, rng):
        """Segment 2: heads fwd+bwd w.r.t. (params, backbone features)."""
        bl = batch["lab"]["stu"]["points"].shape[0]

        meta = self._ms_meta()

        def loss_fn(p, feats):
            v = dict(det3d_vars, params=p)
            ms = {k: dict(ms_aux[k], feats=feats[k], **meta[k])
                  for k in feats}
            out, mut = self.pvrcnn.apply(
                v, cat, ms, train=True,
                rngs={"sampling": rng, "dropout": rng},
                mutable=["batch_stats"],
                method=PVRCNN.forward_from_ms)
            total, logs = self._stu3d_grouped_losses(
                v, out, cat, bl, batch, pseudo, it)
            return total, (logs, mut["batch_stats"])

        (total, (logs, head_stats)), (g_params, g_feats) = \
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                det3d_vars["params"], ms_feats)
        logs["loss"] = total
        return g_params, g_feats, logs, head_stats

    def stu3d_seg_bb_bwd(self, det3d_vars, cat, g_feats):
        """Segment 3: recompute the backbone under vjp and pull the
        feature cotangents back to backbone-parameter gradients."""
        def f(p):
            v = dict(det3d_vars, params=p)
            ms, _ = self.pvrcnn.apply(v, cat, train=True,
                                      mutable=["batch_stats"],
                                      method=PVRCNN.backbone_fwd)
            feats, _ = self.split_ms(ms)
            return feats

        _, vjp = jax.vjp(f, det3d_vars["params"])
        (g_backbone,) = vjp(g_feats)
        return g_backbone

    def student_losses_3d_concat(self, det3d_vars, batch, pseudo, it,
                                 rng):
        """det3d losses via ONE concatenated (labeled + unlabeled)
        PV-RCNN pass with exact per-group loss regrouping
        (``PVRCNN.loss_grouped``). Same semantics as
        :meth:`student_losses_3d` up to BatchNorm batch statistics
        (computed over the union batch here)."""
        cat, bl = self._concat_student_batch(batch, pseudo)
        out, mut = self.pvrcnn.apply(
            det3d_vars, cat, train=True,
            rngs={"sampling": rng, "dropout": rng},
            mutable=["batch_stats"])
        total, logs = self._stu3d_grouped_losses(
            det3d_vars, out, cat, bl, batch, pseudo, it)
        return total, dict(logs=logs,
                           batch_stats={"det3d": mut["batch_stats"]})

    def student_losses_2d(self, det2d_vars, batch, pseudo, it, rng):
        """det2d-only losses (sup + cls-only hard pseudo)."""
        cfg = self.cfg
        k2, k2u = jax.random.split(rng)
        lab = batch["lab"]["stu"]
        fwd2d = self.frcnn.apply(det2d_vars, lab["img"], lab["img_shape"],
                                 train=True)
        sup2d = self.frcnn.apply(
            det2d_vars, k2, fwd2d, lab["gt_boxes2d"], lab["gt_labels2d"],
            lab["gt2d_valid"], method=FasterRCNN.loss)
        sup_losses = {f"sup.2d.{k}": v for k, v in sup2d.items()}
        u_stu = batch["unlab"]["stu"]
        m2d_stu = pseudo["m2d_stu"]
        max2d = jnp.max(m2d_stu["scores"], axis=-1)
        keep2d = m2d_stu["valid"] & (max2d > cfg.pseudo_score_thr_2d)
        pseudo2d_labels = jnp.argmax(m2d_stu["scores"], axis=-1)
        fwd2d_u = self.frcnn.apply(det2d_vars, u_stu["img"],
                                   u_stu["img_shape"], train=True)
        pl2d = self.frcnn.apply(
            det2d_vars, k2u, fwd2d_u, m2d_stu["boxes"],
            pseudo2d_labels.astype(jnp.int32), keep2d,
            method=FasterRCNN.loss)
        ssl_losses = {
            "hard_pseudo_2d.loss_rpn_cls":
                pl2d["loss_rpn_cls"] * cfg.hard_pseudo_2d_weight,
            "hard_pseudo_2d.loss_cls":
                pl2d["loss_cls"] * cfg.hard_pseudo_2d_weight,
        }
        w = ssl_weight_at(it, cfg)
        total = sum(sup_losses.values()) + w * sum(ssl_losses.values())
        logs = dict(sup_losses)
        logs.update({f"ssl.unlab.{k}": v for k, v in ssl_losses.items()})
        return total, dict(logs=logs)

    # ---------------- main train loss (fused; kept for small configs) ----

    def forward_train(self, state, batch, it, rng):
        """Compute total loss + metrics for one SSL iteration.

        Args:
            state: see class docstring.
            batch: {'lab': {'stu': ..., 'tea': ...},
                    'unlab': {'stu': ..., 'tea': ...}} — each view holds
                points/voxels/img/img_shape/lidar2img/ori_shape/aug3d/aug2d
                (+ gt_boxes / gt_boxes2d / gt_labels2d / gt2d_valid on lab).
            it: iteration scalar (for ramps).
        Returns:
            (total_loss, aux dict with log vars and new batch_stats).
        """
        cfg = self.cfg
        stu = state["student"]
        tea = jax.tree.map(jax.lax.stop_gradient, state["teacher"])
        k3, k2, k3u, k2u = jax.random.split(rng, 4)
        logs = {}
        new_stats = {}
        sup_losses = {}
        ssl_losses = {}

        # ===== labeled: supervised losses (Opd_Supervised_3D /
        # TwoStageSupervised_2D) =====
        lab = batch["lab"]["stu"]
        if cfg.enable_3d:
            out3d, sup3d, mut3d = self._det3d_train(stu["det3d"], lab, k3)
            new_stats["det3d"] = mut3d["batch_stats"]
            sup_losses.update({f"sup.3d.{k}": v for k, v in sup3d.items()
                               if k != "loss"})
        if cfg.enable_2d:
            fwd2d = self.frcnn.apply(stu["det2d"], lab["img"],
                                     lab["img_shape"], train=True)
            sup2d = self.frcnn.apply(
                stu["det2d"], k2, fwd2d, lab["gt_boxes2d"],
                lab["gt_labels2d"], lab["gt2d_valid"],
                method=FasterRCNN.loss)
            sup_losses.update({f"sup.2d.{k}": v for k, v in sup2d.items()})

        # ===== unlabeled pipeline =====
        u_tea = batch["unlab"]["tea"]
        u_stu = batch["unlab"]["stu"]

        tea3d_noaug = tea2d_noaug = None
        if cfg.enable_3d:
            tea3d = self._det3d_teacher_boxes(tea["det3d"], u_tea)
            tea3d_noaug = modules.transform_3d(tea3d, u_tea["aug3d"],
                                               reverse=True)
        if cfg.enable_2d:
            tea2d = self._det2d_teacher_boxes(tea["det2d"], u_tea,
                                              cfg.nms_2d_cfg)
            tea2d_noaug = modules.transform_2d(tea2d, u_tea["aug2d"],
                                               reverse=True)

        if cfg.fusion:
            tea3d_filt = boxset.max_score_filter(tea3d_noaug,
                                                 cfg.score_filter_3d)
            tea2d_filt = boxset.max_score_filter(tea2d_noaug,
                                                 cfg.score_filter_2d)
            m3d, m2d, mcost = modules.fusion_hungarian_matching(
                tea3d_filt, tea2d_filt, u_stu["lidar2img"],
                u_stu["ori_shape"], cost_thr=cfg.cost_thr)
            logs["metrics.num_tea_hung"] = boxset.num_valid(m3d)
        else:
            # ConfThr baselines: teacher boxes pass straight through
            m3d, m2d = tea3d_noaug, tea2d_noaug

        m3d_stu = m2d_stu = None
        if cfg.enable_3d:
            m3d_stu = boxset.detach(
                modules.transform_3d(m3d, u_stu["aug3d"], reverse=False))
        if cfg.enable_2d:
            m2d_stu = boxset.detach(
                modules.transform_2d(m2d, u_stu["aug2d"], reverse=False))

        out3d_u = None
        if cfg.enable_3d:
            # (3D) hard pseudo label: student full train loss on pseudo gt
            pseudo_gt3d = pseudo_gt_from_boxset(
                m3d_stu, cfg.pseudo_score_thr_3d, cfg.max_pseudo_gt)
            u_stu_3d = dict(u_stu, gt_boxes=pseudo_gt3d)
            out3d_u, pl3d, mut3d_u = self._det3d_train(
                dict(stu["det3d"], batch_stats=new_stats["det3d"]),
                u_stu_3d, k3u)
            new_stats["det3d"] = mut3d_u["batch_stats"]
            ssl_losses.update({f"hard_pseudo_3d.{k}": v
                               for k, v in pl3d.items() if k != "loss"})

        if cfg.enable_2d:
            # (2D) hard pseudo label: cls-only, weight 4
            max2d = jnp.max(m2d_stu["scores"], axis=-1)
            keep2d = m2d_stu["valid"] & (max2d > cfg.pseudo_score_thr_2d)
            pseudo2d_labels = jnp.argmax(m2d_stu["scores"], axis=-1)
            fwd2d_u = self.frcnn.apply(stu["det2d"], u_stu["img"],
                                       u_stu["img_shape"], train=True)
            pl2d = self.frcnn.apply(
                stu["det2d"], k2u, fwd2d_u, m2d_stu["boxes"],
                pseudo2d_labels.astype(jnp.int32), keep2d,
                method=FasterRCNN.loss)
            # loss_detach_keys = ['loss_rpn_bbox', 'loss_bbox'] → cls-only
            ssl_losses["hard_pseudo_2d.loss_rpn_cls"] = (
                pl2d["loss_rpn_cls"] * cfg.hard_pseudo_2d_weight)
            ssl_losses["hard_pseudo_2d.loss_cls"] = (
                pl2d["loss_cls"] * cfg.hard_pseudo_2d_weight)

        # ===== 2D consistency branch (DetMatch only) =====
        if cfg.consistency and cfg.fusion and cfg.enable_3d \
                and cfg.enable_2d:
            cons, n_match = self._consistency_branch(
                out3d_u, u_stu, boxset.detach(m2d))
            logs["metrics.num_2D_to_3D_hung"] = n_match
            ssl_losses.update({f"2D_to_3D_hung.{k}": v
                               for k, v in cons.items()})

        # ===== aggregate =====
        w = ssl_weight_at(it, cfg)
        total = sum(sup_losses.values()) + w * sum(ssl_losses.values())
        logs.update(sup_losses)
        logs.update({f"ssl.unlab.{k}": v for k, v in ssl_losses.items()})
        logs["ssl.weight"] = w
        logs["ssl.ema_decay"] = ema_decay_at(it, cfg)
        logs["loss"] = total
        return total, dict(logs=logs, batch_stats=new_stats)
