"""Evaluation: run detectors over a val dataset and compute KITTI AP.

Mirrors the reference flow (``apis/test.py`` → ``KittiDataset.evaluate``
fanout ``kitti_dataset.py:320-372``): for an SSL state the metrics fan out
over {teacher, student} × {2d, 3d} with prefixed keys.
"""
from __future__ import annotations

import logging
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core import geometry
from ..data import kitti
from ..data.loader import epoch_batches
from ..eval.kitti_eval import kitti_eval
from ..models.frcnn.faster_rcnn import FasterRCNN
from ..models.pvrcnn.pvrcnn import PVRCNN, post_processing
from ..ops import voxelize


def _gt_annos_from_dataset(ds: kitti.KittiDataset):
    out = []
    for info in ds.infos:
        annos = info["annos"]
        calib = kitti.calib_from_info(info)
        boxes, labels, keep = kitti.annos_to_lidar_boxes(annos, calib)
        n_all = len(annos["name"])
        boxes_full = np.zeros((n_all, 7), np.float32)
        boxes_full[:len(boxes)] = boxes  # DontCare rows (excluded) zeroed
        out.append(dict(name=annos["name"], bbox=annos["bbox"],
                        occluded=annos["occluded"],
                        truncated=annos["truncated"],
                        alpha=annos["alpha"], boxes3d=boxes_full))
    return out


def eval_pvrcnn(model: PVRCNN, variables, ds, collate_fn, vox_spec,
                batch_size=2, max_dets=100, score_thresh=0.1):
    """3D eval: inference + post-processing + AP (bbox from projection).

    ``score_thresh`` is the pre-NMS confidence floor (reference default
    0.1, ``detector3d_template.py:176-309``); AP sweeps thresholds over
    the surviving detections, so a hard floor above the model's score
    range truncates the PR curve to AP=0 — pass a low value when
    evaluating small/early-training models (e.g. the learning study).
    """
    jfwd = _jit_pvrcnn_fwd(model, float(score_thresh))
    det_annos = []
    for batch_np, true in epoch_batches(ds, batch_size, collate_fn):
        batch = jax.tree.map(jnp.asarray, batch_np)
        vox = jax.vmap(lambda p, v: voxelize.voxelize_mean(p, v, vox_spec))(
            batch["points"], batch["points_valid"])
        batch = dict(batch, voxel_features=vox["features"],
                     voxel_keys=vox["keys"])
        post = jax.device_get(jfwd(variables, batch))
        for i in range(true):
            v = post["valid"][i]
            boxes = post["boxes"][i][v][:max_dets]
            bb2d, ok = geometry.boxes_3d_to_2d(
                boxes, batch_np["lidar2img"][i],
                img_shape=batch_np["ori_shape"][i])
            calib = kitti.calib_from_info(ds.infos[len(det_annos)])
            cam = np.asarray(geometry.boxes_lidar_to_camera(
                boxes, calib.lidar_to_rect)) if len(boxes) else \
                np.zeros((0, 7), np.float32)
            # observation angle (reference bbox2result_kitti,
            # kitti_dataset.py:500-501)
            alpha = (-np.arctan2(-boxes[:, 1], boxes[:, 0]) + cam[:, 6]
                     ).astype(np.float32)
            det_annos.append(dict(
                labels=(post["labels"][i][v][:max_dets] - 1
                        ).astype(np.int32),
                scores=post["scores"][i][v][:max_dets],
                bbox=np.asarray(bb2d), boxes3d=boxes, alpha=alpha))
    gt_annos = _gt_annos_from_dataset(ds)
    _warn_if_no_dets(det_annos, "3d", score_thresh)
    res = kitti_eval(gt_annos, det_annos, metrics=("bbox", "bev", "3d"),
                     compute_aos=True)
    return res, det_annos


_JIT_CACHE: Dict[tuple, object] = {}


def _config_key(model):
    """Canonical, collision-free key for a flax module's CONFIG.

    ``repr(model)`` is value-complete only for scalar/tuple/dict fields;
    numpy arrays (repr truncates with '...') or arbitrary objects with
    lossy reprs could let two differently-configured models collide and
    silently share a program with the other's config baked in. So the
    key is built from the dataclass fields directly, and any field type
    this encoder does not PROVABLY serialize faithfully raises instead
    of degrading to repr."""
    import dataclasses

    def enc(v):
        if v is None or isinstance(v, (bool, int, float, str)):
            return v
        if isinstance(v, (tuple, list)):
            return ("seq",) + tuple(enc(x) for x in v)
        if isinstance(v, dict):
            return ("map",) + tuple(sorted(
                (str(k), enc(x)) for k, x in v.items()))
        if isinstance(v, type) or isinstance(v, np.dtype):
            return ("dtype", np.dtype(v).str)
        raise TypeError(
            f"unhashable eval-cache config field {v!r} ({type(v)}); "
            f"extend _config_key or the cache may silently collide")

    fields = {f.name: getattr(model, f.name)
              for f in dataclasses.fields(model)
              if f.name not in ("parent", "name")}
    return (type(model).__name__, enc(fields))


def _jit_cached(tag, model, key_extra, make):
    """One jitted eval program per (model CONFIG, extras) — weights enter
    as a TRACED argument, not a closure constant. Closure-captured
    variables bake the weight values into the HLO, so every eval of a
    different checkpoint (teacher vs student, init vs trained) forced a
    full re-compile — ~16 min per eval fanout on the remote-compile
    tunnel, where compiled programs are never persisted across or within
    processes. The key is the module's canonically-encoded config
    (:func:`_config_key`), letting equal-config models share one program
    across build() calls (module apply is pure, so which equal-config
    instance traced it is irrelevant)."""
    key = (tag, _config_key(model), key_extra)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        if len(_JIT_CACHE) > 32:  # bound: configs are few in practice
            _JIT_CACHE.pop(next(iter(_JIT_CACHE)))
        fn = _JIT_CACHE[key] = make()
    else:  # LRU, not FIFO: a hit keeps hot programs resident
        _JIT_CACHE[key] = _JIT_CACHE.pop(key)
    return fn


def _jit_pvrcnn_fwd(model, score_thresh):
    return _jit_cached(
        "pvrcnn", model, score_thresh,
        lambda: jax.jit(lambda v, b: post_processing(
            model.apply(v, b, train=False), score_thresh=score_thresh)))


def _jit_frcnn_fwd(model, score_thr):
    return _jit_cached(
        "frcnn", model, score_thr,
        lambda: jax.jit(lambda v, img, shp: model.apply(
            v, img, shp, score_thr=score_thr,
            method=FasterRCNN.simple_test)))


def _warn_if_no_dets(det_annos, tag, floor):
    """Self-report the score-floor trap: a floor above the model's score
    range hard-zeroes AP by truncating the PR curve (the failure mode of
    the round-3 learning study); make it diagnosable at the source."""
    if det_annos and not any(len(d["scores"]) for d in det_annos):
        logging.warning(
            "eval[%s]: ZERO detections survived the score floor %.3g on "
            "all %d images — AP will be exactly 0. If the model is weak/"
            "early-training, lower the floor (score_thresh/score_thr).",
            tag, floor, len(det_annos))


def eval_frcnn(model: FasterRCNN, variables, ds, collate_fn,
               batch_size=2, score_thr=0.05):
    """2D eval: simple_test + bbox AP. ``score_thr`` as in
    :func:`eval_pvrcnn` (mmdet simple-test default 0.05)."""
    jfwd = _jit_frcnn_fwd(model, float(score_thr))
    det_annos = []
    for batch_np, true in epoch_batches(ds, batch_size, collate_fn):
        res = jax.device_get(jfwd(variables, jnp.asarray(batch_np["img"]),
                                  jnp.asarray(batch_np["img_shape"])))
        for i in range(true):
            v = res["valid"][i]
            # map boxes back to ori frame via the recorded 2D scale
            sf = batch_np["aug2d"].scale[i]
            det_annos.append(dict(
                labels=res["labels"][i][v].astype(np.int32),
                scores=res["scores"][i][v],
                bbox=res["boxes"][i][v] / sf[None],
                boxes3d=np.zeros((int(v.sum()), 7), np.float32)))
    gt_annos = _gt_annos_from_dataset(ds)
    _warn_if_no_dets(det_annos, "2d", score_thr)
    res = kitti_eval(gt_annos, det_annos, metrics=("bbox",))
    return res, det_annos


def eval_ssl(ssl, state, ds, collate_fn, vox_spec, batch_size=2,
             score_thresh_3d=0.1, score_thr_2d=0.05, return_dets=False):
    """SSL fanout: {tea, stu} × {3d, 2d} prefixed metrics
    (reference ``kitti_dataset.py:320-372``). Also reports
    ``<branch>.<dim>.num_dets`` (mean detections/image) so an AP=0
    result is diagnosable (no detections vs. bad localization).
    With ``return_dets`` also returns {'tea.3d': [...], ...} raw per-image
    det annos (for the KITTI submission writer)."""
    out: Dict[str, float] = {}
    dets: Dict[str, list] = {}
    for branch in ("teacher", "student"):
        v3 = state[branch]["det3d"]
        res3, det3 = eval_pvrcnn(ssl.pvrcnn, v3, ds, collate_fn, vox_spec,
                                 batch_size, score_thresh=score_thresh_3d)
        out.update({f"{branch[:3]}.3d.{k}": v for k, v in res3.items()})
        out[f"{branch[:3]}.3d.num_dets"] = float(
            np.mean([len(d["scores"]) for d in det3]))
        dets[f"{branch[:3]}.3d"] = det3
        v2 = state[branch]["det2d"]
        res2, det2 = eval_frcnn(ssl.frcnn, v2, ds, collate_fn, batch_size,
                                score_thr=score_thr_2d)
        out.update({f"{branch[:3]}.2d.{k}": v for k, v in res2.items()})
        out[f"{branch[:3]}.2d.num_dets"] = float(
            np.mean([len(d["scores"]) for d in det2]))
        dets[f"{branch[:3]}.2d"] = det2
    return (out, dets) if return_dets else out


def recalibrate_batch_stats(model, variables, batches, rng=None,
                            passes=300):
    """Refresh BatchNorm running statistics with frozen parameters.

    Runs train-mode forwards that mutate ONLY the ``batch_stats``
    collection. With the reference's BN momentum 0.01 the running
    estimate is an exponential average with a ~100-iteration window
    (``new = 0.99*old + 0.01*batch``), so a checkpoint whose last
    training phase was short or fast-moving evaluates with stale
    statistics — observed as eval-mode detections degrading into
    garbage while train-mode forwards on the same inputs are accurate.
    The reference sidesteps this by pretraining 30k-60k iterations
    (``pretrain_pvrcnn/split_0.py``: 40 epochs); for short runs (the
    learning study, quick fine-tunes) an explicit recalibration pass is
    the standard remedy.

    Args:
        model: flax module with ``apply(vars, batch, train=True)``.
        variables: dict with 'params' (+ 'batch_stats').
        batches: sequence of voxelized batches to cycle through.
        passes: total forward passes (~3x the 1/momentum window).
    Returns:
        variables with refreshed 'batch_stats'.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)

    @jax.jit
    def step(v, b):
        _, mut = model.apply(v, b, train=True,
                             rngs={"sampling": rng, "dropout": rng},
                             mutable=["batch_stats"])
        return mut["batch_stats"]

    variables = dict(variables)
    batches = list(batches)
    for k in range(passes):
        variables["batch_stats"] = step(variables, batches[k % len(batches)])
    jax.block_until_ready(variables["batch_stats"])
    return variables
