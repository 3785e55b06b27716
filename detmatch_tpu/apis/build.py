"""Builders: config dicts → datasets / pipelines / models / SSL detector.

The user-facing API mirrors the reference's registry-driven construction
(``mmdet3d/models/builder.py``, dataset/pipeline registries) with a light
name→class mapping instead of a global registry.
"""
from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from ..data import collate, dbsampler, kitti, pipelines
from ..models.frcnn.faster_rcnn import FasterRCNN
from ..models.pvrcnn.pvrcnn import PVRCNN
from ..ops import voxelize
from ..ssl.detector import SSLConfig, SSLDetector

PIPELINE_REGISTRY = {
    "LoadPoints": pipelines.LoadPoints,
    "LoadImage": pipelines.LoadImage,
    "Resize": pipelines.Resize,
    "RandomFlip3D": pipelines.RandomFlip3D,
    "GlobalRotScaleTrans": pipelines.GlobalRotScaleTrans,
    "ObjectNoise": pipelines.ObjectNoise,
    "PointsRangeFilter": pipelines.PointsRangeFilter,
    "ObjectRangeFilter": pipelines.ObjectRangeFilter,
    "PointShuffle": pipelines.PointShuffle,
    "PhotoMetricAugs": pipelines.PhotoMetricAugs,
    "Normalize": pipelines.Normalize,
    "PadToCanvas": pipelines.PadToCanvas,
    "MultiScaleFlipAug3D": pipelines.MultiScaleFlipAug3D,
}


def build_pipeline(cfgs: List[Dict[str, Any]], root=None, rng=None):
    out = []
    rng = rng or np.random
    for cfg in cfgs:
        cfg = dict(cfg)
        t = cfg.pop("type")
        if t == "ObjectSample":
            sampler_cfg = dict(cfg.pop("db_sampler"))
            sampler = dbsampler.DataBaseSampler(
                root=sampler_cfg.pop("data_root", root),
                rng=rng, **sampler_cfg)
            out.append(dbsampler.ObjectSample(sampler, **cfg))
            continue
        cls = PIPELINE_REGISTRY[t]
        import inspect
        if "rng" in inspect.signature(cls.__init__).parameters:
            cfg["rng"] = rng
        out.append(cls(**cfg))
    return out


def build_dataset(cfg: Dict[str, Any], rng=None):
    cfg = dict(cfg)
    t = cfg.pop("type", "KittiDataset")
    if t == "TSDataset":
        base = build_dataset(cfg.pop("dataset"), rng=rng)
        return pipelines.TSDataset(
            base,
            build_pipeline(cfg.pop("shared_pipeline"), root=base.root,
                           rng=rng),
            build_pipeline(cfg.pop("student_pipeline"), root=base.root,
                           rng=rng),
            build_pipeline(cfg.pop("teacher_pipeline"), root=base.root,
                           rng=rng))
    assert t == "KittiDataset", t
    pipe = cfg.pop("pipeline", None)
    root = cfg.pop("data_root")
    ds = kitti.KittiDataset(root, cfg.pop("ann_file"), **cfg)
    if pipe is not None:
        ds.pipeline = pipelines.Compose(
            build_pipeline(pipe, root=root, rng=rng))
    return ds


def _detector_registry():
    from ..models.pvrcnn.caddn import CaDDN
    from ..models.pvrcnn.parta2 import PartA2
    from ..models.pvrcnn.pointpillars import PointPillars
    from ..models.pvrcnn.pointrcnn import PointRCNN
    from ..models.pvrcnn.second import SECOND, SECONDIoU
    from ..models.pvrcnn.voxelrcnn import VoxelRCNN
    return {
        "PVRCNN": PVRCNN, "SECOND": SECOND, "SECONDNetIoU": SECONDIoU,
        "PointPillar": PointPillars, "PartA2Net": PartA2,
        "PointRCNN": PointRCNN, "VoxelRCNN": VoxelRCNN, "CaDDN": CaDDN,
        "FasterRCNN": FasterRCNN,
    }


def build_detector(cfg: Dict[str, Any]):
    """Registry-style detector construction (reference
    ``pcdet/models/__init__.py:build_network`` /
    ``mmdet3d/models/builder.py``): ``dict(type='PVRCNN', ...)``."""
    cfg = dict(cfg)
    t = cfg.pop("type", "PVRCNN")
    if isinstance(cfg.get("compute_dtype"), str):
        import jax.numpy as jnp
        cfg["compute_dtype"] = jnp.dtype(cfg["compute_dtype"])
    return _detector_registry()[t](**cfg)


def build_models(cfg: Dict[str, Any]):
    pv = build_detector(dict(cfg.get("detector_3d", {})))
    fr_cfg = {k: v for k, v in cfg.get("detector_2d", {}).items()
              if k != "type"}
    if isinstance(fr_cfg.get("compute_dtype"), str):
        import jax.numpy as jnp
        fr_cfg["compute_dtype"] = jnp.dtype(fr_cfg["compute_dtype"])
    fr = FasterRCNN(**fr_cfg)
    return pv, fr


# Reference SSL module graph (``SSL_MODULES`` registry,
# ``mmdet3d/models/builder.py:14``) → SSLConfig switches. Each entry
# maps a reference module type to the config fields it sets; the
# functional pipeline in SSLDetector realizes the same dataflow.
def ssl_modules_to_config(modules: List[Dict[str, Any]]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for m in modules or []:
        m = dict(m)
        t = m.pop("type")
        if t == "MaxScoreFilter":
            thr = m.get("score_thr", 0.1)
            if m.get("is_3d", True):
                out["score_filter_3d"] = thr
            else:
                out["score_filter_2d"] = thr
        elif t == "FusionHungarianMatching":
            out["fusion"] = True
            if "cost_thr" in m:
                out["cost_thr"] = m["cost_thr"]
        elif t == "HungarianConsistency":
            out["consistency"] = True
            w = (m.get("cls_weight", 2.0), m.get("l1_weight", 20.0),
                 m.get("iou_weight", 2.0))
            out["consistency_weights"] = w
        elif t == "HardPseudoLabel_2D":
            out["enable_2d"] = True
            out["pseudo_score_thr_2d"] = m.get("score_thr", 0.1)
            out["hard_pseudo_2d_weight"] = m.get("weight", 4.0)
        elif t == "Opd_HardPseudoLabel_3D":
            out["enable_3d"] = True
            out["pseudo_score_thr_3d"] = m.get("score_thr", 0.1)
        elif t in ("Opd_SimpleTest_3D", "Opd_Supervised_3D"):
            out["enable_3d"] = True
        elif t in ("SimpleTest_2D", "TwoStageSupervised_2D",
                   "BboxesNMS_2D", "BboxesTransform_2D",
                   "BboxesTransform_3D", "DetachBboxes", "Bboxes3DTo2D",
                   "AverageBboxes_2D", "NumPreds", "Vis3D", "Vis2D_Kitti"):
            pass  # structural steps always present in the fused pipeline
        else:
            raise KeyError(f"unknown SSL module type: {t}")
    return out


def build_ssl(cfg: Dict[str, Any]) -> SSLDetector:
    pv, fr = build_models(cfg["model"])
    ssl_kwargs = dict(cfg.get("ssl", {}))
    for key in ("lab_modules", "unlab_modules"):
        ssl_kwargs.update(ssl_modules_to_config(
            cfg["model"].get(key, [])))
    ssl_cfg = SSLConfig(**ssl_kwargs)
    return SSLDetector(pv, fr, ssl_cfg)


def build_voxelizer(cfg: Dict[str, Any]) -> voxelize.VoxelizerSpec:
    return voxelize.VoxelizerSpec(
        point_cloud_range=tuple(cfg["point_cloud_range"]),
        voxel_size=tuple(cfg["voxel_size"]),
        max_voxels=cfg.get("max_voxels", 16000),
        max_points=cfg.get("max_points", 5))
