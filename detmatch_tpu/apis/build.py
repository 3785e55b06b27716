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
    "PointsRangeFilter": pipelines.PointsRangeFilter,
    "ObjectRangeFilter": pipelines.ObjectRangeFilter,
    "PointShuffle": pipelines.PointShuffle,
    "PhotoMetricAugs": pipelines.PhotoMetricAugs,
    "Normalize": pipelines.Normalize,
    "PadToCanvas": pipelines.PadToCanvas,
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


def build_models(cfg: Dict[str, Any]):
    pv = PVRCNN(**cfg.get("detector_3d", {}))
    fr = FasterRCNN(**cfg.get("detector_2d", {}))
    return pv, fr


def build_ssl(cfg: Dict[str, Any]) -> SSLDetector:
    pv, fr = build_models(cfg["model"])
    ssl_cfg = SSLConfig(**cfg.get("ssl", {}))
    return SSLDetector(pv, fr, ssl_cfg)


def build_voxelizer(cfg: Dict[str, Any]) -> voxelize.VoxelizerSpec:
    return voxelize.VoxelizerSpec(
        point_cloud_range=tuple(cfg["point_cloud_range"]),
        voxel_size=tuple(cfg["voxel_size"]),
        max_voxels=cfg.get("max_voxels", 16000),
        max_points=cfg.get("max_points", 5))
