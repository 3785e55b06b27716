"""Fixed-shape collation: pipeline results dicts → model-ready batches.

The reference relies on dynamic per-sample tensor lists (mmcv collate +
DataContainer); on TPU every buffer is padded to a static capacity with a
validity mask. Voxelization runs on-device inside the jitted step
(:mod:`detmatch_tpu.ops.voxelize`), so the host only pads and stacks.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from ..core.transforms import Aug2D, Aug3D
from .pipelines import build_aug_records


def _pad_rows(arr, cap, width=None):
    arr = np.asarray(arr, np.float32)
    if arr.ndim == 1:
        arr = arr.reshape(-1, width or 1)
    n = min(len(arr), cap)
    out = np.zeros((cap,) + arr.shape[1:], arr.dtype)
    out[:n] = arr[:n]
    valid = np.zeros((cap,), bool)
    valid[:n] = True
    return out, valid


def collate_view(samples: Sequence[Dict], max_points=18000, max_gt=40,
                 with_gt=True) -> Dict[str, np.ndarray]:
    """Collate one view (stu or tea) into fixed-shape arrays."""
    b = len(samples)
    out: Dict[str, np.ndarray] = {}

    pts = np.zeros((b, max_points, 4), np.float32)
    pts_valid = np.zeros((b, max_points), bool)
    for i, s in enumerate(samples):
        p = s["points"][:max_points]
        pts[i, :len(p)] = p
        pts_valid[i, :len(p)] = True
    out["points"] = pts
    out["points_valid"] = pts_valid

    out["img"] = np.stack([s["img"] for s in samples]).astype(np.float32)
    out["img_shape"] = np.stack(
        [np.asarray(s["img_shape"], np.float32) for s in samples])
    out["ori_shape"] = np.stack(
        [np.asarray(s["ori_shape"][:2], np.float32) for s in samples])
    out["lidar2img"] = np.stack(
        [np.asarray(s["lidar2img"], np.float32) for s in samples])

    recs3d, recs2d = zip(*[build_aug_records(s) for s in samples])
    out["aug3d"] = Aug3D(
        flip_x=np.stack([r["flip_x"] for r in recs3d]),
        rot=np.stack([r["rot"] for r in recs3d]),
        scale=np.stack([r["scale"] for r in recs3d]),
        trans=np.stack([r["trans"] for r in recs3d]),
    )
    out["aug2d"] = Aug2D(
        scale=np.stack([r["scale"] for r in recs2d]),
        flip=np.stack([r["flip"] for r in recs2d]),
        img_w=np.stack([r["img_w"] for r in recs2d]),
    )

    if with_gt and "gt_bboxes_3d" in samples[0]:
        gt = np.zeros((b, max_gt, 8), np.float32)
        for i, s in enumerate(samples):
            boxes = np.asarray(s["gt_bboxes_3d"], np.float32)[:max_gt]
            labels = np.asarray(s["gt_labels_3d"], np.int32)[:max_gt]
            n = len(boxes)
            gt[i, :n, :7] = boxes
            gt[i, :n, 7] = labels + 1  # 1-based classes, 0 = padding
        out["gt_boxes"] = gt

        g2 = np.zeros((b, max_gt, 4), np.float32)
        l2 = np.zeros((b, max_gt), np.int32)
        v2 = np.zeros((b, max_gt), bool)
        for i, s in enumerate(samples):
            bb = np.asarray(s.get("gt_bboxes",
                                  np.zeros((0, 4))), np.float32)[:max_gt]
            ll = np.asarray(s.get("gt_labels",
                                  np.zeros((0,))), np.int32)[:max_gt]
            g2[i, :len(bb)] = bb
            l2[i, :len(ll)] = ll
            v2[i, :len(bb)] = True
        out["gt_boxes2d"] = g2
        out["gt_labels2d"] = l2
        out["gt2d_valid"] = v2
    return out


def collate_ts(samples: Sequence[Dict], **kw):
    """Collate TSDataset outputs: {'stu': view, 'tea': view}."""
    kw.pop("with_gt", None)
    return dict(
        stu=collate_view([s["stu"] for s in samples], with_gt=True, **kw),
        tea=collate_view([s["tea"] for s in samples], with_gt=False, **kw),
    )
