"""Visualization: BEV canvas and image-space box rendering (host-side).

Mirrors the reference's Vis3D / Vis2D_Kitti SSL consumers
(``ssl_modules/consumers/visualize.py:40-310``) and the core visualizer:
teacher/student boxes drawn over a BEV occupancy canvas or the camera
image; outputs are uint8 arrays a logger can write as images.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from ..core import geometry

CLASS_COLORS = ((66, 135, 245), (245, 179, 66), (66, 245, 114))  # BGR-ish


def bev_canvas(points, boxes_list, colors=None,
               point_cloud_range=(0, -40, -3, 70.4, 40, 1),
               canvas_hw=(800, 704)):
    """Render points + box sets onto a BEV canvas.

    Args:
        points: (N, 3+) lidar points.
        boxes_list: sequence of (boxes (M, 7), valid (M,) or None) sets.
    Returns:
        (H, W, 3) uint8.
    """
    import cv2
    h, w = canvas_hw
    pcr = np.asarray(point_cloud_range, np.float32)
    img = np.zeros((h, w, 3), np.uint8)

    def to_px(xy):
        u = (xy[:, 0] - pcr[0]) / (pcr[3] - pcr[0]) * (h - 1)
        v = (xy[:, 1] - pcr[1]) / (pcr[4] - pcr[1]) * (w - 1)
        return np.stack([v, (h - 1) - u], axis=-1).astype(np.int32)

    if points is not None and len(points):
        px = to_px(points[:, :2])
        ok = ((px[:, 0] >= 0) & (px[:, 0] < w)
              & (px[:, 1] >= 0) & (px[:, 1] < h))
        img[px[ok, 1], px[ok, 0]] = (90, 90, 90)

    colors = colors or [(0, 255, 0), (0, 128, 255), (255, 64, 64)]
    for si, entry in enumerate(boxes_list):
        boxes, valid = entry if isinstance(entry, tuple) else (entry, None)
        if boxes is None or len(boxes) == 0:
            continue
        corners = np.asarray(geometry.boxes_to_corners_bev(
            np.asarray(boxes, np.float32)))
        for i, c in enumerate(corners):
            if valid is not None and not valid[i]:
                continue
            px = to_px(c)
            cv2.polylines(img, [px.reshape(-1, 1, 2)], True,
                          colors[si % len(colors)], 1)
    return img


def draw_boxes_2d(img_bgr, boxes, labels=None, scores=None, valid=None,
                  thickness=1):
    """Draw xyxy boxes on an image (uint8 BGR, copied)."""
    import cv2
    out = np.ascontiguousarray(np.asarray(img_bgr, np.uint8).copy())
    boxes = np.asarray(boxes)
    for i, b in enumerate(boxes):
        if valid is not None and not valid[i]:
            continue
        color = CLASS_COLORS[int(labels[i]) % 3] if labels is not None \
            else (0, 255, 0)
        p1, p2 = (int(b[0]), int(b[1])), (int(b[2]), int(b[3]))
        cv2.rectangle(out, p1, p2, color, thickness)
        if scores is not None:
            cv2.putText(out, f"{float(scores[i]):.2f}",
                        (p1[0], max(p1[1] - 2, 8)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.35, color, 1)
    return out


def denormalize_caffe(img, mean=(103.530, 116.280, 123.675)):
    """Invert the caffe normalization for display."""
    return np.clip(np.asarray(img) + np.asarray(mean), 0, 255
                   ).astype(np.uint8)


def matched_pair_canvas(img_bgr, boxes3d, boxes2d, valid, lidar2img,
                        img_shape, scores3d=None, scores2d=None):
    """Matched teacher 3D↔2D pair canvas (the reference's Vis2D_Kitti
    consumer, ``ssl_modules/consumers/visualize.py:40-310``): each
    fusion-matched pair drawn as the PROJECTED 3D box (green) and its
    matched 2D box (orange) joined center-to-center, annotated with both
    scores — the picture that makes bad matches obvious.

    Args:
        img_bgr: (H, W, 3) uint8; boxes3d: (M, 7) internal lidar boxes;
        boxes2d: (M, 4) xyxy; valid: (M,) pair validity;
        lidar2img: (4, 4); img_shape: (h, w).
    Returns:
        (H, W, 3) uint8.
    """
    import cv2
    out = np.ascontiguousarray(np.asarray(img_bgr, np.uint8).copy())
    boxes3d = np.asarray(boxes3d, np.float32)
    boxes2d = np.asarray(boxes2d, np.float32)
    if len(boxes3d) == 0:
        return out
    boxes_p, proj_valid = geometry.boxes_3d_to_2d(
        boxes3d, np.asarray(lidar2img, np.float32),
        np.asarray(img_shape, np.float32))
    boxes_p = np.asarray(boxes_p)
    if valid is None:
        valid = np.asarray(proj_valid)
    for i in range(len(boxes3d)):
        if valid is not None and not valid[i]:
            continue
        p3 = boxes_p[i]
        p2 = boxes2d[i]
        cv2.rectangle(out, (int(p3[0]), int(p3[1])),
                      (int(p3[2]), int(p3[3])), (0, 255, 0), 1)
        cv2.rectangle(out, (int(p2[0]), int(p2[1])),
                      (int(p2[2]), int(p2[3])), (0, 160, 255), 1)
        c3 = (int((p3[0] + p3[2]) / 2), int((p3[1] + p3[3]) / 2))
        c2 = (int((p2[0] + p2[2]) / 2), int((p2[1] + p2[3]) / 2))
        cv2.line(out, c3, c2, (255, 255, 255), 1)
        txt = []
        if scores3d is not None:
            txt.append(f"3d{float(np.max(scores3d[i])):.2f}")
        if scores2d is not None:
            txt.append(f"2d{float(np.max(scores2d[i])):.2f}")
        if txt:
            cv2.putText(out, " ".join(txt),
                        (c3[0], max(c3[1] - 4, 8)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.35, (255, 255, 255),
                        1)
    return out
