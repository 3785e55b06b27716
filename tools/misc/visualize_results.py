#!/usr/bin/env python
"""Render saved detection results over the dataset (reference
``tools/misc/visualize_results.py``): reads a KITTI-format submission
directory (``tools/test.py --out-kitti``) or a results .json/.pkl, draws
2D boxes on each image and 3D boxes on a BEV canvas, writes PNGs.

Usage:
    python tools/misc/visualize_results.py CONFIG --results DIR_OR_FILE \
        --out-dir vis/ [--score-thr 0.3] [--max-frames 20]
"""
import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def load_results(path, infos):
    """→ list of internal det dicts aligned with infos."""
    from detmatch_tpu.data import kitti
    from detmatch_tpu.eval.kitti_format import (kitti_anno_to_internal,
                                                read_kitti_txt)
    if os.path.isdir(path):
        dets = []
        for info in infos:
            idx = info["image"]["image_idx"]
            p = os.path.join(path, f"{int(idx):06d}.txt")
            calib = kitti.calib_from_info(info)
            if os.path.exists(p):
                dets.append(kitti_anno_to_internal(read_kitti_txt(p),
                                                   calib))
            else:
                dets.append(dict(labels=np.zeros(0, np.int32),
                                 scores=np.zeros(0, np.float32),
                                 bbox=np.zeros((0, 4), np.float32),
                                 boxes3d=np.zeros((0, 7), np.float32)))
        return dets
    with open(path, "rb") as f:
        return pickle.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--results", required=True)
    ap.add_argument("--out-dir", default="vis")
    ap.add_argument("--score-thr", type=float, default=0.3)
    ap.add_argument("--max-frames", type=int, default=20)
    args = ap.parse_args()

    import cv2
    from detmatch_tpu.apis import build
    from detmatch_tpu.config import Config
    from detmatch_tpu.core import geometry
    from detmatch_tpu.data import kitti
    from detmatch_tpu.utils.visualize import bev_canvas, draw_boxes_2d

    cfg = Config.fromfile(args.config)
    ds = build.build_dataset(cfg["data"]["val"],
                             rng=np.random.RandomState(0))
    dets = load_results(args.results, ds.infos)
    os.makedirs(args.out_dir, exist_ok=True)
    pcr = cfg.get("point_cloud_range",
                  (0.0, -40.0, -3.0, 70.4, 40.0, 1.0))

    n = min(len(ds.infos), args.max_frames)
    for i in range(n):
        info, det = ds.infos[i], dets[i]
        keep = det["scores"] >= args.score_thr
        idx = info["image"]["image_idx"]
        img_path = os.path.join(ds.root, "training", "image_2",
                                f"{int(idx):06d}.png")
        if os.path.exists(img_path):
            img = cv2.imread(img_path)
            img = draw_boxes_2d(img, det["bbox"][keep],
                                labels=det["labels"][keep],
                                scores=det["scores"][keep])
            cv2.imwrite(os.path.join(args.out_dir,
                                     f"{int(idx):06d}_img.png"), img)
        pts = kitti.load_points(ds.root, info)
        bev = bev_canvas(pts, [(det["boxes3d"][keep], None)],
                         point_cloud_range=pcr)
        cv2.imwrite(os.path.join(args.out_dir,
                                 f"{int(idx):06d}_bev.png"), bev)
    print(f"wrote {n} frames to {args.out_dir}")


if __name__ == "__main__":
    main()
