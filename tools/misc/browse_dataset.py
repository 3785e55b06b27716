#!/usr/bin/env python
"""Render dataset samples after the training pipeline (reference
``tools/misc/browse_dataset.py``): BEV + image views with gt boxes.

Usage: python tools/misc/browse_dataset.py CONFIG --out-dir vis [--n 5]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--out-dir", default="browse_vis")
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--split", default="train_lab",
                    help="data key: train_lab / train_unlab / train / val")
    args = ap.parse_args()

    import cv2
    from detmatch_tpu.apis import build
    from detmatch_tpu.config import Config
    from detmatch_tpu.utils.visualize import (bev_canvas, denormalize_caffe,
                                              draw_boxes_2d)

    cfg = Config.fromfile(args.config)
    rng = np.random.RandomState(0)
    data_cfg = cfg["data"].get(args.split) or cfg["data"]["val"]
    ds = build.build_dataset(data_cfg, rng=rng)
    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(min(args.n, len(ds))):
        s = ds[i]
        if "stu" in s:  # TSDataset
            s = s["stu"]
        bev = bev_canvas(s["points"],
                         [(s.get("gt_bboxes_3d"), None)])
        cv2.imwrite(os.path.join(args.out_dir, f"{i}_bev.png"), bev)
        img = denormalize_caffe(s["img"])
        if "gt_bboxes" in s:
            img = draw_boxes_2d(img, s["gt_bboxes"],
                                labels=s.get("gt_labels"))
        cv2.imwrite(os.path.join(args.out_dir, f"{i}_img.png"), img)
    print(f"wrote {min(args.n, len(ds))} samples to {args.out_dir}")


if __name__ == "__main__":
    main()
