#!/usr/bin/env python
"""Offline KITTI data preparation (reference ``tools/create_data.py``):
info pickles, reduced point clouds, and the GT database.

Usage:
    python tools/create_data.py kitti --root data/kitti \
        [--train-split ImageSets/train.txt] [--val-split ImageSets/val.txt]
"""
import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def create_reduced_point_cloud(root, infos):
    """Frustum-crop velodyne points to the camera FOV
    (reference ``kitti_converter.create_reduced_point_cloud``)."""
    from detmatch_tpu.data import kitti
    from detmatch_tpu.core import geometry
    out_dir = os.path.join(root, "training", "velodyne_reduced")
    os.makedirs(out_dir, exist_ok=True)
    for info in infos:
        pts = kitti.load_points(root, info)
        calib = kitti.calib_from_info(info)
        h, w = info["image"]["image_shape"][:2]
        uv, depth = geometry.project_to_image(pts[:, :3], calib.lidar2img)
        uv = np.asarray(uv)
        depth = np.asarray(depth)
        keep = ((depth > 0) & (uv[:, 0] >= 0) & (uv[:, 0] < w)
                & (uv[:, 1] >= 0) & (uv[:, 1] < h))
        name = os.path.basename(info["point_cloud"]["velodyne_path"])
        pts[keep].astype(np.float32).tofile(os.path.join(out_dir, name))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=["kitti"])
    ap.add_argument("--root", required=True)
    ap.add_argument("--train-split", default="ImageSets/train.txt")
    ap.add_argument("--val-split", default="ImageSets/val.txt")
    ap.add_argument("--skip-reduced", action="store_true")
    ap.add_argument("--skip-gt-db", action="store_true")
    ap.add_argument("--export-2d", action="store_true",
                    help="also export COCO-format 2D annotations "
                         "(reference kitti_converter.export_2d_annotation)")
    args = ap.parse_args()

    from detmatch_tpu.data import dbsampler, kitti
    for split_name, split_file in (("train", args.train_split),
                                   ("val", args.val_split)):
        path = os.path.join(args.root, split_file)
        if not os.path.exists(path):
            print(f"skip {split_name}: no {path}")
            continue
        infos = kitti.create_infos(args.root, path, training=True)
        out = os.path.join(args.root, f"kitti_infos_{split_name}.pkl")
        with open(out, "wb") as f:
            pickle.dump(infos, f)
        print(f"wrote {out} ({len(infos)} frames)")
        if split_name == "train":
            if not args.skip_reduced:
                create_reduced_point_cloud(args.root, infos)
                print("wrote reduced point clouds")
            if not args.skip_gt_db:
                dbsampler.create_gt_database(args.root, infos,
                                             classes=kitti.CLASS_NAMES)
                print("wrote gt database")
        if args.export_2d:
            kitti.export_2d_annotation(args.root, out)
            print(f"wrote 2D COCO annotations for {split_name}")


if __name__ == "__main__":
    main()
