#!/usr/bin/env python
"""Multi-modality inference demo (reference ``demo/multi_modality_demo.py``):
run an SSL (2D+3D) checkpoint on one KITTI frame — points AND image —
and save a side-by-side visualization: 3D detections projected onto the
image + drawn 2D detections, and a BEV canvas of the 3D boxes.

Usage:
    python demo/multi_modality_demo.py CONFIG CKPT_DIR --pts x.bin \
        --img x.png --calib x.txt [--out demo_mm.png] [--branch teacher]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("checkpoint")
    ap.add_argument("--pts", required=True)
    ap.add_argument("--img", required=True)
    ap.add_argument("--calib", required=True)
    ap.add_argument("--out", default="demo_mm.png")
    ap.add_argument("--score-thr", type=float, default=0.3)
    ap.add_argument("--branch", default="teacher",
                    choices=("teacher", "student"))
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    from detmatch_tpu.apis import build
    from detmatch_tpu.config import Config
    from detmatch_tpu.core import geometry
    from detmatch_tpu.data import kitti
    from detmatch_tpu.models.frcnn.faster_rcnn import FasterRCNN
    from detmatch_tpu.models.pvrcnn.pvrcnn import PVRCNN, post_processing
    from detmatch_tpu.ops import voxelize
    from detmatch_tpu.train import checkpoints
    from detmatch_tpu.utils.visualize import bev_canvas, draw_boxes_2d

    cfg = Config.fromfile(args.config)
    ssl = build.build_ssl(cfg)
    vox_spec = build.build_voxelizer(cfg["voxelizer"])
    calib = kitti.read_calib(args.calib)

    # ---- points → voxels ----
    pts = np.fromfile(args.pts, np.float32).reshape(-1, 4)
    cap = 18000
    p = np.zeros((1, cap, 4), np.float32)
    v = np.zeros((1, cap), bool)
    p[0, :min(len(pts), cap)] = pts[:cap]
    v[0, :min(len(pts), cap)] = True
    vx = jax.vmap(lambda x, m: voxelize.voxelize_mean(x, m, vox_spec))(
        jnp.asarray(p), jnp.asarray(v))
    batch3d = dict(points=jnp.asarray(p), points_valid=jnp.asarray(v),
                   voxel_features=vx["features"], voxel_keys=vx["keys"])

    # ---- image → padded canvas (caffe BGR normalization) ----
    img_bgr = cv2.imread(args.img).astype(np.float32)
    ch, cw = ssl.frcnn.canvas
    s = min(ch / img_bgr.shape[0], cw / img_bgr.shape[1])
    nh, nw = int(img_bgr.shape[0] * s), int(img_bgr.shape[1] * s)
    resized = cv2.resize(img_bgr, (nw, nh))
    mean = np.array([103.530, 116.280, 123.675], np.float32)
    canvas = np.zeros((1, ch, cw, 3), np.float32)
    canvas[0, :nh, :nw] = resized - mean[None, None]
    img_shape = np.array([[nh, nw]], np.float32)

    step = checkpoints.latest_step(args.checkpoint)
    payload = checkpoints.restore(args.checkpoint, step, dict(state=None))
    branch = payload["state"][args.branch]

    out3d = ssl.pvrcnn.apply(branch["det3d"], batch3d, train=False)
    post = jax.device_get(post_processing(out3d))
    keep = post["valid"][0] & (post["scores"][0] > args.score_thr)
    boxes3d = post["boxes"][0][keep]

    res2d = jax.device_get(ssl.frcnn.apply(
        branch["det2d"], jnp.asarray(canvas), jnp.asarray(img_shape),
        score_thr=args.score_thr, method=FasterRCNN.simple_test))
    k2 = res2d["valid"][0] & (res2d["scores"][0] > args.score_thr)
    boxes2d = res2d["boxes"][0][k2] / s  # back to ori pixels
    print(f"3D: {int(keep.sum())} dets, 2D: {int(k2.sum())} dets "
          f"above {args.score_thr}")

    # ---- render: image with projected 3D (green) + 2D (red) boxes ----
    vis = cv2.imread(args.img)
    if len(boxes3d):
        bb, ok = geometry.boxes_3d_to_2d(
            boxes3d, calib.lidar2img,
            img_shape=np.array(vis.shape[:2], np.float32))
        vis = draw_boxes_2d(vis, np.asarray(bb), valid=np.asarray(ok))
    vis = draw_boxes_2d(vis, boxes2d,
                        labels=np.asarray(res2d["labels"][0][k2]),
                        scores=np.asarray(res2d["scores"][0][k2]))
    bev = bev_canvas(pts, [(boxes3d, None)],
                     point_cloud_range=cfg["voxelizer"]
                     ["point_cloud_range"])
    h = max(vis.shape[0], bev.shape[0])
    pad = lambda im: np.pad(im, ((0, h - im.shape[0]), (0, 0), (0, 0)))
    cv2.imwrite(args.out, np.concatenate([pad(vis), pad(bev)], axis=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
