#!/usr/bin/env python
"""Point-cloud + image inference demo (reference ``demo/``): run a trained
PV-RCNN checkpoint on one KITTI frame, save a BEV visualization.

Usage:
    python demo/pcd_demo.py CONFIG CKPT_DIR --pts x.bin --calib x.txt \
        [--out demo_out.png]
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
    ap.add_argument("--calib", required=True)
    ap.add_argument("--out", default="demo_out.png")
    ap.add_argument("--score-thr", type=float, default=0.3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from detmatch_tpu.apis import build
    from detmatch_tpu.config import Config
    from detmatch_tpu.data import kitti
    from detmatch_tpu.models.pvrcnn.pvrcnn import PVRCNN, post_processing
    from detmatch_tpu.ops import voxelize
    from detmatch_tpu.train import checkpoints
    from detmatch_tpu.utils.visualize import bev_canvas

    cfg = Config.fromfile(args.config)
    model = PVRCNN(**cfg["model"]["detector_3d"])
    vox_spec = build.build_voxelizer(cfg["voxelizer"])

    pts = np.fromfile(args.pts, np.float32).reshape(-1, 4)
    cap = 18000
    p = np.zeros((1, cap, 4), np.float32)
    v = np.zeros((1, cap), bool)
    p[0, :min(len(pts), cap)] = pts[:cap]
    v[0, :min(len(pts), cap)] = True
    vox = jax.vmap(lambda x, m: voxelize.voxelize_mean(x, m, vox_spec))(
        jnp.asarray(p), jnp.asarray(v))
    batch = dict(points=jnp.asarray(p), points_valid=jnp.asarray(v),
                 voxel_features=vox["features"], voxel_keys=vox["keys"])

    step = checkpoints.latest_step(args.checkpoint)
    payload = checkpoints.restore(args.checkpoint, step, dict(model=None))
    out = model.apply(payload["model"], batch, train=False)
    post = jax.device_get(post_processing(out))
    keep = post["valid"][0] & (post["scores"][0] > args.score_thr)
    boxes = post["boxes"][0][keep]
    print(f"{keep.sum()} detections above {args.score_thr}")
    img = bev_canvas(pts, [(boxes, None)],
                     point_cloud_range=cfg["voxelizer"]["point_cloud_range"])
    import cv2
    cv2.imwrite(args.out, img)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
