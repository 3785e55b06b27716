#!/usr/bin/env python
"""Monocular 3D detection demo (reference ``demo/mono_det_demo.py``):
run a CaDDN checkpoint on one image + calib, save a BEV visualization of
the predicted 3D boxes.

Usage:
    python demo/mono_demo.py CONFIG CKPT_DIR --img x.png --calib x.txt \
        [--out demo_mono.png]

CONFIG must define ``model.detector_mono`` (CaDDN kwargs) — see
``tests/test_caddn.py`` for the schema.
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
    ap.add_argument("--img", required=True)
    ap.add_argument("--calib", required=True)
    ap.add_argument("--out", default="demo_mono.png")
    ap.add_argument("--score-thr", type=float, default=0.3)
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    from detmatch_tpu.config import Config
    from detmatch_tpu.data import kitti
    from detmatch_tpu.models.pvrcnn.caddn import CaDDN
    from detmatch_tpu.models.pvrcnn.second import second_post_processing
    from detmatch_tpu.train import checkpoints
    from detmatch_tpu.utils.visualize import bev_canvas

    cfg = Config.fromfile(args.config)
    model = CaDDN(**cfg["model"]["detector_mono"])
    calib = kitti.read_calib(args.calib)

    img = cv2.imread(args.img)[:, :, ::-1].astype(np.float32)  # RGB
    batch = dict(
        images=jnp.asarray(img[None]),
        lidar2cam=jnp.asarray((calib.R0 @ calib.V2C)[None]),
        cam2img=jnp.asarray(calib.P2[:3][None]),
    )
    step = checkpoints.latest_step(args.checkpoint)
    payload = checkpoints.restore(args.checkpoint, step, dict(model=None))
    out = model.apply(payload["model"], batch, train=False)
    post = jax.device_get(second_post_processing(
        out, score_thresh=args.score_thr))
    keep = post["valid"][0]
    boxes = post["boxes"][0][keep]
    print(f"{int(keep.sum())} detections above {args.score_thr}")
    bev = bev_canvas(np.zeros((0, 4), np.float32), [(boxes, None)],
                     point_cloud_range=cfg["model"]["detector_mono"]
                     ["point_cloud_range"])
    cv2.imwrite(args.out, bev)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
