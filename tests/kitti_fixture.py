"""Synthetic mini-KITTI tree generator for tests (own fixture; mirrors the
reference's tests/data/kitti layout but generated, not copied)."""
import os

import numpy as np

CALIB_TXT = """P0: 707.0 0.0 604.0 0.0 0.0 707.0 180.0 0.0 0.0 0.0 1.0 0.0
P1: 707.0 0.0 604.0 0.0 0.0 707.0 180.0 0.0 0.0 0.0 1.0 0.0
P2: 707.0 0.0 604.0 45.75 0.0 707.0 180.0 -0.345 0.0 0.0 1.0 0.005
P3: 707.0 0.0 604.0 0.0 0.0 707.0 180.0 0.0 0.0 0.0 1.0 0.0
R0_rect: 0.9999 0.0098 -0.0074 -0.0099 0.9999 -0.0043 0.0074 0.0044 1.0
Tr_velo_to_cam: 0.0075 -0.9999 -0.0006 -0.0040 0.0148 0.0007 -0.9998 -0.0767 0.9998 0.0075 0.0148 -0.2717
Tr_imu_to_velo: 1.0 0.0 0.0 0.0 0.0 1.0 0.0 0.0 0.0 0.0 1.0 0.0
"""

# (class, cam-frame label fields): simple cars/peds in front of the camera
LABELS = [
    [
        "Car 0.0 0 -1.57 500 160 560 210 1.56 1.6 3.9 -2.0 1.7 15.0 -1.6",
        "Pedestrian 0.0 0 0.0 600 150 630 230 1.73 0.6 0.8 0.5 1.7 10.0 0.1",
        "DontCare -1 -1 -10 700 150 750 190 -1 -1 -1 -1000 -1000 -1000 -10",
    ],
    [
        "Car 0.0 0 1.0 420 160 520 220 1.5 1.7 4.0 -3.0 1.7 12.0 1.2",
        "Cyclist 0.0 0 0.5 640 155 680 225 1.7 0.6 1.8 2.0 1.7 11.0 0.4",
    ],
    [
        "Car 0.1 1 0.3 460 165 540 215 1.55 1.65 3.8 -1.5 1.68 18.0 0.3",
    ],
]


def make_kitti(root, n_frames=3, n_points=4000, seed=0):
    rng = np.random.RandomState(seed)
    sub = os.path.join(root, "training")
    for d in ("velodyne", "velodyne_reduced", "calib", "label_2", "image_2"):
        os.makedirs(os.path.join(sub, d), exist_ok=True)
    idxs = []
    for i in range(n_frames):
        idx = f"{i:06d}"
        idxs.append(idx)
        with open(os.path.join(sub, "calib", f"{idx}.txt"), "w") as f:
            f.write(CALIB_TXT)
        with open(os.path.join(sub, "label_2", f"{idx}.txt"), "w") as f:
            f.write("\n".join(LABELS[i % len(LABELS)]) + "\n")
        # points: uniform in front + clusters near labeled objects
        pts = np.concatenate([
            rng.rand(n_points, 1) * 40 + 1,      # x (forward)
            rng.rand(n_points, 1) * 30 - 15,     # y
            rng.rand(n_points, 1) * 2.5 - 2.0,   # z
            rng.rand(n_points, 1),               # intensity
        ], axis=1).astype(np.float32)
        # add dense clusters at approx object locations (lidar frame:
        # x≈cam_z, y≈−cam_x)
        for line in LABELS[i % len(LABELS)]:
            p = line.split()
            if p[0] == "DontCare":
                continue
            cz, cx = float(p[13]), float(p[11])
            center = np.array([cz, -cx, -0.9])
            cluster = center + rng.randn(300, 3) * np.array([0.8, 0.4, 0.3])
            cluster = np.concatenate(
                [cluster, rng.rand(300, 1)], axis=1).astype(np.float32)
            pts = np.concatenate([pts, cluster], axis=0)
        for d in ("velodyne", "velodyne_reduced"):
            pts.tofile(os.path.join(sub, d, f"{idx}.bin"))
        from PIL import Image
        img = (rng.rand(375, 1242, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(sub, "image_2", f"{idx}.png"))
    split = os.path.join(root, "train.txt")
    with open(split, "w") as f:
        f.write("\n".join(idxs) + "\n")
    return split
