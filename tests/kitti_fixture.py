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


# ---------------------------------------------------------------------------
# Randomized scenes — for learning studies (train/val generalization needs
# varied object placements, not the 3 fixed frames above)
# ---------------------------------------------------------------------------

CLASS_DIMS = {  # (l, w, h) lidar-frame
    "Car": (3.9, 1.6, 1.56),
    "Pedestrian": (0.8, 0.6, 1.73),
    "Cyclist": (1.76, 0.6, 1.73),
}
CLASS_COLOR = {  # rendered into image_2 so the 2D branch has signal
    "Car": (220, 40, 40),
    "Pedestrian": (40, 220, 40),
    "Cyclist": (40, 40, 220),
}


def _calib_mats():
    vals = {}
    for line in CALIB_TXT.strip().splitlines():
        k, v = line.split(":", 1)
        vals[k] = np.fromstring(v, sep=" ", dtype=np.float32)
    P2 = vals["P2"].reshape(3, 4)
    R0 = np.eye(4, dtype=np.float32)
    R0[:3, :3] = vals["R0_rect"].reshape(3, 3)
    Tr = np.eye(4, dtype=np.float32)
    Tr[:3, :4] = vals["Tr_velo_to_cam"].reshape(3, 4)
    return P2, R0, Tr


def make_kitti_random(root, n_frames, seed=0, split="train",
                      n_points=2500, x_range=(4.0, 14.0),
                      max_objects=3, start_idx=0,
                      classes=("Car", "Pedestrian", "Cyclist"),
                      yaw_range=(-np.pi, np.pi)):
    """Generate ``n_frames`` randomized scenes under ``root``.

    Each scene: 1..max_objects objects at random non-overlapping BEV
    positions inside the tiny-config point-cloud range, a point cloud of
    uniform background + dense uniform points INSIDE each box, and an
    image with a class-colored rectangle rendered at each object's
    projected 2D bbox (so both branches have learnable signal). Labels
    are derived from the 3D boxes through the real calib chain
    (``geometry.boxes_lidar_to_camera`` + corner projection), i.e. the
    exact inverse of what ``data/kitti.py`` applies on load.
    """
    import sys as _sys
    _sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), ".."))
    from detmatch_tpu.core import geometry
    from PIL import Image

    rng = np.random.RandomState(seed)
    P2, R0, Tr = _calib_mats()
    r0_v2c = (R0 @ Tr).astype(np.float32)
    P2_4 = np.eye(4, dtype=np.float32)
    P2_4[:3] = P2
    proj = (P2_4 @ R0 @ Tr).astype(np.float32)  # lidar -> pixels

    sub = os.path.join(root, "training")
    for d in ("velodyne", "velodyne_reduced", "calib", "label_2",
              "image_2"):
        os.makedirs(os.path.join(sub, d), exist_ok=True)

    idxs = []
    for fi in range(n_frames):
        idx = f"{start_idx + fi:06d}"
        idxs.append(idx)
        # ---- sample non-overlapping boxes (lidar frame) ----
        names, boxes = [], []
        for _ in range(rng.randint(1, max_objects + 1)):
            name = classes[rng.randint(len(classes))]
            l, w, h = CLASS_DIMS[name]
            for _try in range(30):
                x = rng.uniform(*x_range)
                # keep |cam x| / z < ~0.55 so the object projects into
                # the image
                y = rng.uniform(-1, 1) * min(5.0, 0.5 * x)
                cand = np.array([x, y, -1.0, l, w, h,
                                 rng.uniform(*yaw_range)],
                                np.float32)
                if all(np.linalg.norm(cand[:2] - b[:2]) >
                       0.7 * (max(l, w) + max(b[3], b[4]))
                       for b in boxes):
                    boxes.append(cand)
                    names.append(name)
                    break
        boxes = np.stack(boxes).astype(np.float32)

        # ---- 2D bboxes from projected corners ----
        corners = np.asarray(geometry.boxes_to_corners_3d(boxes))  # (N,8,3)
        uvw = np.concatenate(
            [corners, np.ones_like(corners[..., :1])], -1) @ proj.T
        uv = uvw[..., :2] / np.maximum(uvw[..., 2:3], 1e-3)
        x1y1 = uv.min(axis=1)
        x2y2 = uv.max(axis=1)
        bb2d = np.concatenate([np.clip(x1y1, 0, [1242, 375]),
                               np.clip(x2y2, 0, [1242, 375])], axis=1)

        # ---- label file (camera-frame, exact inverse of the loader) ----
        cam = np.asarray(geometry.boxes_lidar_to_camera(boxes, r0_v2c))
        lines = []
        for n, c2, c3 in zip(names, bb2d, cam):
            x, y, z, l, h, w, ry = c3
            alpha = float(ry - np.arctan2(x, z))
            lines.append(
                f"{n} 0.00 0 {alpha:.2f} "
                f"{c2[0]:.2f} {c2[1]:.2f} {c2[2]:.2f} {c2[3]:.2f} "
                f"{h:.2f} {w:.2f} {l:.2f} "
                f"{x:.2f} {y:.2f} {z:.2f} {ry:.2f}")
        with open(os.path.join(sub, "label_2", f"{idx}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        with open(os.path.join(sub, "calib", f"{idx}.txt"), "w") as f:
            f.write(CALIB_TXT)

        # ---- points: uniform background + dense interior points ----
        bg = np.concatenate([
            rng.rand(n_points, 1) * 15.5 + 0.2,   # x
            rng.rand(n_points, 1) * 15.5 - 7.8,   # y
            rng.rand(n_points, 1) * 2.0 - 1.9,    # z (ground band)
            rng.rand(n_points, 1) * 0.3,          # low reflectance
        ], axis=1).astype(np.float32)
        obj_pts = []
        for b in boxes:
            m = 180
            local = (rng.rand(m, 3).astype(np.float32) - 0.5) * b[3:6]
            world = np.asarray(geometry.rotate_points_z(
                local, b[6])) + b[:3]
            refl = rng.rand(m, 1).astype(np.float32) * 0.5 + 0.5
            obj_pts.append(np.concatenate([world, refl], 1))
        pts = np.concatenate([bg] + obj_pts).astype(np.float32)
        for d in ("velodyne", "velodyne_reduced"):
            pts.tofile(os.path.join(sub, d, f"{idx}.bin"))

        # ---- image: noise + class-colored rectangles at 2D boxes ----
        img = (rng.rand(375, 1242, 3) * 60).astype(np.uint8)
        for n, c2 in zip(names, bb2d):
            u1, v1, u2, v2 = c2.astype(int)
            if u2 > u1 and v2 > v1:
                col = np.array(CLASS_COLOR[n], np.uint8)
                img[v1:v2, u1:u2] = (
                    col[None, None]
                    + rng.randn(v2 - v1, u2 - u1, 3) * 10
                ).clip(0, 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(sub, "image_2", f"{idx}.png"))

    split_path = os.path.join(root, f"{split}.txt")
    with open(split_path, "w") as f:
        f.write("\n".join(idxs) + "\n")
    return split_path
