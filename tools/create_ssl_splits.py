#!/usr/bin/env python
"""Generate the DetMatch SSL split artifacts under ``<root>/ssl_splits``.

The reference ships these pre-built in its release tarball
(``README.md:25-38`` — downloaded to ``data/kitti/ssl_splits``); every
training stage consumes them (``configs/detmatch/001/detmatch/
split_0.py:22-24``, ``pretrain_pvrcnn/split_0.py:18-19``,
``pretrain_frcnn/split_0.py:25``). Semantics, per labeled fraction
``frac`` x split index ``s``:

* ``kitti_infos_train_proj_3d_lab_{frac}_{s}.pkl`` — infos of the
  LABELED frames only, with each frame's 2D GT (``annos['bbox']``)
  REPLACED by the projection of its 3D GT box (clipped to the image),
  so the 2D and 3D branches supervise consistently. The consumer reads
  2D GT straight from ``annos['bbox']``
  (reference ``kitti_dataset.py:187``; ours ``data/kitti.py
  get_ann_info``), so the replacement happens here, offline.
* ``kitti_infos_train_unlab_{frac}_{s}.pkl`` — the complementary
  (unlabeled) frames, annos untouched (their labels are never used for
  supervision; kept for visualization/ablation tooling).
* ``kitti_dbinfos_train_lab_{frac}_{s}.pkl`` — the GT-paste database
  restricted to objects of the LABELED frames only. Sampling from the
  global DB would paste ground-truth objects from *unlabeled* frames
  into training scenes — label leakage that invalidates the SSL
  protocol.

Also writes the global ``kitti_infos_train_proj_3d.pkl``
(``README.md:53``): all train frames with projected-3D 2D GT.

Path naming matches the reference exactly: fractions are formatted as
pythonic floats (``0.01``, ``0.02``, ``0.2`` — reference
``split_0.py:5-6`` formats ``split_frac`` with ``'{}'.format``).

Usage:
    python tools/create_ssl_splits.py --root data/kitti \
        [--fracs 0.01 0.02 0.2] [--num-splits 3] [--seed 3]
"""
import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def project_annos_bbox(info):
    """Return a copy of ``info`` whose non-DontCare ``annos['bbox']``
    rows are the projected 3D boxes (the ``_proj_3d_`` transform)."""
    import copy

    from detmatch_tpu.core import geometry
    from detmatch_tpu.data import kitti

    info = copy.deepcopy(info)
    annos = info["annos"]
    calib = kitti.calib_from_info(info)
    boxes, _, keep = kitti.annos_to_lidar_boxes(annos, calib)
    if len(boxes):
        h, w = info["image"]["image_shape"][:2]
        bb2d, ok = geometry.boxes_3d_to_2d(boxes, calib.lidar2img,
                                           img_shape=(h, w))
        bb2d, ok = np.asarray(bb2d, np.float32), np.asarray(ok)
        new_bbox = annos["bbox"].astype(np.float32).copy()
        rows = np.flatnonzero(keep)
        # behind-camera/out-of-view boxes keep the label-file bbox
        new_bbox[rows[ok]] = bb2d[ok]
        annos["bbox"] = new_bbox
    return info


def labeled_indices(n_frames, frac, split, seed):
    """Deterministic labeled-frame subset for (frac, split).

    The reference's actual split memberships are an unpublished random
    draw (release tarball); what is reproducible is the PROTOCOL:
    disjoint-seeded uniform sampling without replacement, >= 1 frame.
    """
    rng = np.random.RandomState(seed * 1000 + split)
    n_lab = max(1, int(round(n_frames * frac)))
    return np.sort(rng.permutation(n_frames)[:n_lab])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--train-infos", default="kitti_infos_train.pkl")
    ap.add_argument("--db-infos", default="kitti_dbinfos_train.pkl")
    ap.add_argument("--fracs", type=float, nargs="+",
                    default=[0.01, 0.02, 0.2])
    ap.add_argument("--num-splits", type=int, default=3)
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args()

    with open(os.path.join(args.root, args.train_infos), "rb") as f:
        infos = pickle.load(f)
    out_dir = os.path.join(args.root, "ssl_splits")
    os.makedirs(out_dir, exist_ok=True)

    proj = [project_annos_bbox(i) for i in infos]
    gpath = os.path.join(args.root, "kitti_infos_train_proj_3d.pkl")
    with open(gpath, "wb") as f:
        pickle.dump(proj, f)
    print(f"wrote {gpath} ({len(proj)} frames)")

    db_path = os.path.join(args.root, args.db_infos)
    db_infos = None
    if os.path.exists(db_path):
        with open(db_path, "rb") as f:
            db_infos = pickle.load(f)
    else:
        print(f"WARNING: {db_path} missing — per-split GT DBs skipped "
              f"(run tools/create_data.py first)")

    for frac in args.fracs:
        for s in range(args.num_splits):
            lab_idx = labeled_indices(len(infos), frac, s, args.seed)
            lab_set = set(int(infos[i]["image"]["image_idx"])
                          for i in lab_idx)
            lab = [proj[i] for i in lab_idx]
            unlab = [infos[i] for i in range(len(infos))
                     if i not in set(lab_idx.tolist())]
            tag = f"{frac}_{s}"
            p_lab = os.path.join(
                out_dir, f"kitti_infos_train_proj_3d_lab_{tag}.pkl")
            p_unlab = os.path.join(
                out_dir, f"kitti_infos_train_unlab_{tag}.pkl")
            with open(p_lab, "wb") as f:
                pickle.dump(lab, f)
            with open(p_unlab, "wb") as f:
                pickle.dump(unlab, f)
            msg = (f"split {tag}: {len(lab)} labeled / "
                   f"{len(unlab)} unlabeled")
            if db_infos is not None:
                db_lab = {cls: [e for e in entries
                                if int(e["image_idx"]) in lab_set]
                          for cls, entries in db_infos.items()}
                p_db = os.path.join(
                    out_dir, f"kitti_dbinfos_train_lab_{tag}.pkl")
                with open(p_db, "wb") as f:
                    pickle.dump(db_lab, f)
                n_obj = sum(len(v) for v in db_lab.values())
                msg += f", {n_obj} DB objects (labeled frames only)"
            print(msg)


if __name__ == "__main__":
    main()
