"""SSL data-protocol tests (reference ``README.md:25-38`` +
``configs/detmatch/001/detmatch/split_0.py:22-24``).

The DetMatch protocol demands: (1) labeled infos whose 2D GT is the
PROJECTED 3D box (``_proj_3d_`` pkls), (2) per-split GT-paste databases
built from LABELED frames only (a global DB would paste objects from
unlabeled frames — label leakage), (3) every training config points at
the per-split artifacts, never the global DB.
"""
import glob
import os
import pickle
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from kitti_fixture import make_kitti_random  # noqa: E402


@pytest.fixture(scope="module")
def split_tree(tmp_path_factory):
    import create_ssl_splits
    from detmatch_tpu.data import dbsampler, kitti

    root = str(tmp_path_factory.mktemp("ssl_splits_root"))
    split = make_kitti_random(root, 10, seed=11, split="train",
                              max_objects=3)
    infos = kitti.create_infos(root, split, training=True)
    with open(os.path.join(root, "kitti_infos_train.pkl"), "wb") as f:
        pickle.dump(infos, f)
    # the fixture writes velodyne_reduced == velodyne already
    dbsampler.create_gt_database(root, infos, classes=kitti.CLASS_NAMES)
    old = sys.argv
    sys.argv = ["create_ssl_splits", "--root", root, "--fracs", "0.2",
                "--num-splits", "2", "--seed", "3"]
    try:
        create_ssl_splits.main()
    finally:
        sys.argv = old
    return root, infos


def test_proj_3d_bbox_is_projected_3d(split_tree):
    """_proj_3d_ labeled infos: annos.bbox == projection of the 3D GT
    (reference proj_3d semantics — the 2D GT the 2D branch trains on is
    consistent with the 3D GT)."""
    from detmatch_tpu.core import geometry
    from detmatch_tpu.data import kitti

    root, _ = split_tree
    path = os.path.join(root, "ssl_splits",
                        "kitti_infos_train_proj_3d_lab_0.2_0.pkl")
    with open(path, "rb") as f:
        lab = pickle.load(f)
    assert len(lab) == 2  # 10 frames * 0.2
    checked = 0
    for info in lab:
        annos = info["annos"]
        calib = kitti.calib_from_info(info)
        boxes, _, keep = kitti.annos_to_lidar_boxes(annos, calib)
        if not len(boxes):
            continue
        h, w = info["image"]["image_shape"][:2]
        bb2d, ok = geometry.boxes_3d_to_2d(boxes, calib.lidar2img,
                                           img_shape=(h, w))
        rows = np.flatnonzero(keep)[np.asarray(ok)]
        np.testing.assert_allclose(
            annos["bbox"][rows], np.asarray(bb2d)[np.asarray(ok)],
            atol=1e-4)
        checked += len(rows)
    assert checked > 0


def test_db_contains_only_labeled_frames(split_tree):
    """Per-split GT DB ⊆ labeled frames; lab/unlab partition the train
    set — no unlabeled-frame object can enter ObjectSample."""
    root, infos = split_tree
    sd = os.path.join(root, "ssl_splits")
    for s in (0, 1):
        with open(os.path.join(
                sd, f"kitti_infos_train_proj_3d_lab_0.2_{s}.pkl"),
                "rb") as f:
            lab = pickle.load(f)
        with open(os.path.join(
                sd, f"kitti_infos_train_unlab_0.2_{s}.pkl"), "rb") as f:
            unlab = pickle.load(f)
        lab_ids = {int(i["image"]["image_idx"]) for i in lab}
        unlab_ids = {int(i["image"]["image_idx"]) for i in unlab}
        assert not (lab_ids & unlab_ids)
        assert len(lab_ids) + len(unlab_ids) == len(infos)
        with open(os.path.join(
                sd, f"kitti_dbinfos_train_lab_0.2_{s}.pkl"), "rb") as f:
            db = pickle.load(f)
        entries = [e for v in db.values() for e in v]
        assert entries, "per-split DB is empty"
        assert all(int(e["image_idx"]) in lab_ids for e in entries)
    # split membership is a pure function of (n, frac, split, seed):
    # regenerating a split yields byte-identical membership
    import create_ssl_splits
    a = create_ssl_splits.labeled_indices(len(infos), 0.2, 0, 3)
    b = create_ssl_splits.labeled_indices(len(infos), 0.2, 0, 3)
    np.testing.assert_array_equal(a, b)


def test_all_split_configs_use_per_split_artifacts():
    """Every training config resolves its train infos + ObjectSample DB
    to the per-split ssl_splits paths (reference path semantics), never
    the global ``kitti_dbinfos_train.pkl``."""
    from detmatch_tpu.config.config import Config

    def find_db(o):
        if isinstance(o, dict):
            if "info_path" in o:
                yield o["info_path"]
            for v in o.values():
                yield from find_db(v)
        elif isinstance(o, (list, tuple)):
            for v in o:
                yield from find_db(v)

    files = sorted(glob.glob(os.path.join(
        REPO, "configs/detmatch/**/split_*.py"), recursive=True))
    assert len(files) == 45
    frac_path = {"001": "0.01", "002": "0.02", "020": "0.2"}
    for f in files:
        cfg = Config.fromfile(f)
        suffix = f"_{frac_path[cfg['frac']]}_{cfg['split']}.pkl"
        d = cfg.get("data", {})
        for key in ("train_lab", "train_unlab", "train"):
            if key not in d:
                continue
            ds = d[key].get("dataset", d[key])
            ann = ds["ann_file"]
            assert "ssl_splits/" in ann and ann.endswith(suffix), (f, ann)
            if key != "train_unlab":
                assert "proj_3d_lab" in ann, (f, ann)
        for p in find_db(cfg):
            assert p == ("ssl_splits/kitti_dbinfos_train_lab"
                         + suffix), (f, p)
