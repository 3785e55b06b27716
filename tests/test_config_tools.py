import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from detmatch_tpu.config import Config


def test_config_inheritance_and_interpolation():
    c = Config.fromfile(
        os.path.join(REPO, "configs/detmatch/002/detmatch/split_2.py"))
    assert c["frac"] == "002" and c["split"] == 2
    assert c["data"]["train_lab"]["dataset"]["ann_file"].endswith(
        "kitti_infos_train_proj_3d_lab_0.02_2.pkl")
    # base fragments resolved through ${refs}
    assert isinstance(c["data"]["train_lab"]["shared_pipeline"], list)
    assert c["model"]["detector_3d"]["num_keypoints"] == 2048


def test_config_variants():
    c = Config.fromfile(
        os.path.join(REPO,
                     "configs/detmatch/001/confthr_pvrcnn/split_0.py"))
    assert c["ssl"]["enable_2d"] is False
    assert c["ssl"]["fusion"] is False
    assert c["ssl"]["pseudo_score_thr_3d"] == 0.3
    c2 = Config.fromfile(
        os.path.join(REPO,
                     "configs/detmatch/001/pretrain_frcnn/split_0.py"))
    assert c2["task"] == "pretrain_2d"
    assert tuple(c2["step_iters"]) == (740, 925)


def test_merge_from_options():
    c = Config({"a": {"b": 1}, "c": 2})
    c.merge_from_options({"a.b": 5, "d.e": 7})
    assert c["a"]["b"] == 5 and c["d"]["e"] == 7


def test_all_45_configs_load():
    import glob
    paths = glob.glob(os.path.join(
        REPO, "configs/detmatch/*/*/split_*.py"))
    assert len(paths) == 45
    for p in paths:
        c = Config.fromfile(p)
        assert "task" in c, p


def test_average_runs_cli(tmp_path):
    logs = []
    for i in range(2):
        p = tmp_path / f"log{i}.json"
        with open(p, "w") as f:
            f.write(json.dumps({"mode": "train", "iter": 1,
                                "loss": 9.0}) + "\n")
            f.write(json.dumps({"mode": "val", "iter": 100,
                                "Car_3d_moderate": 70.0 + i}) + "\n")
        logs.append(str(p))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/average_runs.py")]
        + logs, capture_output=True, text=True)
    assert "Car_3d_moderate: 70.5" in out.stdout, out.stdout


def test_train_vis_dump(tmp_path):
    import jax.numpy as jnp
    import numpy as np
    from detmatch_tpu.apis.train_ssl import _dump_vis

    b, p = 1, 64
    vbatch = {"unlab": {"stu": dict(
        points=jnp.asarray(np.random.rand(b, p, 4).astype(np.float32) * 20),
        points_valid=jnp.ones((b, p), bool),
        img=jnp.zeros((b, 32, 64, 3), jnp.float32),
    )}}
    boxes = jnp.asarray([[[5, 0, -1, 3.9, 1.6, 1.56, 0.3]]], jnp.float32)
    pseudo = {
        "m3d_stu": dict(boxes=boxes, valid=jnp.ones((1, 1), bool)),
        "m2d_stu": dict(boxes=jnp.asarray([[[4.0, 4.0, 20.0, 20.0]]]),
                        valid=jnp.ones((1, 1), bool)),
    }
    _dump_vis(str(tmp_path), 7, vbatch, pseudo)
    import os
    assert os.path.exists(str(tmp_path) + "/vis/iter000007_bev.png")
    assert os.path.exists(str(tmp_path) + "/vis/iter000007_2d.png")


def test_build_detector_registry_and_ssl_modules():
    from detmatch_tpu.apis.build import build_detector, ssl_modules_to_config

    det = build_detector(dict(type="SECOND", grid_size=(32, 32, 40),
                              point_cloud_range=(0, -8, -3, 16, 8, 1),
                              voxel_size=(0.5, 0.5, 0.1),
                              backbone_caps=(512, 512, 384, 384)))
    assert type(det).__name__ == "SECOND"
    cfg = ssl_modules_to_config([
        dict(type="MaxScoreFilter", score_thr=0.2, is_3d=False),
        dict(type="FusionHungarianMatching", cost_thr=-1.2),
        dict(type="HardPseudoLabel_2D", score_thr=0.4, weight=2.0),
    ])
    assert cfg["score_filter_2d"] == 0.2
    assert cfg["cost_thr"] == -1.2
    assert cfg["hard_pseudo_2d_weight"] == 2.0
