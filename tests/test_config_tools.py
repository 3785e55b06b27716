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
        "kitti_infos_train_lab_002_2.pkl")
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
