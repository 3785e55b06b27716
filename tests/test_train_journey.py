"""End-to-end training journey through the real CLI (reference flow
``tools/train.py:94`` → ``apis/ssl_train.py:15-168`` → runner.run).

Covers what no unit test reaches: ``tools/train.py`` argument/config
plumbing, ``apis.train_ssl.train_ssl`` (loop, logging, checkpointing,
in-training eval), ``train/checkpoints.py`` resume +
``load_from_with_optimizer`` (bootstrapped resume), and
``apis/evaluate.eval_ssl`` — all driven over a synthetic on-disk KITTI
tree exactly like a user would.
"""
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from kitti_fixture import make_kitti

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def _read_log(work_dir):
    entries = []
    with open(os.path.join(work_dir, "log.json")) as f:
        for line in f:
            line = line.strip()
            if line:
                entries.append(json.loads(line))
    return entries


def _run_cli(args, extra_env=None):
    env = dict(os.environ)
    # the pytest process exports an 8-virtual-device XLA_FLAGS (conftest);
    # the CLI subprocess must not inherit it — batch_size=1 shards over a
    # 1-device mesh
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.update(dict(DETMATCH_PLATFORM="cpu", DETMATCH_HOST_DEVICES="1",
                    JAX_PLATFORMS="cpu"))
    env.update(extra_env or {})
    r = subprocess.run([sys.executable, os.path.join(REPO, "tools/train.py")]
                       + args, capture_output=True, text=True, env=env,
                       cwd=REPO, timeout=3600)
    assert r.returncode == 0, f"CLI failed:\n{r.stdout[-4000:]}\n" \
        f"{r.stderr[-4000:]}"
    return r


@pytest.fixture(scope="module")
def journey(tmp_path_factory):
    """Synthetic KITTI tree + a derived config file with real paths."""
    from detmatch_tpu.data import kitti

    root = str(tmp_path_factory.mktemp("kitti")) + "/"
    split = make_kitti(root)
    infos = kitti.create_infos(root, split, training=True)
    info_path = os.path.join(root, "kitti_infos_train.pkl")
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)

    cfg_dir = tmp_path_factory.mktemp("cfg")
    cfg_path = os.path.join(str(cfg_dir), "journey.py")
    base = os.path.join(REPO, "configs/tests/ssl_tiny.py")
    with open(cfg_path, "w") as f:
        f.write(f"""
_base_ = [{base!r}]
data_root = {root!r}
_ann = data_root + "kitti_infos_train.pkl"
data = dict(
    train_lab=dict(dataset=dict(data_root=data_root, ann_file=_ann)),
    train_unlab=dict(dataset=dict(data_root=data_root, ann_file=_ann)),
    val=dict(data_root=data_root, ann_file=_ann),
)
log_interval = 1
ckpt_interval = 2
max_iters = 4
evaluation = dict(interval=4)
""")
    return root, cfg_path


def test_cli_train_resume_bootstrap_eval(journey, tmp_path):
    root, cfg_path = journey
    wd = str(tmp_path / "run")

    # ---- fresh run: 4 iters, ckpt at 2 and 4, eval at 4 ----
    _run_cli([cfg_path, "--work-dir", wd, "--seed", "0"])
    log = _read_log(wd)
    train = [e for e in log if e.get("mode") == "train"]
    assert [e["iter"] for e in train] == [1, 2, 3, 4]
    for e in train:
        assert np.isfinite(e["loss"]), e
        assert any(k.startswith("sup.3d.") for k in e)
        assert any(k.startswith("ssl.unlab.hard_pseudo_2d.") for k in e)
    # checkpoints landed at the interval and at the end
    assert os.path.isdir(os.path.join(wd, "ckpt", "ckpt_2"))
    assert os.path.isdir(os.path.join(wd, "ckpt", "ckpt_4"))
    # in-training eval fanned out tea/stu x 2d/3d
    val = [e for e in log if e.get("mode") == "val"]
    assert len(val) == 1 and val[0]["iter"] == 4
    for want in ("tea.3d.mAP_3d_moderate", "tea.2d.mAP_bbox_moderate",
                 "stu.3d.mAP_bev_moderate", "stu.2d.Car_bbox_easy"):
        assert want in val[0], sorted(val[0])[:20]

    # ---- resume: continues from iter 4 → logs iters 5, 6 only ----
    _run_cli([cfg_path, "--work-dir", wd, "--seed", "0",
              "--resume-from", os.path.join(wd, "ckpt"),
              "--max-iters", "6", "--cfg-options", "evaluation=None"])
    log = _read_log(wd)
    train_iters = [e["iter"] for e in log if e.get("mode") == "train"]
    assert train_iters == [1, 2, 3, 4, 5, 6]
    assert os.path.isdir(os.path.join(wd, "ckpt", "ckpt_6"))

    # ---- bootstrapped resume: model+optimizer restored, iter reset ----
    wd2 = str(tmp_path / "boot")
    _run_cli([cfg_path, "--work-dir", wd2, "--seed", "0",
              "--load-from-with-optimizer", os.path.join(wd, "ckpt"),
              "--max-iters", "2", "--cfg-options", "evaluation=None"])
    log2 = _read_log(wd2)
    train2 = [e for e in log2 if e.get("mode") == "train"]
    assert [e["iter"] for e in train2] == [1, 2]
    assert os.path.isdir(os.path.join(wd2, "ckpt", "ckpt_2"))

    # the bootstrap actually loaded the donor weights: its first-iter EMA
    # decay matches iteration 0 (counter reset), not the donor's iter 6
    from detmatch_tpu.ssl.detector import SSLConfig, ema_decay_at
    d0 = float(ema_decay_at(0, SSLConfig()))
    assert abs(train2[0]["ssl.ema_decay"] - d0) < 1e-6
