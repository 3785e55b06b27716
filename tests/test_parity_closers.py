"""Small-surface parity closers (round-5): export_2d_annotation,
--autoscale-lr, HybridOptimizer step_intervals."""
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from kitti_fixture import make_kitti_random  # noqa: E402


def test_export_2d_annotation(tmp_path):
    """COCO export matches reference semantics
    (``kitti_converter.py:331-486``): every in-view, occlusion-0-3,
    non-DontCare annotation produces a record whose bbox is the clipped
    projected 3D box; mono3d adds bbox_cam3d/center2d with depth > 0."""
    from detmatch_tpu.data import kitti

    root = str(tmp_path)
    split = make_kitti_random(root, 3, seed=5, split="train",
                              max_objects=3)
    infos = kitti.create_infos(root, split, training=True)
    p = os.path.join(root, "kitti_infos_train.pkl")
    with open(p, "wb") as f:
        pickle.dump(infos, f)
    coco = kitti.export_2d_annotation(root, p, mono3d=True)
    out = p[:-4] + "_mono3d.coco.json"
    assert os.path.exists(out)
    with open(out) as f:
        loaded = json.load(f)
    assert len(loaded["images"]) == 3
    assert [c["name"] for c in loaded["categories"]] == \
        list(kitti.CLASS_NAMES)
    assert loaded["annotations"], "no 2D records exported"
    n_gt = sum(int((i["annos"]["name"] != "DontCare").sum())
               for i in infos)
    assert len(loaded["annotations"]) <= n_gt
    for rec in loaded["annotations"]:
        x, y, w, h = rec["bbox"]
        img = next(im for im in loaded["images"]
                   if im["id"] == rec["image_id"])
        assert 0 <= x and x + w <= img["width"] + 1e-6
        assert 0 <= y and y + h <= img["height"] + 1e-6
        assert w > 0 and h > 0
        assert rec["category_id"] == kitti.CLASS_NAMES.index(
            rec["category_name"])
        assert len(rec["bbox_cam3d"]) == 7
        assert rec["center2d"][2] > 0  # depth
        assert rec["segmentation"] == [] and rec["iscrowd"] == 0
    # non-mono3d variant: plain .coco.json, no 3D fields
    kitti.export_2d_annotation(root, p, mono3d=False)
    with open(p[:-4] + ".coco.json") as f:
        plain = json.load(f)
    assert all("bbox_cam3d" not in r for r in plain["annotations"])


def test_every_k_steps_matches_reference_gating():
    """step_interval semantics (``hybrid_optimizer.py:87-93``): counter
    increments first, group fires on count % k == 0 — the k-th call uses
    only that call's gradient; skipped calls leave momenta untouched."""
    import jax.numpy as jnp
    import optax

    from detmatch_tpu.train.optim import every_k_steps

    tx = every_k_steps(optax.sgd(1.0, momentum=0.9), 3)
    params = {"w": jnp.zeros(2)}
    state = tx.init(params)
    fired = []
    for i in range(6):
        g = {"w": jnp.full(2, float(i + 1))}
        upd, state = tx.update(g, state, params)
        fired.append(bool(np.any(np.asarray(upd["w"]) != 0)))
    # fires on calls 3 and 6 (1-indexed)
    assert fired == [False, False, True, False, False, True]
    # k=1 passthrough returns the inner transform untouched
    inner = optax.sgd(1.0)
    assert every_k_steps(inner, 1) is inner


def test_hybrid_optimizer_step_intervals():
    import jax.numpy as jnp
    import optax

    from detmatch_tpu.train.optim import hybrid_optimizer

    params = {"a": jnp.zeros(2), "b": jnp.zeros(2)}
    tx = hybrid_optimizer(
        lambda p: {"a": "x", "b": "y"},
        {"x": optax.sgd(1.0), "y": optax.sgd(1.0)},
        step_intervals={"y": 2})
    state = tx.init(params)
    g = {"a": jnp.ones(2), "b": jnp.ones(2)}
    upd1, state = tx.update(g, state, params)
    upd2, state = tx.update(g, state, params)
    assert np.any(np.asarray(upd1["a"]) != 0)  # interval 1: every call
    assert not np.any(np.asarray(upd1["b"]))   # interval 2: skip 1st
    assert np.any(np.asarray(upd2["b"]) != 0)  # fire 2nd


def test_train_cli_has_autoscale_lr():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         "--help"], capture_output=True, text=True, timeout=120,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert out.returncode == 0
    assert "--autoscale-lr" in out.stdout


def test_lr_scale_applies_after_recipe():
    """train_ssl's lr_scale multiplies the derived batch-recipe defaults
    (reference applies --autoscale-lr to every optimizer's lr)."""
    import inspect

    from detmatch_tpu.apis.train_ssl import train_ssl

    sig = inspect.signature(train_ssl)
    assert "lr_scale" in sig.parameters
    assert sig.parameters["lr_scale"].default == 1.0
    src = inspect.getsource(train_ssl)
    assert "lr_3d * lr_scale" in src and "lr_2d * lr_scale" in src
