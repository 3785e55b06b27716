"""Native C eval kernels must agree exactly with the numpy reference path."""
import numpy as np
import pytest

from detmatch_tpu import native
from detmatch_tpu.eval import kitti_eval as ke


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native lib unavailable (no compiler)")
    return lib


def _rand_case(rng, n_det, n_gt, n_dc=0):
    ov = rng.rand(n_det, n_gt).astype(np.float32)
    scores = rng.rand(n_det).astype(np.float32)
    gt_ign = rng.choice([-1, 0, 0, 0, 1], n_gt).astype(np.int32)
    det_ign = rng.choice([-1, 0, 0, 0, 1], n_det).astype(np.int32)
    dc = rng.rand(n_det, n_dc).astype(np.float32) if n_dc else None
    return ov, dc, scores, gt_ign, det_ign


@pytest.mark.parametrize("seed", range(5))
def test_gather_tp_scores_matches_python(lib, seed):
    rng = np.random.RandomState(seed)
    ov, _, scores, gt_ign, det_ign = _rand_case(rng, 30, 12)
    got = native.gather_tp_scores(ov, scores, gt_ign, det_ign, 0.5)
    _, _, _, _, want = ke._statistics(ov, None, scores, gt_ign,
                                      det_ign, 0.5, 0.0, False)
    np.testing.assert_allclose(sorted(got), sorted(want), atol=1e-7)


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("n_dc", [0, 3])
def test_sweep_matches_python(lib, seed, n_dc):
    rng = np.random.RandomState(seed + 100)
    ov, dc, scores, gt_ign, det_ign = _rand_case(rng, 40, 15, n_dc)
    thresholds = np.linspace(0.05, 0.95, 11).astype(np.float32)
    tps = np.zeros(len(thresholds), np.int64)
    fps = np.zeros(len(thresholds), np.int64)
    fns = np.zeros(len(thresholds), np.int64)
    native.sweep_thresholds(ov, dc, scores, gt_ign, det_ign, 0.5,
                            thresholds, tps, fps, fns)
    for t, thr in enumerate(thresholds):
        tp, fp, fn, _, _ = ke._statistics(ov, dc, scores, gt_ign,
                                          det_ign, 0.5, thr, True)
        assert (tps[t], fps[t], fns[t]) == (tp, fp, fn), (t, thr)


@pytest.mark.parametrize("seed", range(3))
def test_sweep_aos_matches_python(lib, seed):
    rng = np.random.RandomState(seed + 300)
    ov, dc, scores, gt_ign, det_ign = _rand_case(rng, 40, 15, 3)
    gt_a = (rng.rand(15) * 2 * np.pi - np.pi).astype(np.float32)
    dt_a = (rng.rand(40) * 2 * np.pi - np.pi).astype(np.float32)
    thresholds = np.linspace(0.05, 0.95, 11).astype(np.float32)
    tps = np.zeros(len(thresholds), np.int64)
    fps = np.zeros(len(thresholds), np.int64)
    fns = np.zeros(len(thresholds), np.int64)
    sims = np.zeros(len(thresholds), np.float64)
    native.sweep_thresholds_aos(ov, dc, scores, gt_ign, det_ign,
                                gt_a, dt_a, 0.5, thresholds,
                                tps, fps, fns, sims)
    for t, thr in enumerate(thresholds):
        tp, fp, fn, sim, _ = ke._statistics(
            ov, dc, scores, gt_ign, det_ign, 0.5, thr, True,
            gt_alphas=gt_a, dt_alphas=dt_a)
        assert (tps[t], fps[t], fns[t]) == (tp, fp, fn), (t, thr)
        np.testing.assert_allclose(sims[t], sim, atol=1e-9)


def test_eval_class_native_vs_python(lib, monkeypatch):
    """Full eval_class result identical with and without the C library."""
    from test_kitti_eval import _make_gt, _perfect_det
    rng = np.random.RandomState(7)
    gts = [_make_gt(rng) for _ in range(6)]
    dets = []
    for g in gts:
        d = _perfect_det(g)
        # degrade: drop one det, jitter boxes
        for k in d:
            d[k] = d[k][:-1]
        d["bbox"] = d["bbox"] + rng.randn(*d["bbox"].shape) * 5
        dets.append(d)
    ap_native = ke.eval_class(gts, dets, "Car", 1, "bbox")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    ap_python = ke.eval_class(gts, dets, "Car", 1, "bbox")
    np.testing.assert_allclose(ap_native, ap_python, atol=1e-9)
