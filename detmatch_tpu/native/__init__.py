"""Native (C) host-side kernels with automatic build + graceful fallback.

The compute-heavy device path is JAX/XLA/Pallas; these C pieces cover the
host-side hot loops the reference accelerates with numba (KITTI eval
matching) — sequential algorithms where the Python interpreter, not FLOPs,
is the bottleneck.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libkitti_eval.so")
_lib = None


def _build():
    src = os.path.join(_DIR, "kitti_eval.c")
    cmd = ["cc", "-O3", "-shared", "-fPIC", "-o", _SO, src]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO)
                < os.path.getmtime(os.path.join(_DIR, "kitti_eval.c"))):
            _build()
        lib = ctypes.CDLL(_SO)
    except (OSError, subprocess.CalledProcessError):
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.gather_tp_scores.restype = ctypes.c_int
    lib.gather_tp_scores.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, f32p, i32p, i32p,
        ctypes.c_float, f32p]
    lib.sweep_thresholds.restype = None
    lib.sweep_thresholds.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, f32p,
        i32p, i32p, ctypes.c_float, f32p, ctypes.c_int, i64p, i64p, i64p]
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.sweep_thresholds_aos.restype = None
    lib.sweep_thresholds_aos.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, f32p,
        i32p, i32p, f32p, f32p, ctypes.c_float, f32p, ctypes.c_int,
        i64p, i64p, i64p, f64p]
    _lib = lib
    return lib


def _ptr(a, t):
    return a.ctypes.data_as(t)


def gather_tp_scores(overlaps, scores, gt_ignored, det_ignored,
                     min_overlap):
    lib = get_lib()
    assert lib is not None
    n_det, n_gt = overlaps.shape
    out = np.zeros((max(n_gt, 1),), np.float32)
    overlaps = np.ascontiguousarray(overlaps, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    gt_ignored = np.ascontiguousarray(gt_ignored, np.int32)
    det_ignored = np.ascontiguousarray(det_ignored, np.int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    n = lib.gather_tp_scores(
        _ptr(overlaps, f32p), n_det, n_gt, _ptr(scores, f32p),
        _ptr(gt_ignored, i32p), _ptr(det_ignored, i32p),
        ctypes.c_float(min_overlap), _ptr(out, f32p))
    return out[:n]


def sweep_thresholds(overlaps, dc_iof, scores, gt_ignored, det_ignored,
                     min_overlap, thresholds, tps, fps, fns):
    """Accumulate tp/fp/fn (int64 arrays, modified in place)."""
    lib = get_lib()
    assert lib is not None
    n_det, n_gt = overlaps.shape
    overlaps = np.ascontiguousarray(overlaps, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    gt_ignored = np.ascontiguousarray(gt_ignored, np.int32)
    det_ignored = np.ascontiguousarray(det_ignored, np.int32)
    thresholds = np.ascontiguousarray(thresholds, np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    if dc_iof is not None and dc_iof.size:
        dc = np.ascontiguousarray(dc_iof, np.float32)
        dc_ptr, n_dc = _ptr(dc, f32p), dc.shape[1]
    else:
        dc_ptr, n_dc = f32p(), 0
    lib.sweep_thresholds(
        _ptr(overlaps, f32p), n_det, n_gt, dc_ptr, n_dc,
        _ptr(scores, f32p), _ptr(gt_ignored, i32p),
        _ptr(det_ignored, i32p), ctypes.c_float(min_overlap),
        _ptr(thresholds, f32p), len(thresholds),
        _ptr(tps, i64p), _ptr(fps, i64p), _ptr(fns, i64p))


def sweep_thresholds_aos(overlaps, dc_iof, scores, gt_ignored,
                         det_ignored, gt_alphas, dt_alphas, min_overlap,
                         thresholds, tps, fps, fns, sims):
    """Accumulate tp/fp/fn + per-threshold TP orientation similarity
    (AOS numerator, reference eval.py:250-275). Arrays modified in
    place; ``sims`` is float64 (n_thr,)."""
    lib = get_lib()
    assert lib is not None
    n_det, n_gt = overlaps.shape
    overlaps = np.ascontiguousarray(overlaps, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    gt_ignored = np.ascontiguousarray(gt_ignored, np.int32)
    det_ignored = np.ascontiguousarray(det_ignored, np.int32)
    gt_alphas = np.ascontiguousarray(gt_alphas, np.float32)
    dt_alphas = np.ascontiguousarray(dt_alphas, np.float32)
    thresholds = np.ascontiguousarray(thresholds, np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    if dc_iof is not None and dc_iof.size:
        dc = np.ascontiguousarray(dc_iof, np.float32)
        dc_ptr, n_dc = _ptr(dc, f32p), dc.shape[1]
    else:
        dc_ptr, n_dc = f32p(), 0
    lib.sweep_thresholds_aos(
        _ptr(overlaps, f32p), n_det, n_gt, dc_ptr, n_dc,
        _ptr(scores, f32p), _ptr(gt_ignored, i32p),
        _ptr(det_ignored, i32p), _ptr(gt_alphas, f32p),
        _ptr(dt_alphas, f32p), ctypes.c_float(min_overlap),
        _ptr(thresholds, f32p), len(thresholds),
        _ptr(tps, i64p), _ptr(fps, i64p), _ptr(fns, i64p),
        _ptr(sims, f64p))
