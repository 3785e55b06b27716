"""Golden numeric parity vs the reference implementation (CPU torch).

Loads the reference's pure-torch utility modules directly from
``/root/reference/thirdparty/Spconv-OpenPCDet/pcdet/utils/`` (no CUDA /
mmcv needed) and A/Bs them against this repo's jnp implementations on
random inputs; plus an AP-pipeline golden test against the reference
KITTI eval (``mmdet3d/core/evaluation/kitti_utils/eval.py``) run in pure
python via a numba stub. These tests fail if semantics drift.
"""
import functools
import importlib.util
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/thirdparty/Spconv-OpenPCDet/pcdet/utils"
REF_EVAL = "/root/reference/mmdet3d/core/evaluation/kitti_utils/eval.py"

torch = pytest.importorskip("torch")


def _load_as(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@functools.lru_cache()
def ref_utils():
    """Load pcdet utils under a synthetic package (their relative imports
    need a parent package; the CUDA op import is stubbed)."""
    pkg = types.ModuleType("refpcdet")
    pkg.__path__ = []
    sys.modules["refpcdet"] = pkg
    ops = types.ModuleType("refpcdet.ops")
    ops.__path__ = []
    sys.modules["refpcdet.ops"] = ops
    rap = types.ModuleType("refpcdet.ops.roiaware_pool3d")
    rap.__path__ = []
    stub = types.ModuleType("refpcdet.ops.roiaware_pool3d"
                            ".roiaware_pool3d_utils")
    rap.roiaware_pool3d_utils = stub
    sys.modules["refpcdet.ops.roiaware_pool3d"] = rap
    sys.modules["refpcdet.ops.roiaware_pool3d.roiaware_pool3d_utils"] = stub
    utils = types.ModuleType("refpcdet.utils")
    utils.__path__ = [REF]
    sys.modules["refpcdet.utils"] = utils
    # PointResidualCoder calls .cuda() on its mean_size buffer
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
    import importlib
    common = importlib.import_module("refpcdet.utils.common_utils")
    box_utils = importlib.import_module("refpcdet.utils.box_utils")
    coders = importlib.import_module("refpcdet.utils.box_coder_utils")
    losses = importlib.import_module("refpcdet.utils.loss_utils")
    return dict(common=common, box_utils=box_utils, coders=coders,
                losses=losses)


@functools.lru_cache()
def ref_eval():
    """Load the reference KITTI eval with numba stubbed to identity
    (pure-python execution; fine at test scale)."""
    if "numba" not in sys.modules:
        fake = types.ModuleType("numba")

        def _jit(*a, **k):
            if a and callable(a[0]):
                return a[0]
            return lambda f: f

        fake.jit = _jit
        fake.njit = _jit
        fake.prange = range
        sys.modules["numba"] = fake
    return _load_as("ref_kitti_eval", REF_EVAL)


@functools.lru_cache()
def ref_rotate_iou():
    """Load the reference rotated-IoU kernel
    (``mmdet3d/core/evaluation/kitti_utils/rotate_iou.py``) in pure
    python: ``numba.cuda`` decorators become identity, ``local/shared
    .array`` become numpy buffers. The per-pair device function
    ``devRotateIoUEval`` then runs as ordinary float32 numpy code —
    decision-for-decision the reference math."""
    ref_eval()  # installs/reuses the fake top-level numba module
    fake = sys.modules["numba"]
    if not hasattr(fake, "cuda"):
        cuda = types.ModuleType("numba.cuda")

        def _jit(*a, **k):
            if a and callable(a[0]):
                return a[0]
            return lambda f: f

        class _Mem:
            @staticmethod
            def array(shape, dtype=None):
                return np.zeros(shape, np.float32)

        cuda.jit = _jit
        cuda.local = _Mem
        cuda.shared = _Mem
        cuda.syncthreads = staticmethod(lambda: None)
        fake.cuda = cuda
        fake.float32 = np.float32
        sys.modules["numba.cuda"] = cuda
    return _load_as(
        "ref_rotate_iou",
        "/root/reference/mmdet3d/core/evaluation/kitti_utils/"
        "rotate_iou.py")


def _ref_rotate_iou_matrix(boxes, qboxes, criterion=-1):
    """Pairwise reference rotated IoU/overlap via the pure-python
    ``devRotateIoUEval`` (what ``rotate_iou_gpu_eval`` computes per
    thread, ``rotate_iou.py:253-330``)."""
    mod = ref_rotate_iou()
    boxes = np.ascontiguousarray(boxes, np.float32)
    qboxes = np.ascontiguousarray(qboxes, np.float32)
    out = np.zeros((len(boxes), len(qboxes)), np.float32)
    ok = np.ones(out.shape, bool)
    for i, b in enumerate(boxes):
        for j, q in enumerate(qboxes):
            try:
                out[i, j] = mod.devRotateIoUEval(b.copy(), q.copy(),
                                                 criterion)
            except IndexError:
                # reference buffer overflow: exactly-coincident corners
                # yield >16 intersection candidates, overflowing the
                # kernel's local array (rotate_iou.py:181-201) — UB in
                # the CUDA original; such pairs are uncomparable
                ok[i, j] = False
    return out, ok


def _t(x):
    return torch.from_numpy(np.asarray(x)).float()


# ---------------------------------------------------------------------------
# box coders (reference pcdet/utils/box_coder_utils.py:5-230)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sincos", [False, True])
def test_residual_coder_parity(sincos):
    from detmatch_tpu.core.coders import ResidualCoder
    r = ref_utils()["coders"].ResidualCoder(
        encode_angle_by_sincos=sincos)
    mine = ResidualCoder(encode_angle_by_sincos=sincos)
    rng = np.random.RandomState(0)
    boxes = rng.randn(40, 7).astype(np.float32)
    boxes[:, 3:6] = rng.rand(40, 3) * 4 + 0.3
    anchors = rng.randn(40, 7).astype(np.float32)
    anchors[:, 3:6] = rng.rand(40, 3) * 4 + 0.3

    enc_ref = r.encode_torch(_t(boxes).clone(), _t(anchors).clone())
    enc_my = np.asarray(mine.encode(boxes, anchors))
    np.testing.assert_allclose(enc_my, enc_ref.numpy(), atol=1e-5)

    dec_ref = r.decode_torch(_t(enc_my).clone(), _t(anchors).clone())
    dec_my = np.asarray(mine.decode(enc_my, anchors))
    np.testing.assert_allclose(dec_my, dec_ref.numpy(), atol=1e-4)


def test_point_residual_coder_parity():
    from detmatch_tpu.core.coders import PointResidualCoder
    mean_size = [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]]
    r = ref_utils()["coders"].PointResidualCoder(mean_size=mean_size)
    mine = PointResidualCoder(mean_size=mean_size)
    rng = np.random.RandomState(1)
    gt = rng.randn(30, 7).astype(np.float32)
    gt[:, 3:6] = rng.rand(30, 3) * 3 + 0.3
    pts = rng.randn(30, 3).astype(np.float32)
    cls = rng.randint(1, 4, 30)

    enc_ref = r.encode_torch(_t(gt).clone(), _t(pts),
                             torch.from_numpy(cls))
    enc_my = np.asarray(mine.encode(gt, pts, cls))
    np.testing.assert_allclose(enc_my, enc_ref.numpy(), atol=1e-5)

    dec_ref = r.decode_torch(_t(enc_my), _t(pts), torch.from_numpy(cls))
    dec_my = np.asarray(mine.decode(enc_my, pts, cls))
    # reference decodes heading via atan2(sin, cos) too
    np.testing.assert_allclose(dec_my, dec_ref.numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# losses (reference pcdet/utils/loss_utils.py:9-261)
# ---------------------------------------------------------------------------

def test_sigmoid_focal_loss_parity():
    from detmatch_tpu.core.losses import sigmoid_focal_loss
    L = ref_utils()["losses"].SigmoidFocalClassificationLoss()
    rng = np.random.RandomState(2)
    logits = rng.randn(2, 50, 3).astype(np.float32) * 3
    onehot = np.eye(3, dtype=np.float32)[rng.randint(0, 3, (2, 50))]
    w = rng.rand(2, 50).astype(np.float32)
    ref = L(_t(logits), _t(onehot), _t(w)).numpy()
    my = np.asarray(sigmoid_focal_loss(logits, onehot, w))
    np.testing.assert_allclose(my, ref, atol=1e-5)


def test_weighted_smooth_l1_parity():
    from detmatch_tpu.core.losses import weighted_smooth_l1
    cw = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 2.0]
    L = ref_utils()["losses"].WeightedSmoothL1Loss(code_weights=cw)
    rng = np.random.RandomState(3)
    pred = rng.randn(2, 40, 7).astype(np.float32)
    tgt = rng.randn(2, 40, 7).astype(np.float32)
    tgt[0, 3, 2] = np.nan  # nan-target ignore path
    w = rng.rand(2, 40).astype(np.float32)
    ref = L(_t(pred), _t(tgt), _t(w)).numpy()
    my = np.asarray(weighted_smooth_l1(pred, tgt, w, code_weights=cw))
    np.testing.assert_allclose(my, ref, atol=1e-5)


def test_corner_loss_parity():
    from detmatch_tpu.core.losses import corner_loss_lidar
    rng = np.random.RandomState(4)
    pred = rng.randn(25, 7).astype(np.float32)
    pred[:, 3:6] = rng.rand(25, 3) * 3 + 0.5
    gt = pred + rng.randn(25, 7).astype(np.float32) * 0.3
    gt[:, 3:6] = np.abs(gt[:, 3:6]) + 0.2
    ref = ref_utils()["losses"].get_corner_loss_lidar(
        _t(pred), _t(gt)).numpy()
    my = np.asarray(corner_loss_lidar(pred, gt))
    np.testing.assert_allclose(my, ref, atol=1e-4)


# ---------------------------------------------------------------------------
# geometry (reference pcdet/utils/{box_utils,common_utils}.py)
# ---------------------------------------------------------------------------

def test_boxes_to_corners_parity():
    """Corner ordering conventions may differ; compare as point sets."""
    from detmatch_tpu.core.geometry import boxes_to_corners_3d
    rng = np.random.RandomState(5)
    boxes = rng.randn(20, 7).astype(np.float32)
    boxes[:, 3:6] = rng.rand(20, 3) * 3 + 0.5
    ref = ref_utils()["box_utils"].boxes_to_corners_3d(
        _t(boxes)).numpy()  # (N, 8, 3)
    my = np.asarray(boxes_to_corners_3d(boxes))
    for i in range(len(boxes)):
        a = ref[i][np.lexsort(ref[i].T)]
        b = my[i][np.lexsort(my[i].T)]
        np.testing.assert_allclose(b, a, atol=1e-4)


def test_limit_period_parity():
    from detmatch_tpu.core.geometry import limit_period
    rng = np.random.RandomState(6)
    vals = (rng.randn(100) * 10).astype(np.float32)
    for offset, period in [(0.5, np.pi), (0.5, 2 * np.pi), (0.0, np.pi)]:
        ref = ref_utils()["common"].limit_period(
            vals.copy(), offset, period)
        my = np.asarray(limit_period(vals, offset, period))
        np.testing.assert_allclose(my, ref, atol=1e-5)


# ---------------------------------------------------------------------------
# Rotated-IoU kernel golden parity (reference rotate_iou.py:253-330)
# ---------------------------------------------------------------------------
# The eval-pipeline test below shares this repo's overlap matrices between
# the two AP pipelines, so it can NOT catch a bug in core/iou.py itself.
# These tests A/B the overlap kernel directly against the reference's
# devRotateIoUEval math run in pure python. Convention bridge: the
# reference rotates corners clockwise for positive angle
# (``rbbox_to_corners``, rotate_iou.py:218-243) while this repo's
# ``boxes_to_corners_bev`` rotates counter-clockwise — the same point set
# is obtained by negating the angle.


def _adversarial_bev_pairs():
    """(boxes, qboxes) hitting degenerate/tangent branches."""
    b = np.array([
        [0.0, 0.0, 4.0, 2.0, 0.0],       # axis-aligned base
        [0.0, 0.0, 4.0, 2.0, 0.0],       # identical → IoU 1
        [4.0, 0.0, 4.0, 2.0, 0.0],       # edge-tangent → IoU 0
        [3.0, 0.0, 4.0, 2.0, 0.0],       # partial overlap, parallel edges
        [0.0, 0.0, 1.0, 0.6, 0.0],       # fully contained
        [0.0, 0.0, 4.0, 2.0, np.pi / 4],  # same center, rotated 45°
        [0.0, 0.0, 4.0, 2.0, np.pi / 2],  # rotated 90°
        [0.0, 0.0, 4.0, 2.0, np.pi],     # rotated 180° → identical shape
        [0.5, 0.3, 6.0, 0.5, 0.17],      # thin sliver
        [4.0, 2.0, 4.0, 2.0, 0.0],       # corner-tangent
        [10.0, 10.0, 2.0, 2.0, 1.1],     # disjoint
        [0.0, 0.0, 4.0, 2.0, -np.pi / 3],  # negative angle
    ], np.float32)
    return b, b.copy()


def test_rotated_iou_bev_golden_parity():
    import jax.numpy as jnp
    from detmatch_tpu.core import iou as iou_mod

    rng = np.random.RandomState(3)
    n, m = 40, 30
    boxes = np.stack([
        rng.rand(n) * 60 - 10, rng.rand(n) * 40 - 20,
        rng.rand(n) * 4 + 0.5, rng.rand(n) * 2.5 + 0.5,
        rng.rand(n) * 4 * np.pi - 2 * np.pi], 1).astype(np.float32)
    qboxes = np.stack([
        rng.rand(m) * 60 - 10, rng.rand(m) * 40 - 20,
        rng.rand(m) * 4 + 0.5, rng.rand(m) * 2.5 + 0.5,
        rng.rand(m) * 4 * np.pi - 2 * np.pi], 1).astype(np.float32)
    # densify overlaps: make a third of qboxes jittered copies of boxes
    qboxes[:m // 3] = boxes[:m // 3] + rng.randn(m // 3, 5).astype(
        np.float32) * np.array([0.4, 0.4, 0.2, 0.2, 0.2], np.float32)

    ref, ok = _ref_rotate_iou_matrix(boxes, qboxes, criterion=-1)
    assert ok.all()  # random pairs never hit the reference overflow
    neg = np.array([1, 1, 1, 1, -1], np.float32)
    mine = np.asarray(iou_mod.rotated_iou_bev(
        jnp.asarray(boxes * neg), jnp.asarray(qboxes * neg)))
    np.testing.assert_allclose(mine, ref, atol=1e-4)

    # raw intersection areas (criterion=2 → the `else` branch returns
    # area_inter; what d3_box_overlap consumes, eval.py:121-160)
    ref_inter, _ = _ref_rotate_iou_matrix(boxes, qboxes, criterion=2)
    mine_inter = np.asarray(iou_mod.rotated_overlap_bev(
        jnp.asarray(boxes * neg), jnp.asarray(qboxes * neg)))
    np.testing.assert_allclose(mine_inter, ref_inter, atol=2e-4)


def test_rotated_iou_bev_degenerate_parity():
    import jax.numpy as jnp
    from detmatch_tpu.core import iou as iou_mod

    boxes, qboxes = _adversarial_bev_pairs()
    ref, ok = _ref_rotate_iou_matrix(boxes, qboxes, criterion=-1)
    neg = np.array([1, 1, 1, 1, -1], np.float32)
    mine = np.asarray(iou_mod.rotated_iou_bev(
        jnp.asarray(boxes * neg), jnp.asarray(qboxes * neg)))
    # Exactly-coincident boxes are the reference kernel's blind spot:
    # duplicate corners either overflow its 16-slot intersection buffer
    # (`ok` False — CUDA UB) or NaN its center-normalized vertex sort
    # (rotate_iou.py:47-50), returning 0 or 1/3 for identical rotated
    # boxes. Exclude exact duplicates from the A/B and assert the
    # mathematically exact answer (IoU 1) on this repo's side instead.
    dup = (boxes[:, None, :] == qboxes[None, :, :]).all(-1)
    cmp = ok & ~dup
    assert cmp.sum() >= cmp.size - 20, cmp.sum()
    np.testing.assert_allclose(mine[cmp], ref[cmp], atol=1e-4)
    np.testing.assert_allclose(mine[dup], 1.0, atol=1e-4)


# ---------------------------------------------------------------------------
# KITTI AP pipeline golden parity (reference eval.py:28-649)
# ---------------------------------------------------------------------------
# The IoU kernels themselves are covered by tests/test_core_iou_nms.py;
# here both pipelines share this repo's overlap matrices (the reference's
# rotate_iou is CUDA-only) so the test isolates clean_data / threshold
# sweep / matching / dontcare / AP_R40 integration.

def _cam_from_lidar(boxes3d):
    """Internal lidar (x,y,z-center,dx,dy,dz,yaw) → KITTI camera
    location (bottom-center) / dimensions (l,h,w) / rotation_y."""
    n = len(boxes3d)
    loc = np.zeros((n, 3), np.float32)
    loc[:, 0] = -boxes3d[:, 1]                       # x_c = -y_l
    loc[:, 1] = -(boxes3d[:, 2] - boxes3d[:, 5] / 2)  # y_c = -z_bottom
    loc[:, 2] = boxes3d[:, 0]                        # z_c = x_l
    dims = boxes3d[:, [3, 5, 4]].astype(np.float32)  # l, h, w
    rot = (-(boxes3d[:, 6] + np.pi / 2)).astype(np.float32)
    return loc, dims, rot


def _lidar_from_cam_bev(b):
    """Camera BEV rows [x_c, z_c, l, w, ry] → lidar 7-boxes."""
    out = np.zeros((len(b), 7), np.float32)
    out[:, 0] = b[:, 1]
    out[:, 1] = -b[:, 0]
    out[:, 3] = b[:, 2]
    out[:, 4] = b[:, 3]
    out[:, 5] = 1.0
    out[:, 6] = -(b[:, 4] + np.pi / 2)
    return out


def _lidar_from_cam_3d(b):
    """Camera rows [x, y, z, l, h, w, ry] → lidar 7-boxes."""
    out = np.zeros((len(b), 7), np.float32)
    out[:, 0] = b[:, 2]
    out[:, 1] = -b[:, 0]
    out[:, 2] = -b[:, 1] + b[:, 4] / 2
    out[:, 3] = b[:, 3]
    out[:, 4] = b[:, 5]
    out[:, 5] = b[:, 4]
    out[:, 6] = -(b[:, 6] + np.pi / 2)
    return out


def _shared_bev_overlap(gt_boxes, dt_boxes, criterion=-1):
    import jax.numpy as jnp
    from detmatch_tpu.core import geometry, iou as iou_mod
    m = iou_mod.rotated_iou_bev(
        geometry.boxes_to_bev(jnp.asarray(_lidar_from_cam_bev(gt_boxes))),
        geometry.boxes_to_bev(jnp.asarray(_lidar_from_cam_bev(dt_boxes))))
    return np.asarray(m).astype(np.float64)


def _shared_d3_overlap(gt_boxes, dt_boxes, criterion=-1):
    import jax.numpy as jnp
    from detmatch_tpu.core import iou as iou_mod
    m = iou_mod.iou3d(jnp.asarray(_lidar_from_cam_3d(gt_boxes)),
                      jnp.asarray(_lidar_from_cam_3d(dt_boxes)))
    return np.asarray(m).astype(np.float64)


def _synth_scene(rng, n_frames=16):
    """Random KITTI-like scene in BOTH anno formats.

    Returns (my_gts, my_dets, ref_gts, ref_dets)."""
    from detmatch_tpu.eval.kitti_eval import CLASSES
    names_pool = ["Car", "Car", "Car", "Pedestrian", "Cyclist", "Van",
                  "DontCare"]
    my_gts, my_dets, ref_gts, ref_dets = [], [], [], []
    for _ in range(n_frames):
        n = rng.randint(2, 9)
        names = np.array([names_pool[rng.randint(len(names_pool))]
                          for _ in range(n)])
        boxes3d = np.zeros((n, 7), np.float32)
        boxes3d[:, 0] = rng.rand(n) * 50 + 5
        boxes3d[:, 1] = rng.rand(n) * 30 - 15
        boxes3d[:, 2] = -0.9 + rng.randn(n) * 0.1
        boxes3d[:, 3] = rng.rand(n) * 3 + 1.0
        boxes3d[:, 4] = rng.rand(n) * 1.2 + 0.5
        boxes3d[:, 5] = rng.rand(n) * 1.0 + 1.0
        boxes3d[:, 6] = rng.rand(n) * np.pi * 2 - np.pi
        x1 = rng.rand(n) * 1100
        y1 = rng.rand(n) * 150 + 100
        h = rng.rand(n) * 80 + 18     # spans the MIN_HEIGHT gates
        w = rng.rand(n) * 90 + 25
        bbox = np.stack([x1, y1, x1 + w, y1 + h], 1).astype(np.float32)
        occ = rng.randint(0, 4, n)
        trunc = (rng.rand(n) * 0.7).astype(np.float32)

        loc, dims, rot = _cam_from_lidar(boxes3d)
        # observation angle (devkit convention: ry - atan2(x_cam, z_cam))
        gt_alpha = (rot - np.arctan2(loc[:, 0], loc[:, 2])
                    ).astype(np.float32)
        my_gts.append(dict(name=names, bbox=bbox, occluded=occ,
                           truncated=trunc, boxes3d=boxes3d,
                           alpha=gt_alpha))
        ref_gts.append(dict(
            name=names, truncated=trunc.astype(np.float64),
            occluded=occ.astype(np.int64),
            alpha=gt_alpha.astype(np.float64),
            bbox=bbox.astype(np.float64),
            dimensions=dims.astype(np.float64),
            location=loc.astype(np.float64),
            rotation_y=rot.astype(np.float64)))

        # detections: jittered copies of non-DontCare gts + random FPs
        keep = names != "DontCare"
        nd = int(keep.sum())
        det_names = list(names[keep])
        det_b3d = boxes3d[keep] + rng.randn(nd, 7).astype(np.float32) * \
            np.array([0.15, 0.15, 0.1, 0.05, 0.05, 0.05, 0.05],
                     np.float32)
        det_bbox = bbox[keep] + rng.randn(nd, 4).astype(np.float32) * 2.0
        n_fp = rng.randint(0, 4)
        for _f in range(n_fp):
            det_names.append(["Car", "Pedestrian",
                              "Cyclist"][rng.randint(3)])
        fp_b3d = np.zeros((n_fp, 7), np.float32)
        fp_b3d[:, 0] = rng.rand(n_fp) * 50 + 5
        fp_b3d[:, 1] = rng.rand(n_fp) * 30 - 15
        fp_b3d[:, 2] = -0.9
        fp_b3d[:, 3:6] = rng.rand(n_fp, 3) * 2 + 0.5
        fx1 = rng.rand(n_fp) * 1100
        fy1 = rng.rand(n_fp) * 150 + 100
        fp_bbox = np.stack([fx1, fy1, fx1 + rng.rand(n_fp) * 90 + 25,
                            fy1 + rng.rand(n_fp) * 80 + 18], 1)
        det_b3d = np.concatenate([det_b3d, fp_b3d], 0)
        det_bbox = np.concatenate([det_bbox, fp_bbox.astype(np.float32)],
                                  0)
        det_names = np.array(det_names)
        m = len(det_names)
        scores = rng.rand(m).astype(np.float32)

        # my det format: Van is not a det class; map to label -1 so it
        # never matches (reference dets would not contain Van either)
        labels = np.array([CLASSES.index(x) if x in CLASSES else -1
                           for x in det_names], np.int32)
        valid = labels >= 0
        loc, dims, rot = _cam_from_lidar(det_b3d[valid])
        dt_alpha = (rot - np.arctan2(loc[:, 0], loc[:, 2])
                    ).astype(np.float32)
        my_dets.append(dict(labels=labels[valid], scores=scores[valid],
                            bbox=det_bbox[valid],
                            boxes3d=det_b3d[valid], alpha=dt_alpha))
        md = int(valid.sum())
        ref_dets.append(dict(
            name=det_names[valid],
            truncated=np.zeros(md), occluded=np.zeros(md, np.int64),
            alpha=dt_alpha.astype(np.float64),
            bbox=det_bbox[valid].astype(np.float64),
            dimensions=dims.astype(np.float64),
            location=loc.astype(np.float64),
            rotation_y=rot.astype(np.float64),
            score=scores[valid].astype(np.float64)))
    return my_gts, my_dets, ref_gts, ref_dets


@pytest.mark.parametrize("metric", ["bbox", "bev", "3d"])
def test_kitti_eval_ap_golden_parity(metric):
    from detmatch_tpu.eval import kitti_eval as ke
    ev = ref_eval()
    ev.bev_box_overlap = _shared_bev_overlap
    ev.d3_box_overlap = _shared_d3_overlap

    rng = np.random.RandomState(7)
    my_gts, my_dets, ref_gts, ref_dets = _synth_scene(rng)

    # reference strict thresholds (overlap_0_7): Car .7, Ped/Cyc .5
    min_overlaps = np.tile(
        np.array([[0.7, 0.5, 0.5]], np.float64), (3, 1))[None]  # (1,3,3)
    metric_id = {"bbox": 0, "bev": 1, "3d": 2}[metric]
    ret = ev.eval_class(ref_gts, ref_dets, [0, 1, 2], [0, 1, 2],
                        metric_id, min_overlaps, num_parts=4)
    # precision: (n_cls, n_diff, n_minoverlap, 41)
    ref_map = ret["precision"][:, :, 0, 1:].sum(-1) / 40.0 * 100.0

    diffs = ("easy", "moderate", "hard")
    for ci, cls in enumerate(("Car", "Pedestrian", "Cyclist")):
        for di in range(3):
            mine = ke.eval_class(my_gts, my_dets, cls, di, metric)
            assert abs(mine - ref_map[ci, di]) < 1e-6, (
                f"{cls}/{diffs[di]}/{metric}: mine={mine} "
                f"ref={ref_map[ci, di]}")


def test_kitti_eval_aos_golden_parity():
    """AOS (orientation similarity) golden parity vs reference eval.py
    (compute_aos path, eval.py:240-276 + 550-560)."""
    from detmatch_tpu.eval import kitti_eval as ke
    ev = ref_eval()
    ev.bev_box_overlap = _shared_bev_overlap
    ev.d3_box_overlap = _shared_d3_overlap

    rng = np.random.RandomState(11)
    my_gts, my_dets, ref_gts, ref_dets = _synth_scene(rng)

    min_overlaps = np.tile(
        np.array([[0.7, 0.5, 0.5]], np.float64), (3, 1))[None]
    ret = ev.eval_class(ref_gts, ref_dets, [0, 1, 2], [0, 1, 2],
                        0, min_overlaps, compute_aos=True, num_parts=4)
    ref_ap = ret["precision"][:, :, 0, 1:].sum(-1) / 40.0 * 100.0
    ref_aos = ret["orientation"][:, :, 0, 1:].sum(-1) / 40.0 * 100.0

    for ci, cls in enumerate(("Car", "Pedestrian", "Cyclist")):
        for di in range(3):
            ap, aos = ke.eval_class(my_gts, my_dets, cls, di, "bbox",
                                    compute_aos=True)
            assert abs(ap - ref_ap[ci, di]) < 1e-6, (cls, di)
            assert abs(aos - ref_aos[ci, di]) < 1e-6, (
                f"{cls}/{di}: mine={aos} ref={ref_aos[ci, di]}")
