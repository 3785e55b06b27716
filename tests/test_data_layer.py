import os
import pickle

import numpy as np
import pytest

from detmatch_tpu.core import geometry
from detmatch_tpu.data import collate, dbsampler, kitti, pipelines
from kitti_fixture import make_kitti


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti"))
    split = make_kitti(root)
    infos = kitti.create_infos(root, split, training=True)
    info_path = os.path.join(root, "kitti_infos_train.pkl")
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)
    return root, info_path, infos


def test_create_infos_structure(kitti_root):
    root, info_path, infos = kitti_root
    assert len(infos) == 3
    i0 = infos[0]
    assert i0["calib"]["P2"].shape == (4, 4)
    assert i0["annos"]["dimensions"].shape[1] == 3
    # num_points_in_gt counted: clusters were planted at objects
    npts = i0["annos"]["num_points_in_gt"]
    names = i0["annos"]["name"]
    assert (npts[names != "DontCare"] > 10).all()
    assert i0["annos"]["difficulty"][0] in (0, 1, 2)


def test_dataset_ann_and_projection(kitti_root):
    root, info_path, infos = kitti_root
    ds = kitti.KittiDataset(root, info_path)
    ann = ds.get_ann_info(0)
    boxes = ann["gt_bboxes_3d"]
    assert boxes.shape[1] == 7
    # gravity center forward of sensor, within range
    assert (boxes[:, 0] > 0).all() and (boxes[:, 0] < 45).all()
    # projecting 3D boxes lands near the labeled 2D boxes
    calib = kitti.calib_from_info(infos[0])
    bb2d, valid = geometry.boxes_3d_to_2d(
        boxes, calib.lidar2img, img_shape=(375, 1242))
    bb2d = np.asarray(bb2d)
    gt2d = ann["gt_bboxes"]
    assert np.asarray(valid).all()
    centers_proj = (bb2d[:, :2] + bb2d[:, 2:]) / 2
    centers_gt = (gt2d[:, :2] + gt2d[:, 2:]) / 2
    assert np.abs(centers_proj - centers_gt).max() < 60  # loose: label noise


def test_pipeline_and_collate(kitti_root):
    root, info_path, _ = kitti_root
    rng = np.random.RandomState(0)
    shared = [
        pipelines.LoadPoints(),
        pipelines.LoadImage(),
        pipelines.Resize(img_scale=((640, 192), (1280, 384)), rng=rng),
        pipelines.RandomFlip3D(flip_ratio=1.0, rng=rng),
    ]
    student = [
        pipelines.GlobalRotScaleTrans(rng=rng),
        pipelines.PointsRangeFilter((0, -40, -3, 70.4, 40, 1)),
        pipelines.ObjectRangeFilter((0, -40, -3, 70.4, 40, 1)),
        pipelines.PointShuffle(rng=rng),
        pipelines.PhotoMetricAugs(rng=rng),
        pipelines.Normalize(),
        pipelines.PadToCanvas((384, 1280)),
    ]
    teacher = [
        pipelines.PointsRangeFilter((0, -40, -3, 70.4, 40, 1)),
        pipelines.Normalize(),
        pipelines.PadToCanvas((384, 1280)),
    ]
    ds = kitti.KittiDataset(root, info_path)
    ts = pipelines.TSDataset(ds, shared, student, teacher)
    sample = ts[0]
    assert sample["stu"]["img"].shape == (384, 1280, 3)
    assert sample["tea"]["img"].shape == (384, 1280, 3)
    # teacher saw the shared flip; student additionally rot/scale
    assert sample["tea"].get("flip") is True
    assert "pcd_rotation" in sample["stu"]

    batch = collate.collate_ts([ts[0], ts[1]], max_points=6000, max_gt=16)
    assert batch["stu"]["points"].shape == (2, 6000, 4)
    assert batch["stu"]["gt_boxes"].shape == (2, 16, 8)
    assert batch["tea"]["img"].shape == (2, 384, 1280, 3)
    assert batch["stu"]["aug3d"].trans.shape == (2, 3)
    # labels 1-based with zero padding
    labs = batch["stu"]["gt_boxes"][..., 7]
    assert labs.max() <= 3 and labs.min() >= 0


def test_aug_record_roundtrip_through_pipeline(kitti_root):
    """The reference SSL invariant: teacher gt boxes, reversed through
    teacher records and re-applied with student records, match student gt
    boxes (test_ssl_dataset.py:169-189)."""
    import jax.numpy as jnp
    from detmatch_tpu.core import transforms as T
    root, info_path, _ = kitti_root
    rng = np.random.RandomState(3)
    shared = [pipelines.LoadPoints(), pipelines.LoadImage(),
              pipelines.Resize(rng=rng),
              pipelines.RandomFlip3D(flip_ratio=1.0, rng=rng)]
    student = [pipelines.GlobalRotScaleTrans(rng=rng)]
    teacher = []
    ds = kitti.KittiDataset(root, info_path)
    ts = pipelines.TSDataset(ds, shared, student, teacher)
    s = ts[0]
    rec3d_stu, _ = pipelines.build_aug_records(s["stu"])
    rec3d_tea, _ = pipelines.build_aug_records(s["tea"])
    stu_rec = T.Aug3D(**{k: jnp.asarray(v) for k, v in rec3d_stu.items()})
    tea_rec = T.Aug3D(**{k: jnp.asarray(v) for k, v in rec3d_tea.items()})
    tea_boxes = jnp.asarray(s["tea"]["gt_bboxes_3d"])
    via = T.apply_aug3d_boxes(
        T.reverse_aug3d_boxes(tea_boxes, tea_rec), stu_rec)
    np.testing.assert_allclose(np.asarray(via),
                               s["stu"]["gt_bboxes_3d"], atol=1e-3)


def test_dbsampler(kitti_root):
    root, info_path, infos = kitti_root
    dbsampler.create_gt_database(root, infos,
                                 classes=kitti.CLASS_NAMES)
    sampler = dbsampler.DataBaseSampler(
        root, "kitti_dbinfos_train.pkl", kitti.CLASS_NAMES,
        sample_groups=dict(Car=5, Pedestrian=3, Cyclist=3),
        filter_by_min_points=dict(Car=5, Pedestrian=5, Cyclist=5),
        rng=np.random.RandomState(0))
    gt_boxes = np.array([[15.0, 2.0, -0.9, 3.9, 1.6, 1.56, 0.0]],
                        np.float32)
    gt_labels = np.array([2], np.int32)
    boxes, labels, pts = sampler.sample_all(gt_boxes, gt_labels)
    assert len(boxes) == len(labels) == len(pts)
    if len(boxes):
        # no sampled box collides with the existing gt (BEV)
        from detmatch_tpu.core import iou as iou_mod
        import jax.numpy as jnp
        r = np.asarray(iou_mod.rotated_iou_bev(
            jnp.asarray(geometry.boxes_to_bev(boxes)),
            jnp.asarray(geometry.boxes_to_bev(gt_boxes))))
        assert r.max() < 1e-5
        # sampled points carry their box's offset
        for b, p in zip(boxes, pts):
            assert np.abs(p[:, :3].mean(0) - b[:3]).max() < 2.5


def test_object_noise():
    """ObjectNoise: each box gets an independent small translation + yaw
    perturbation; its interior points move rigidly with it; disjoint
    boxes stay collision-free (reference transforms_3d.py:368 →
    noise_per_object_v3_ greedy first-non-colliding candidate)."""
    rng = np.random.RandomState(3)
    boxes = np.array([[10.0, 0.0, -0.9, 3.9, 1.6, 1.56, 0.3],
                      [30.0, 8.0, -0.8, 0.8, 0.6, 1.73, -1.0]], np.float32)
    # 40 points inside each box (local frame → world)
    pts = []
    for b in boxes:
        local = (rng.rand(40, 3).astype(np.float32) - 0.5) \
            * b[3:6][None] * 0.9
        world = np.asarray(geometry.rotate_points_z(local, b[6])) + b[:3]
        pts.append(np.concatenate([world, rng.rand(40, 1)], 1))
    pts = np.concatenate(pts).astype(np.float32)

    tr = pipelines.ObjectNoise(translation_std=(0.5, 0.5, 0.0),
                               rot_range=(-0.3, 0.3),
                               rng=np.random.RandomState(0))
    out = tr({"gt_bboxes_3d": boxes.copy(), "points": pts.copy()})
    nb, npts = out["gt_bboxes_3d"], out["points"]

    # boxes actually moved, sizes untouched, perturbations bounded
    assert np.abs(nb[:, :3] - boxes[:, :3]).max() > 1e-3
    np.testing.assert_array_equal(nb[:, 3:6], boxes[:, 3:6])
    assert np.abs(nb[:, :2] - boxes[:, :2]).max() < 3.0  # ~6 sigma
    assert np.abs(nb[:, 6] - boxes[:, 6]).max() <= 0.3 + 1e-6
    assert np.abs(nb[:, 2] - boxes[:, 2]).max() < 1e-6  # z std 0

    # interior points moved rigidly: still inside their (moved) box,
    # same count per box, intensity channel untouched
    inside = np.asarray(geometry.points_in_boxes(npts[:, :3], nb))
    assert inside[0, :40].all() and inside[1, 40:].all()
    np.testing.assert_array_equal(npts[:, 3], pts[:, 3])

    # empty input passes through
    empty = tr({"gt_bboxes_3d": np.zeros((0, 7), np.float32),
                "points": pts.copy()})
    assert len(empty["gt_bboxes_3d"]) == 0


def test_full_multiscale_resize_range(kitti_root):
    """Reference multiscale semantics under the fixed canvas
    (pretrain_frcnn/split_0.py:73-74 img_scale [(640,192),(2560,768)]):
    over-canvas samples are squashed to fit by PadToCanvas with the
    squash folded into scale_factor, so the scale record ALWAYS maps
    ori-frame boxes to canvas-frame boxes exactly (the round-trip every
    SSL 2D transform relies on)."""
    root, info_path, _ = kitti_root
    ds = kitti.KittiDataset(root, info_path)
    canvas = (384, 1280)
    saw_downscale = saw_upscale = False
    for seed in range(8):
        rng = np.random.RandomState(seed)
        pipe = [pipelines.LoadPoints(), pipelines.LoadImage(),
                pipelines.Resize(img_scale=((640, 192), (2560, 768)),
                                 rng=rng)]
        r = ds[0]
        ori_boxes = r["gt_bboxes"].copy()
        ori_shape = r["ori_shape"].astype(np.float64)
        for p in pipe:
            r = p(r)
        pre_pad_scale = r["scale_factor"].copy()
        saw_downscale |= pre_pad_scale[0] < 1.0
        saw_upscale |= pre_pad_scale[0] > 1.0
        r = pipelines.PadToCanvas(canvas)(r)
        # canvas always holds the (possibly squashed) image
        assert r["img"].shape == (*canvas, 3)
        assert (r["img_shape"] <= np.array(canvas)).all()
        # scale record round-trip: ori boxes * scale_factor == boxes
        np.testing.assert_allclose(
            ori_boxes * r["scale_factor"][None], r["gt_bboxes"],
            rtol=1e-5, atol=1e-3)
        # and the true image extent matches the recorded scale
        np.testing.assert_allclose(
            r["img_shape"].astype(np.float64),
            np.round(ori_shape * r["scale_factor"][[1, 0]]), atol=1.0)
    # the widened range actually exercises BOTH regimes
    assert saw_downscale and saw_upscale


def test_train_step_two_scales_one_compile(kitti_root):
    """Two different sampled scales land in the SAME static canvas shape,
    so the 2D train step compiles once and runs finite losses at both
    (the fixed-canvas answer to the reference's dynamic multiscale)."""
    import jax
    import jax.numpy as jnp
    from detmatch_tpu.models.frcnn.faster_rcnn import FasterRCNN
    from detmatch_tpu.utils.tiny import TINY_FR_CFG

    root, info_path, _ = kitti_root
    ds = kitti.KittiDataset(root, info_path)
    canvas = TINY_FR_CFG["canvas"]
    model = FasterRCNN(**TINY_FR_CFG)

    def sample_at(seed):
        rng = np.random.RandomState(seed)
        r = ds[0]
        for p in [pipelines.LoadImage(),
                  pipelines.Resize(img_scale=((64, 24), (256, 96)),
                                   rng=rng),
                  pipelines.Normalize(), pipelines.PadToCanvas(canvas)]:
            r = p(r)
        return (jnp.asarray(r["img"][None]),
                jnp.asarray(r["img_shape"][None].astype(np.float32)),
                jnp.asarray(r["gt_bboxes"][None].astype(np.float32)),
                jnp.asarray(r["gt_labels"][None].astype(np.int32)))

    img0, shp0, gtb0, gtl0 = sample_at(0)
    img1, shp1, gtb1, gtl1 = sample_at(12345)
    assert not np.allclose(shp0, shp1), "want two distinct scales"
    g = max(gtb0.shape[1], gtb1.shape[1], 1)

    def padg(b, l):
        bb = jnp.zeros((1, g, 4), jnp.float32).at[:, :b.shape[1]].set(b)
        ll = jnp.zeros((1, g), jnp.int32).at[:, :l.shape[1]].set(l)
        vv = jnp.zeros((1, g), bool).at[:, :l.shape[1]].set(True)
        return bb, ll, vv

    variables = model.init({"params": jax.random.PRNGKey(0)}, img0, shp0,
                           train=True)

    @jax.jit
    def loss_fn(img, shp, gtb, gtl, gtv):
        fwd = model.apply(variables, img, shp, train=True)
        losses = model.apply(variables, jax.random.PRNGKey(1), fwd,
                             gtb, gtl, gtv, method=FasterRCNN.loss)
        return sum(jnp.sum(v) for v in losses.values())

    for (img, shp, b, l) in [(img0, shp0, gtb0, gtl0),
                             (img1, shp1, gtb1, gtl1)]:
        bb, ll, vv = padg(b, l)
        val = loss_fn(img, shp, bb, ll, vv)
        assert np.isfinite(float(val)), float(val)
    # one compiled program served both scales
    assert loss_fn._cache_size() == 1
