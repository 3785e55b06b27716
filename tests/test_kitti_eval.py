import numpy as np

from detmatch_tpu.eval import kitti_eval as ke


def _make_gt(rng, n_cars=4, n_peds=2):
    names = ["Car"] * n_cars + ["Pedestrian"] * n_peds
    n = len(names)
    boxes3d = np.concatenate([
        rng.rand(n, 1) * 40 + 5, rng.rand(n, 1) * 20 - 10,
        np.full((n, 1), -0.9),
        np.tile([[3.9, 1.6, 1.56]], (n, 1)), rng.rand(n, 1) * 3 - 1.5,
    ], axis=1).astype(np.float32)
    x1 = rng.rand(n, 1) * 1000
    y1 = rng.rand(n, 1) * 100 + 120
    bbox = np.concatenate([x1, y1, x1 + 80, y1 + 60], 1).astype(np.float32)
    return dict(
        name=np.array(names), bbox=bbox,
        occluded=np.zeros(n, np.int32),
        truncated=np.zeros(n, np.float32), boxes3d=boxes3d)


def _perfect_det(gt, score_base=0.9):
    n = len(gt["name"])
    labels = np.array([ke.CLASSES.index(x) for x in gt["name"]], np.int32)
    return dict(labels=labels,
                scores=np.full(n, score_base, np.float32)
                - np.arange(n) * 0.01,
                bbox=gt["bbox"].copy(), boxes3d=gt["boxes3d"].copy())


def test_perfect_predictions_ap100():
    # AP_R40 needs >= ~41 gts to fill every recall sample point (true of
    # the reference get_thresholds too); use 12 images x 4 cars = 48.
    rng = np.random.RandomState(0)
    gts = [_make_gt(rng, n_cars=4, n_peds=2) for _ in range(12)]
    dets = [_perfect_det(g) for g in gts]
    out = ke.kitti_eval(gts, dets, metrics=("bbox", "3d"))
    assert abs(out["Car_bbox_moderate"] - 100.0) < 1e-6
    assert abs(out["Car_3d_moderate"] - 100.0) < 1e-6
    # only 24 pedestrian gts -> recall points truncated, but high
    assert out["Pedestrian_3d_moderate"] > 50.0


def test_empty_predictions_ap0():
    rng = np.random.RandomState(1)
    gts = [_make_gt(rng) for _ in range(3)]
    dets = [dict(labels=np.zeros(0, np.int32),
                 scores=np.zeros(0, np.float32),
                 bbox=np.zeros((0, 4), np.float32),
                 boxes3d=np.zeros((0, 7), np.float32)) for _ in gts]
    out = ke.kitti_eval(gts, dets, metrics=("bbox",))
    assert out["Car_bbox_moderate"] == 0.0


def test_half_predictions_partial_ap():
    rng = np.random.RandomState(2)
    gts = [_make_gt(rng, n_cars=4, n_peds=0) for _ in range(4)]
    dets = []
    for g in gts:
        d = _perfect_det(g)
        # keep only half the cars
        for k in d:
            d[k] = d[k][:2]
        dets.append(d)
    out = ke.kitti_eval(gts, dets, metrics=("bbox",))
    ap = out["Car_bbox_moderate"]
    assert 10.0 < ap < 70.0  # recall capped at 0.5


def test_false_positives_hurt():
    rng = np.random.RandomState(3)
    gts = [_make_gt(rng, n_cars=3, n_peds=0) for _ in range(3)]
    dets = []
    for g in gts:
        d = _perfect_det(g)
        # add 3 high-scoring FPs far away
        fp_bbox = np.array([[0, 0, 50, 50]] * 3, np.float32)
        fp_boxes = np.tile(
            np.array([[60, 30, -0.9, 3.9, 1.6, 1.56, 0]], np.float32),
            (3, 1))
        d["labels"] = np.concatenate([d["labels"], np.full(3, 2,
                                                           np.int32)])
        d["scores"] = np.concatenate([d["scores"],
                                      np.full(3, 0.95, np.float32)])
        d["bbox"] = np.concatenate([d["bbox"], fp_bbox])
        d["boxes3d"] = np.concatenate([d["boxes3d"], fp_boxes])
        dets.append(d)
    out = ke.kitti_eval(gts, dets, metrics=("bbox",))
    assert out["Car_bbox_moderate"] < 90.0


def test_dontcare_absorbs_fp():
    rng = np.random.RandomState(4)
    gt = _make_gt(rng, n_cars=2, n_peds=0)
    # add a DontCare region
    gt["name"] = np.concatenate([gt["name"], ["DontCare"]])
    gt["bbox"] = np.concatenate(
        [gt["bbox"], np.array([[0, 0, 100, 100]], np.float32)])
    gt["occluded"] = np.concatenate([gt["occluded"], [-1]])
    gt["truncated"] = np.concatenate([gt["truncated"], [-1.0]])
    gt["boxes3d"] = np.concatenate(
        [gt["boxes3d"], np.zeros((1, 7), np.float32)])
    d = _perfect_det({k: v[:2] for k, v in gt.items()})
    # a fp fully inside the DontCare region
    d["labels"] = np.concatenate([d["labels"], [2]])
    d["scores"] = np.concatenate([d["scores"], [0.95]]).astype(np.float32)
    d["bbox"] = np.concatenate(
        [d["bbox"], np.array([[10, 10, 60, 90]], np.float32)])
    d["boxes3d"] = np.concatenate([d["boxes3d"],
                                   np.zeros((1, 7), np.float32)])
    out_dc = ke.kitti_eval([gt], [d], metrics=("bbox",))
    # same dets against a gt WITHOUT the DontCare region: the extra det
    # becomes a real FP and AP must drop
    gt_nodc = {k: v[:2] for k, v in gt.items()}
    out_nodc = ke.kitti_eval([gt_nodc], [d], metrics=("bbox",))
    # and absorption makes it equal to the clean-det AP
    d_clean = {k: v[:2] for k, v in d.items()}
    out_clean = ke.kitti_eval([gt], [d_clean], metrics=("bbox",))
    assert (out_dc["Car_bbox_moderate"]
            == out_clean["Car_bbox_moderate"])
    assert (out_nodc["Car_bbox_moderate"]
            <= out_dc["Car_bbox_moderate"])


def test_coco_style_eval():
    """Perfect detections score 100 at every IoU threshold in the sweep;
    jittered boxes score strictly lower under coco-style than at the
    single official threshold (the high-IoU sweep points fail first)."""
    rng = np.random.RandomState(3)
    gts = [_make_gt(rng, n_cars=4, n_peds=0) for _ in range(12)]
    dets = [_perfect_det(g) for g in gts]
    out = ke.kitti_eval_coco_style(gts, dets, metrics=("bbox",))
    assert abs(out["Car_bbox_moderate"] - 100.0) < 1e-6

    jit_dets = []
    for g in gts:
        d = _perfect_det(g)
        d["bbox"] = d["bbox"] + np.array([6.0, 4.0, -6.0, -4.0],
                                         np.float32)
        jit_dets.append(d)
    coco = ke.kitti_eval_coco_style(gts, jit_dets, metrics=("bbox",))
    plain = ke.kitti_eval(gts, jit_dets, metrics=("bbox",))
    assert coco["Car_bbox_moderate"] < plain["Car_bbox_moderate"]
    assert coco["Car_bbox_moderate"] > 0.0
