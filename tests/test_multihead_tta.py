import numpy as np
import jax
import jax.numpy as jnp

from detmatch_tpu.models.pvrcnn.anchor_head_multi import AnchorHeadMulti
from detmatch_tpu.models.pvrcnn.pvrcnn import DEFAULT_ANCHOR_CONFIGS
from detmatch_tpu.data.pipelines import MultiScaleFlipAug3D


import pytest
pytestmark = pytest.mark.slow


def test_anchor_head_multi_forward_targets_loss():
    head = AnchorHeadMulti(
        num_classes=3, point_cloud_range=(0, -8, -3, 16, 8, 1),
        grid_size=(32, 32, 40), anchor_configs=DEFAULT_ANCHOR_CONFIGS,
        head_groups=(("Car",), ("Pedestrian", "Cyclist")))
    bev = jnp.zeros((2, 4, 4, 32))
    variables = head.init(jax.random.PRNGKey(0), bev)
    preds = head.apply(variables, bev)
    assert preds["cls_preds"].shape == (2, 96, 3)
    gt = np.zeros((2, 4, 8), np.float32)
    gt[:, 0, :7] = [5, 0, -1, 3.9, 1.6, 1.56, 0.2]
    gt[:, 0, 7] = 3
    targets = head.apply(variables, jnp.asarray(gt),
                         method=AnchorHeadMulti.targets)
    losses = head.apply(variables, preds, targets,
                        method=AnchorHeadMulti.loss)
    assert all(np.isfinite(float(v)) for v in losses.values())
    boxes, cls = head.apply(variables, preds,
                            method=AnchorHeadMulti.decode_boxes)
    assert boxes.shape == (2, 96, 7)
    # off-group logits stay -inf: Car anchors never claim Ped/Cyc
    cp = np.asarray(preds["cls_preds"]).reshape(2, 4 * 4, 3, 2, 3)
    assert (cp[:, :, 2, :, 0] < -1e8).all()  # Car anchor, Ped logit
    assert (cp[:, :, 0, :, 2] < -1e8).all()  # Ped anchor, Car logit


def test_multiscale_flip_aug3d_fanout():
    pts = np.random.RandomState(0).rand(100, 4).astype(np.float32)
    tta = MultiScaleFlipAug3D(
        transforms=[], img_scale=(1280, 384), pts_scale_ratio=1.0,
        flip=True, pcd_horizontal_flip=True)
    outs = tta({"points": pts.copy()})
    assert len(outs) == 2
    np.testing.assert_allclose(outs[0]["points"], pts)
    flipped = outs[1]["points"]
    np.testing.assert_allclose(flipped[:, 1], -pts[:, 1])
    np.testing.assert_allclose(flipped[:, 0], pts[:, 0])
    assert outs[1]["pcd_horizontal_flip"]

    single = MultiScaleFlipAug3D(transforms=[], img_scale=(1280, 384),
                                 pts_scale_ratio=1.0)
    outs = single({"points": pts.copy()})
    assert len(outs) == 1
