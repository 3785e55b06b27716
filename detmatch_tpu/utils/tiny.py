"""Tiny synthetic DetMatch fixtures (shared by tests and the driver's
multi-chip dry run).

A full SSL setup — PV-RCNN + Faster R-CNN + SSLDetector — at the
smallest shapes that still exercise every branch (NMS, Hungarian
matching, projection, consistency). Small enough that the staged SSL
step compiles on a single-core CPU host in minutes, which is what the
driver's ``dryrun_multichip`` validation requires.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.transforms import Aug2D, Aug3D
from ..ops import voxelize

TINY_PCR = (0.0, -8.0, -3.0, 16.0, 8.0, 1.0)
TINY_CANVAS = (64, 128)

TINY_PV_CFG = dict(
    num_classes=3, point_cloud_range=TINY_PCR, voxel_size=(0.5, 0.5, 0.1),
    grid_size=(32, 32, 40), num_keypoints=32,
    backbone_caps=(384, 384, 256, 256),
    train_nms=dict(nms_pre=128, nms_post=24, nms_thresh=0.8),
    test_nms=dict(nms_pre=128, nms_post=12, nms_thresh=0.7),
    # shallow/narrow backbones: the dryrun budget is XLA-CPU *compile*
    # time, which scales with op count (layer count), not tensor sizes —
    # the production depths live only in the production configs
    backbone3d_cfg=dict(channels=(8, 8, 16, 16, 16), out_channels=32),
    bev_cfg=dict(layer_nums=(1, 1), num_filters=(32, 64),
                 num_upsample_filters=(32, 32)),
    # shrink the RoI head with the rest of the model: at the production
    # 128 rois x 6^3 grid x 16 samples the grouped-gather backward is a
    # ~30M-element scatter-add, which dominates single-core CPU hosts
    # (measured 11 s/pass; 16 x 3^3 x 4 is ~0.1% of that)
    roi_head_cfg=dict(
        grid_size=3, pool_nsamples=(4, 4), pool_mlps=((16, 16), (16, 16)),
        shared_fc=(32, 32), cls_fc=(32, 32), reg_fc=(32, 32),
        target_cfg=dict(roi_per_image=16, fg_ratio=0.5, reg_fg_thresh=0.55,
                        cls_fg_thresh=0.75, cls_bg_thresh=0.25,
                        cls_bg_thresh_lo=0.1, hard_bg_ratio=0.8)))
TINY_FR_CFG = dict(canvas=TINY_CANVAS, train_rpn_nms_pre=96,
                   train_rpn_max=48, test_rpn_nms_pre=96, test_rpn_max=24,
                   rcnn_num_samples=24,
                   # 4 bottlenecks instead of 16 (same stage/stride
                   # structure, same FPN wiring) — see backbone3d_cfg note
                   backbone_cfg=dict(stage_blocks=(1, 1, 1, 1)))
TINY_SPEC = voxelize.VoxelizerSpec(point_cloud_range=TINY_PCR,
                                   voxel_size=(0.5, 0.5, 0.1),
                                   max_voxels=384, max_points=5)


def tiny_view(rng, b=1, p=256, with_gt=False):
    """One synthetic multimodal view (points + image + calib + augs)."""
    pts = np.stack([
        rng.rand(b, p) * 15 + 0.5, rng.rand(b, p) * 15 - 7.5,
        rng.rand(b, p) * 3.5 - 2.8, rng.rand(b, p)], axis=-1
    ).astype(np.float32)
    canvas = TINY_CANVAS
    view = dict(
        points=jnp.asarray(pts),
        points_valid=jnp.ones((b, p), bool),
        img=jnp.asarray(rng.randn(b, *canvas, 3).astype(np.float32)),
        img_shape=jnp.asarray(np.tile([[canvas[0], canvas[1]]], (b, 1)
                                      ).astype(np.float32)),
        ori_shape=jnp.asarray(np.tile([[375.0, 1242.0]], (b, 1))),
        lidar2img=jnp.asarray(np.tile(np.array(
            [[[0, -700, 0, 620 * 10],
              [0, 0, -700, 180 * 10],
              [1, 0, 0, 0],
              [0, 0, 0, 1]]], np.float32), (b, 1, 1))),
        aug3d=Aug3D(flip_x=jnp.zeros((b,)), rot=jnp.zeros((b,)),
                    scale=jnp.ones((b,)), trans=jnp.zeros((b, 3))),
        aug2d=Aug2D(scale=jnp.ones((b, 4)), flip=jnp.zeros((b,)),
                    img_w=jnp.full((b,), float(canvas[1]))),
    )
    if with_gt:
        g = 6
        gt = np.zeros((b, g, 8), np.float32)
        gt[:, :3, 0] = rng.rand(b, 3) * 12 + 2
        gt[:, :3, 1] = rng.rand(b, 3) * 10 - 5
        gt[:, :3, 2] = -1.0
        gt[:, :3, 3:6] = [3.9, 1.6, 1.56]
        gt[:, :3, 6] = rng.rand(b, 3) - 0.5
        gt[:, :3, 7] = rng.randint(1, 4, (b, 3))
        view["gt_boxes"] = jnp.asarray(gt)
        g2 = np.zeros((b, g, 4), np.float32)
        g2[:, :3, :2] = rng.rand(b, 3, 2) * 60
        g2[:, :3, 2:] = g2[:, :3, :2] + 20
        view["gt_boxes2d"] = jnp.asarray(g2)
        view["gt_labels2d"] = jnp.asarray(
            rng.randint(0, 3, (b, g)).astype(np.int32))
        v2 = np.zeros((b, g), bool)
        v2[:, :3] = True
        view["gt2d_valid"] = jnp.asarray(v2)
    return view


def tiny_ssl_batch(rng, b=1, p=256):
    """A full SSL batch: labeled + unlabeled, student + teacher views."""
    return dict(
        lab=dict(stu=tiny_view(rng, b=b, p=p, with_gt=True),
                 tea=tiny_view(rng, b=b, p=p)),
        unlab=dict(stu=tiny_view(rng, b=b, p=p),
                   tea=tiny_view(rng, b=b, p=p)),
    )


def tiny_ssl(**cfg_overrides):
    """Build (SSLDetector, VoxelizerSpec) at tiny shapes."""
    from ..models.frcnn.faster_rcnn import FasterRCNN
    from ..models.pvrcnn.pvrcnn import PVRCNN
    from ..ssl.detector import SSLConfig, SSLDetector
    cfg = dict(max_pseudo_gt=16, stu_boxes_nms=(24, 16))
    cfg.update(cfg_overrides)
    return SSLDetector(PVRCNN(**TINY_PV_CFG), FasterRCNN(**TINY_FR_CFG),
                       SSLConfig(**cfg)), TINY_SPEC
