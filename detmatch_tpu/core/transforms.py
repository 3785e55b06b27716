"""Augmentation records: apply / reverse 3D and 2D augs on boxes & points.

The reference records per-sample augmentation parameters in ``img_metas``
(``pcd_rotation``, ``pcd_scale_factor``, ``pcd_trans``,
``pcd_horizontal_flip``, ``transformation_3d_flow``) and replays / reverses
them inside the SSL modules (``ssl_modules/bbox_utils.py:110-200``,
``models/fusion_layers/coord_transform.py:121-172``). Here the record is a
fixed-shape pytree of arrays (TPU-friendly: flags are floats, flow order is
static) so apply/reverse is jittable and vmappable across the batch.

Static flow order (matches the reference DetMatch pipeline:
RandomFlip3D in the shared pipeline, then GlobalRotScaleTrans (R→S→T) in the
student pipeline — ``configs/detmatch/001/detmatch/split_0.py:556-585``):

    forward:  flip_x → rotate → scale → translate
    reverse:  -translate → 1/scale → -rotate → flip_x
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from . import geometry


class Aug3D(NamedTuple):
    """Per-sample 3D augmentation record (all entries scalar / small arrays).

    flip_x: 1.0 if BEV-horizontal flip (y → −y) applied, else 0.0.
    rot: rotation angle (radians, CCW around +z).
    scale: global scale factor.
    trans: (3,) translation.
    """
    flip_x: jnp.ndarray
    rot: jnp.ndarray
    scale: jnp.ndarray
    trans: jnp.ndarray

    @staticmethod
    def identity(dtype=np.float32):
        return Aug3D(
            flip_x=np.zeros((), dtype),
            rot=np.zeros((), dtype),
            scale=np.ones((), dtype),
            trans=np.zeros((3,), dtype),
        )


def _maybe_flip_boxes(boxes, flag):
    flipped = geometry.flip_boxes(boxes, axis="x")
    return jnp.where(flag > 0.5, flipped, boxes)


def _maybe_flip_points(points, flag):
    flipped = geometry.flip_points(points, axis="x")
    return jnp.where(flag > 0.5, flipped, points)


def apply_aug3d_boxes(boxes, rec: Aug3D):
    """Apply a recorded 3D aug to (N, 7+) boxes (forward flow)."""
    boxes = _maybe_flip_boxes(boxes, rec.flip_x)
    # rotate: centers rotate, heading shifts by +rot
    center = geometry.rotate_points_z(boxes[:, 0:3], rec.rot)
    heading = boxes[:, 6:7] + rec.rot
    boxes = jnp.concatenate([center, boxes[:, 3:6], heading, boxes[:, 7:]],
                            axis=-1)
    # scale: centers and sizes
    boxes = jnp.concatenate(
        [boxes[:, 0:3] * rec.scale, boxes[:, 3:6] * rec.scale, boxes[:, 6:]],
        axis=-1,
    )
    # translate
    center = boxes[:, 0:3] + rec.trans[None, :]
    return jnp.concatenate([center, boxes[:, 3:]], axis=-1)


def reverse_aug3d_boxes(boxes, rec: Aug3D):
    """Reverse a recorded 3D aug on (N, 7+) boxes."""
    center = boxes[:, 0:3] - rec.trans[None, :]
    boxes = jnp.concatenate([center, boxes[:, 3:]], axis=-1)
    inv = 1.0 / rec.scale
    boxes = jnp.concatenate(
        [boxes[:, 0:3] * inv, boxes[:, 3:6] * inv, boxes[:, 6:]], axis=-1
    )
    center = geometry.rotate_points_z(boxes[:, 0:3], -rec.rot)
    heading = boxes[:, 6:7] - rec.rot
    boxes = jnp.concatenate([center, boxes[:, 3:6], heading, boxes[:, 7:]],
                            axis=-1)
    return _maybe_flip_boxes(boxes, rec.flip_x)


def apply_aug3d_points(points, rec: Aug3D):
    """Apply a recorded 3D aug to (N, 3+C) points (forward flow)."""
    points = _maybe_flip_points(points, rec.flip_x)
    xyz = geometry.rotate_points_z(points[..., :3], rec.rot) * rec.scale
    xyz = xyz + rec.trans[None, :]
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def reverse_aug3d_points(points, rec: Aug3D):
    xyz = (points[..., :3] - rec.trans[None, :]) / rec.scale
    xyz = geometry.rotate_points_z(xyz, -rec.rot)
    points = jnp.concatenate([xyz, points[..., 3:]], axis=-1)
    return _maybe_flip_points(points, rec.flip_x)


class Aug2D(NamedTuple):
    """Per-sample 2D augmentation record.

    Mirrors the reference's img_metas fields used by
    ``bbox_2d_transform`` (``models/fusion_layers/coord_transform.py:121-172``):
    scale_factor (w, h, w, h), horizontal flip within img width.

    scale: (4,) (sw, sh, sw, sh) resize scale factors.
    flip: 1.0 if horizontal image flip applied.
    img_w: post-resize image width (for flip mirroring).
    """
    scale: jnp.ndarray
    flip: jnp.ndarray
    img_w: jnp.ndarray

    @staticmethod
    def identity(img_w=1.0, dtype=np.float32):
        return Aug2D(
            scale=np.ones((4,), dtype),
            flip=np.zeros((), dtype),
            img_w=np.asarray(img_w, dtype),
        )


def _hflip_boxes2d(boxes, img_w):
    x1 = img_w - boxes[:, 2]
    x2 = img_w - boxes[:, 0]
    return jnp.stack([x1, boxes[:, 1], x2, boxes[:, 3]], axis=-1)


def apply_aug2d_boxes(boxes, rec: Aug2D):
    """ori-image frame → augmented-image frame for (N, 4) xyxy boxes."""
    boxes = boxes * rec.scale[None, :]
    flipped = _hflip_boxes2d(boxes, rec.img_w)
    return jnp.where(rec.flip > 0.5, flipped, boxes)


def reverse_aug2d_boxes(boxes, rec: Aug2D):
    """augmented-image frame → ori-image frame."""
    flipped = _hflip_boxes2d(boxes, rec.img_w)
    boxes = jnp.where(rec.flip > 0.5, flipped, boxes)
    return boxes / rec.scale[None, :]
