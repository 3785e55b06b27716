"""RoIAlign (aligned) for NHWC feature maps — pure XLA gather + bilinear.

Replaces mmcv's CUDA RoIAlign (used by the reference's
``SingleRoIExtractor``, config ``split_0.py:77-81``: output 7x7,
sampling_ratio=0, featmap strides [4, 8, 16, 32]).

Deviation noted for parity review: mmcv ``sampling_ratio=0`` adapts the
number of samples per bin to ceil(roi_size/out_size) per RoI (a dynamic
shape); here a fixed 2x2 sample grid per bin is used (torchvision's common
default), which matches mmcv's result for RoIs up to 2x the bin size and
differs only by sub-bin sampling density beyond that.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def _bilinear(im, x, y):
    """im (H, W, C); x, y (N,) → (N, C); zero outside [aligned=True
    semantics: coords already shifted by -0.5; sample clamped]."""
    h, w = im.shape[0], im.shape[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    lx = jnp.clip(x - x0, 0.0, 1.0)
    ly = jnp.clip(y - y0, 0.0, 1.0)
    w00 = (1 - ly) * (1 - lx)
    w01 = (1 - ly) * lx
    w10 = ly * (1 - lx)
    w11 = ly * lx
    out = (im[y0i, x0i] * w00[:, None] + im[y0i, x1i] * w01[:, None]
           + im[y1i, x0i] * w10[:, None] + im[y1i, x1i] * w11[:, None])
    inside = (x > -1.0) & (x < w) & (y > -1.0) & (y < h)
    return jnp.where(inside[:, None], out, 0.0)


@partial(jax.jit, static_argnames=("out_size", "sampling"))
def roi_align(features, rois, spatial_scale, out_size=7, sampling=2):
    """Aligned RoIAlign on one feature map.

    Args:
        features: (H, W, C); rois: (R, 4) xyxy in image coords.
    Returns:
        (R, out_size, out_size, C).
    """
    r = rois.shape[0]
    x1 = rois[:, 0] * spatial_scale - 0.5
    y1 = rois[:, 1] * spatial_scale - 0.5
    x2 = rois[:, 2] * spatial_scale - 0.5
    y2 = rois[:, 3] * spatial_scale - 0.5
    bw = (x2 - x1) / out_size  # bin sizes
    bh = (y2 - y1) / out_size

    ij = jnp.arange(out_size, dtype=features.dtype)
    sg = (jnp.arange(sampling, dtype=features.dtype) + 0.5) / sampling
    # sample x coords: (R, out, sampling)
    sx = (x1[:, None, None] + (ij[None, :, None] + sg[None, None, :])
          * bw[:, None, None])
    sy = (y1[:, None, None] + (ij[None, :, None] + sg[None, None, :])
          * bh[:, None, None])
    # full grid (R, out, out, s, s)
    gx = jnp.broadcast_to(sx[:, None, :, None, :],
                          (r, out_size, out_size, sampling, sampling))
    gy = jnp.broadcast_to(sy[:, :, None, :, None],
                          (r, out_size, out_size, sampling, sampling))
    flat_x = gx.reshape(-1)
    flat_y = gy.reshape(-1)
    vals = _bilinear(features, flat_x, flat_y)
    vals = vals.reshape(r, out_size, out_size, sampling * sampling, -1)
    return jnp.mean(vals, axis=3)


def multilevel_roi_align(feats_per_level, rois, strides, out_size=7,
                         sampling=2, finest_scale=56):
    """SingleRoIExtractor: map each RoI to a pyramid level by scale
    (mmdet: level = floor(log2(sqrt(area) / 56 + 1e-6)) clamped), pool from
    that level.

    All levels are flattened into one (sum_l H_l*W_l, C) table and each
    RoI's bilinear corners are fetched from its own level's region with
    ONE fenced gather (4 corners stacked), keeping static shapes without
    pooling every RoI from every level.

    Args:
        feats_per_level: list of (H_l, W_l, C) for strides e.g. (4, 8, 16, 32).
        rois: (R, 4).
    Returns:
        (R, out_size, out_size, C).
    """
    scale = jnp.sqrt(jnp.maximum(
        (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]), 1e-6))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    lvl = jnp.clip(lvl, 0, len(feats_per_level) - 1).astype(jnp.int32)

    # One flat (sum_l H_l*W_l, C) table; each RoI samples only ITS level
    # through one fenced gather — pooling every RoI from every level and
    # one-hot-selecting (the obvious static-shape form) costs 4x the
    # gather traffic and runs the gathers unfenced (fused, the slow
    # XLA-TPU path; see ops/pointnet.py:_fenced_take_rows).
    from . import pointnet  # local import: avoid cycle at module load

    r = rois.shape[0]
    hs = jnp.asarray([f.shape[0] for f in feats_per_level], jnp.int32)
    ws = jnp.asarray([f.shape[1] for f in feats_per_level], jnp.int32)
    sizes = [f.shape[0] * f.shape[1] for f in feats_per_level]
    offs = jnp.asarray(np.concatenate([[0], np.cumsum(sizes)[:-1]]),
                       jnp.int32)
    c = feats_per_level[0].shape[-1]
    flat = jnp.concatenate([f.reshape(-1, c) for f in feats_per_level],
                           axis=0)

    inv_s = jnp.asarray([1.0 / s for s in strides],
                        feats_per_level[0].dtype)[lvl]  # (R,)
    h_r, w_r, off_r = hs[lvl], ws[lvl], offs[lvl]

    x1 = rois[:, 0] * inv_s - 0.5
    y1 = rois[:, 1] * inv_s - 0.5
    x2 = rois[:, 2] * inv_s - 0.5
    y2 = rois[:, 3] * inv_s - 0.5
    bw = (x2 - x1) / out_size
    bh = (y2 - y1) / out_size

    ij = jnp.arange(out_size, dtype=rois.dtype)
    sg = (jnp.arange(sampling, dtype=rois.dtype) + 0.5) / sampling
    sx = (x1[:, None, None]
          + (ij[None, :, None] + sg[None, None, :]) * bw[:, None, None])
    sy = (y1[:, None, None]
          + (ij[None, :, None] + sg[None, None, :]) * bh[:, None, None])
    gx = jnp.broadcast_to(sx[:, None, :, None, :],
                          (r, out_size, out_size, sampling, sampling))
    gy = jnp.broadcast_to(sy[:, :, None, :, None],
                          (r, out_size, out_size, sampling, sampling))
    ns = out_size * out_size * sampling * sampling
    gx = gx.reshape(r, ns)
    gy = gy.reshape(r, ns)

    wl = w_r[:, None].astype(rois.dtype)
    hl = h_r[:, None].astype(rois.dtype)
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w_r[:, None] - 1)
    x1i = jnp.clip(x0i + 1, 0, w_r[:, None] - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h_r[:, None] - 1)
    y1i = jnp.clip(y0i + 1, 0, h_r[:, None] - 1)
    lx = jnp.clip(gx - x0, 0.0, 1.0)
    ly = jnp.clip(gy - y0, 0.0, 1.0)
    base = off_r[:, None]
    w_int = w_r[:, None]

    idx4 = jnp.stack([base + y0i * w_int + x0i,
                      base + y0i * w_int + x1i,
                      base + y1i * w_int + x0i,
                      base + y1i * w_int + x1i], axis=0)
    g4 = pointnet._fenced_take_rows(flat, idx4.reshape(-1))
    g4 = g4.reshape(4, r, ns, c)
    w4 = jnp.stack([(1 - ly) * (1 - lx), (1 - ly) * lx,
                    ly * (1 - lx), ly * lx], axis=0)
    v = jnp.sum(g4 * w4[..., None], axis=0)
    inside = (gx > -1.0) & (gx < wl) & (gy > -1.0) & (gy < hl)
    v = jnp.where(inside[..., None], v, 0.0)
    v = v.reshape(r, out_size, out_size, sampling * sampling, c)
    return jnp.mean(v, axis=3)
