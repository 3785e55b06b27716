"""VoxelSetAbstraction (reference
``pcdet/models/backbones_3d/pfe/voxel_set_abstraction.py:43-240``).

FPS-samples 2048 keypoints from raw points, then aggregates per-keypoint
features from: bilinear BEV interpolation, raw-point SA, and SA over the
voxel centers of x_conv1..4 — each SA source has two radius groups with
their own MLPs; results are concatenated (640ch) and fused to 128 via
Linear+BN+ReLU.

TPU design: FPS and ball query run as natively-batched Pallas kernels
(``ops/pallas/{fps,ball_query}.py``; XLA fallbacks off-TPU); grouping is
one fused row gather from the concatenated (xyz | feats) table; the
shared MLPs and their BatchNorms run on the full batched
(B, M, nsample, C) tensor with validity masks, so BN statistics
aggregate over the whole batch exactly like the reference's BatchNorm
over stacked points.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops import pointnet
from ...ops.pallas.ball_query import ball_query_batched, sort_points_by_y
from ...ops.pallas.fps import fps_batched
from ...ops.voxelize import INVALID_KEY, delinearize
from ..layers import MLP, MaskedBatchNorm


def voxel_centers(keys, spatial_shape, stride, voxel_size,
                  point_cloud_range):
    """Sparse keys → xyz centers (reference ``common_utils.py:66-80``)."""
    zyx = delinearize(jnp.where(keys == INVALID_KEY, 0, keys), spatial_shape)
    xyz = zyx[..., ::-1].astype(jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32) * stride
    origin = jnp.asarray(point_cloud_range[:3], jnp.float32)
    return (xyz + 0.5) * vs + origin


def bilinear_interpolate(im, x, y):
    """im: (H, W, C); x, y: (N,) continuous indices → (N, C).

    Matches reference ``bilinear_interpolate_torch`` (clamped corners).
    """
    h, w = im.shape[0], im.shape[1]
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    flat = im.reshape(h * w, -1)
    Ia, Ib = flat[y0 * w + x0], flat[y1 * w + x0]
    Ic, Id = flat[y0 * w + x1], flat[y1 * w + x1]
    x0f, x1f = x0.astype(x.dtype), x1.astype(x.dtype)
    y0f, y1f = y0.astype(y.dtype), y1.astype(y.dtype)
    wa = (x1f - x) * (y1f - y)
    wb = (x1f - x) * (y - y0f)
    wc = (x - x0f) * (y1f - y)
    wd = (x - x0f) * (y - y0f)
    return (Ia * wa[:, None] + Ib * wb[:, None] + Ic * wc[:, None]
            + Id * wd[:, None])


def bilinear_interpolate_batched(im, x, y):
    """im: (B, H, W, C); x, y: (B, N) → (B, N, C) via one flat gather."""
    b, h, w, c = im.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    base = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None]
    flat = im.reshape(b * h * w, c)

    def g(yy, xx):
        return flat[(base + yy * w + xx).reshape(-1)].reshape(
            x.shape + (c,))

    Ia, Ib, Ic, Id = g(y0, x0), g(y1, x0), g(y0, x1), g(y1, x1)
    x0f, x1f = x0.astype(x.dtype), x1.astype(x.dtype)
    y0f, y1f = y0.astype(y.dtype), y1.astype(y.dtype)
    wa = (x1f - x) * (y1f - y)
    wb = (x1f - x) * (y - y0f)
    wc = (x - x0f) * (y1f - y)
    wd = (x - x0f) * (y - y0f)
    return (Ia * wa[..., None] + Ib * wb[..., None]
            + Ic * wc[..., None] + Id * wd[..., None])


def batched_group(keypoints, kp_valid, xyz, xyz_valid, feats, radius,
                  nsample):
    """Ball query + grouping over a batch.

    Args:
        keypoints: (B, M, 3); xyz: (B, N, 3); feats: (B, N, C) or None.
    Returns:
        grouped (B, M, nsample, 3 + C) keypoint-relative, masked;
        slot_valid (B, M, nsample) bool; cnt (B, M) int32.
    """
    idx, cnt = ball_query_batched(
        keypoints, kp_valid, xyz, xyz_valid, radius, nsample)
    if feats is not None and feats.shape[-1] > 0:
        # one fused gather from the concatenated (xyz | feats) table —
        # halves the gather launches (and one-hot recomputes on TPU)
        tbl = jnp.concatenate([xyz, feats], axis=-1)
        g = pointnet.gather_rows(tbl, idx)  # (B, M, ns, 3 + C)
        rel = g[..., :3] - keypoints[:, :, None, :]
        grouped = jnp.concatenate([rel, g[..., 3:]], axis=-1)
    else:
        gxyz = pointnet.gather_rows(xyz, idx)  # (B, M, ns, 3)
        grouped = gxyz - keypoints[:, :, None, :]
    slot_valid = (jnp.arange(nsample)[None, None, :] < cnt[..., None])
    grouped = jnp.where(slot_valid[..., None], grouped, 0.0)
    return grouped, slot_valid, cnt


class SAGroupMLP(nn.Module):
    """Pointwise MLP over grouped neighbors with the FIRST layer
    decomposed into per-point and per-center terms.

    The first Dense is linear in its input, so for neighbor n of center
    m (``use_bias=False`` throughout):

        W @ [p_n - c_m | f_n]  =  W @ [p_n | f_n]  -  W @ [c_m | 0]

    The left term is computed ONCE per point (an (N, 3+C) x (3+C, C0)
    matmul on the point table) and the right once per center; the
    grouped tensor is then built by gathering the (N, C0) transformed
    table instead of the (N, 3+C) raw one. This removes the
    (B*M*nsample, 3+C, C0) grouped matmul entirely (3.5M rows in the
    RoI-grid pool) and, for wide inputs (RoI pool: 131ch -> 64ch),
    halves the gathered bytes. Exact algebra — the parameter tree
    (``dense{i}``/``bn{i}``) is identical to the plain ``MLP`` stack it
    replaces, so checkpoints and the torch importer are unaffected.
    """
    features: Tuple[int, ...]
    use_running_average: bool = False
    dtype: Any = None  # bf16: grouped tensors halve their HBM traffic

    @nn.compact
    def __call__(self, keypoints, xyz, feats, idx, slot_valid, cnt,
                 use_running_average=None, return_empty_const=False):
        b, m = keypoints.shape[:2]
        d0 = nn.Dense(self.features[0], use_bias=False, name="dense0")
        if feats is not None and feats.shape[-1] > 0:
            table = jnp.concatenate([xyz, feats], axis=-1)
            cen_in = jnp.concatenate(
                [keypoints,
                 jnp.zeros((b, m, feats.shape[-1]), keypoints.dtype)],
                axis=-1)
        else:
            table = xyz
            cen_in = keypoints
        pre = d0(table)                      # (B, N, C0)
        cen = d0(cen_in)                     # (B, M, C0)
        if self.dtype is not None:
            # cast BEFORE the gather: the (B, M, ns, C0) grouped tensor
            # (the model's biggest activation) moves at half width
            pre = pre.astype(self.dtype)
            cen = cen.astype(self.dtype)
        z = pointnet.gather_rows(pre, idx) - cen[:, :, None, :]
        x = jnp.where(slot_valid[..., None], z, 0.0)
        # reference empty-ball semantics (QueryAndGroup zeroes the
        # grouped input of an empty ball, then the MLP stack still runs:
        # each BatchNorm's affine shifts the zeros — pointnet2_utils.py:
        # 137-153 + pointnet2_modules.py:76-94): propagate a zero row
        # through the SAME layers so callers can substitute
        # MLP_stack(0) for empty balls at eval time.
        e = (jnp.zeros((1, 1, 1, self.features[0]), jnp.float32)
             if return_empty_const else None)
        for i, f in enumerate(self.features):
            if i > 0:
                d = nn.Dense(f, use_bias=False, name=f"dense{i}",
                             dtype=self.dtype)
                x = d(x)
                if e is not None:
                    e = d(e)
            # reference SA mlps use torch-default BN eps 1e-5
            # (StackSAModuleMSG BatchNorm2d, pointnet2_modules.py:38)
            bn = MaskedBatchNorm(
                name=f"bn{i}", eps=1e-5,
                use_running_average=self.use_running_average,
            )
            x = bn(x, mask=slot_valid, use_running_average=use_running_average)
            x = nn.relu(x)
            if e is not None:
                # eval-only affine (running stats; no stat update)
                e = nn.relu(bn(e, mask=None, use_running_average=True))
        if return_empty_const:
            return x, (e[0, 0, 0] if e is not None else None)
        return x


class SABranch(nn.Module):
    """One SA source: radius groups, each group+MLP+masked-maxpool.

    Ball-query results (``idx_cnt``, one (idx, cnt) pair per radius
    group) are computed by the CALLER, outside the remat region: the
    query is integer-only (no gradients flow through it), so keeping it
    inside would re-run every distance scan in the backward pass for
    nothing — the (B, M, ns) int32 indices are tiny residuals compared
    to the grouped activations the remat exists to drop.

    Operates on batched tensors (BN over the whole batch, like the
    reference's BatchNorm1d over stacked points,
    ``pointnet2_modules.py:10-94``)."""
    radii: Tuple[float, ...]
    nsamples: Tuple[int, ...]
    mlps: Tuple[Tuple[int, ...], ...]
    use_running_average: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, keypoints, kp_valid, xyz, xyz_valid, feats,
                 idx_cnt=None, train: bool = False):
        if idx_cnt is None:  # non-remat callers: query inline
            idx_cnt = tuple(
                ball_query_batched(keypoints, kp_valid, xyz, xyz_valid,
                                   r, ns)
                for r, ns in zip(self.radii, self.nsamples))
        outs = []
        for gi, ((idx, cnt), ns, mlp) in enumerate(
                zip(idx_cnt, self.nsamples, self.mlps)):
            slot_valid = (jnp.arange(ns)[None, None, :] < cnt[..., None])
            out, empty = SAGroupMLP(
                tuple(mlp), name=f"mlp{gi}", dtype=self.dtype,
                use_running_average=self.use_running_average)(
                keypoints, xyz, feats, idx, slot_valid, cnt,
                use_running_average=not train, return_empty_const=True)
            out = jnp.where(slot_valid[..., None], out,
                            jnp.asarray(-pointnet.BIG_DIST, out.dtype))
            pooled = jnp.max(out, axis=2)  # (B, M, C')
            # empty balls: eval matches the reference's MLP_stack(0)
            # constant (see SAGroupMLP); train keeps the clean zero so
            # masked-BN statistics stay padding-free
            fill = (empty[None, None].astype(pooled.dtype)
                    if not train else jnp.zeros((), pooled.dtype))
            pooled = jnp.where((cnt > 0)[..., None], pooled, fill)
            outs.append(pooled.astype(jnp.float32))
        return jnp.concatenate(outs, axis=-1)


class VoxelSetAbstraction(nn.Module):
    num_keypoints: int = 2048
    num_out_features: int = 128
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.1)
    point_cloud_range: Tuple[float, ...] = (0, -40, -3, 70.4, 40, 1)
    sa_cfg: Dict = None
    use_running_average: bool = False
    dtype: Any = None

    def _default_sa_cfg(self):
        """DetMatch config values (``split_0.py:177-210``)."""
        return {
            "raw_points": dict(radii=(0.4, 0.8), nsamples=(16, 16),
                               mlps=((16, 16), (16, 16))),
            "x_conv1": dict(radii=(0.4, 0.8), nsamples=(16, 16),
                            mlps=((16, 16), (16, 16))),
            "x_conv2": dict(radii=(0.8, 1.2), nsamples=(16, 32),
                            mlps=((32, 32), (32, 32))),
            "x_conv3": dict(radii=(1.2, 2.4), nsamples=(16, 32),
                            mlps=((64, 64), (64, 64))),
            "x_conv4": dict(radii=(2.4, 4.8), nsamples=(16, 32),
                            mlps=((64, 64), (64, 64))),
        }

    @nn.compact
    def __call__(self, points, points_valid, bev_features, ms_features,
                 train: bool = False):
        """
        Args:
            points: (B, P, 4) raw points (xyz + intensity).
            points_valid: (B, P) bool.
            bev_features: (B, H, W, C) stride-8 BEV
                (HeightCompression output — 'spatial_features').
            ms_features: backbone3d output dict (x_conv1..4 levels).
        Returns:
            dict(keypoints (B, M, 3), kp_valid (B, M),
                 point_features (B, M, 128),
                 point_features_before_fusion (B, M, C_in)).
        """
        sa_cfg = self.sa_cfg or self._default_sa_cfg()
        # remat the SA branches: their grouped (B, M, ns, C) tensors are
        # the largest activations in the model; recomputing them in the
        # backward pass keeps the SSL step inside HBM at batch 8. The
        # ball queries run OUTSIDE the remat (integer-only — see
        # SABranch) so the distance scans are never recomputed.
        SAB = nn.remat(SABranch, static_argnums=(7,))

        def queries(cfg, keypoints, kp_valid, xyz, xyz_valid):
            # one y-sort per source table, shared by its radius groups
            xyz_s, xv_s, perm = sort_points_by_y(xyz, xyz_valid)
            return tuple(
                ball_query_batched(keypoints, kp_valid, xyz_s, xv_s,
                                   r, ns, point_perm=perm)
                for r, ns in zip(cfg["radii"], cfg["nsamples"]))

        kp_idx = fps_batched(points[..., :3], points_valid,
                             self.num_keypoints)
        keypoints = pointnet.gather_rows(points[..., :3], kp_idx)
        kp_valid = jnp.broadcast_to(
            jnp.any(points_valid, axis=1)[:, None],
            (points.shape[0], self.num_keypoints))

        feats_list = []

        pcr = self.point_cloud_range
        vx, vy = self.voxel_size[0], self.voxel_size[1]
        x_idx = (keypoints[..., 0] - pcr[0]) / vx / 8.0
        y_idx = (keypoints[..., 1] - pcr[1]) / vy / 8.0
        bev_pt = bilinear_interpolate_batched(bev_features, x_idx, y_idx)
        feats_list.append(bev_pt)

        qc = queries(sa_cfg["raw_points"], keypoints, kp_valid,
                     points[..., :3], points_valid)
        feats_list.append(SAB(
            name="sa_raw_points", dtype=self.dtype,
            use_running_average=self.use_running_average,
            **sa_cfg["raw_points"])(
            keypoints, kp_valid, points[..., :3], points_valid,
            points[..., 3:], qc, train))

        for name in ("x_conv1", "x_conv2", "x_conv3", "x_conv4"):
            lv = ms_features[name]
            centers = voxel_centers(lv["keys"], lv["shape"], lv["stride"],
                                    self.voxel_size, pcr)
            qc = queries(sa_cfg[name], keypoints, kp_valid, centers,
                         lv["mask"])
            feats_list.append(SAB(
                name=f"sa_{name}", dtype=self.dtype,
                use_running_average=self.use_running_average,
                **sa_cfg[name])(
                keypoints, kp_valid, centers, lv["mask"], lv["feats"],
                qc, train))

        before_fusion = jnp.concatenate(feats_list, axis=-1)
        fused = nn.Dense(self.num_out_features, use_bias=False,
                         name="fusion")(before_fusion)
        fused = MaskedBatchNorm(
            name="fusion_bn", eps=1e-5,
            use_running_average=self.use_running_average,
        )(fused, mask=kp_valid, use_running_average=not train)
        fused = nn.relu(fused)
        return dict(keypoints=keypoints, kp_valid=kp_valid,
                    point_features=fused,
                    point_features_before_fusion=before_fusion)
