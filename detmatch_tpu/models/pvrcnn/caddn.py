"""CaDDN monocular 3D detector (reference
``pcdet/models/detectors/caddn.py`` + ``backbones_3d/vfe/image_vfe.py``,
``image_vfe_modules/ffn/*``, ``image_vfe_modules/f2v/*``,
``backbones_2d/map_to_bev`` Conv2DCollapse):

image → DDN (backbone + ASPP head → image features + per-pixel depth
distribution over D bins) → frustum features (feature ⊗ depth prob) →
frustum-to-voxel trilinear sampling via calib → Conv2DCollapse BEV →
BaseBEVBackbone → AnchorHeadSingle; depth distribution supervised with a
focal loss balanced between foreground (inside 2D gt boxes) and
background pixels (``ddn_loss/ddn_loss.py``, ``balancer.py``).

TPU design notes: the depth-distribution backbone reuses the native
ResNet-50 (the reference wraps torchvision's deeplabv3_resnet101 — a
config-scale choice, same capability); frustum sampling is a vectorized
trilinear gather (the reference uses ``F.grid_sample``).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..frcnn.resnet import ResNet50
from ..layers import ConvBNReLU, MaskedBatchNorm
from .anchor_head import AnchorHeadSingle
from .bev import BaseBEVBackbone
from .pvrcnn import DEFAULT_ANCHOR_CONFIGS

# CaDDN's anchors live on the stride-2 BEV map (upstream ``CaDDN.yaml``)
CADDN_ANCHOR_CONFIGS = tuple(
    dict(cfg, feature_map_stride=2) for cfg in DEFAULT_ANCHOR_CONFIGS)


def bin_depths(depth, mode, d_min, d_max, num_bins, clamp=True):
    """Continuous depth → bin index (reference
    ``utils/transform_utils.py:bin_depths``). LID: linearly increasing
    bin widths."""
    if mode == "UD":
        idx = (depth - d_min) / ((d_max - d_min) / num_bins)
    elif mode == "LID":
        bin_size = 2 * (d_max - d_min) / (num_bins * (1 + num_bins))
        idx = -0.5 + 0.5 * jnp.sqrt(
            jnp.maximum(1 + 8 * (depth - d_min) / bin_size, 0.0))
    else:
        raise NotImplementedError(mode)
    if clamp:
        # out-of-range depths land in the extra num_bins-th bin
        idx = jnp.where((idx < 0) | (idx > num_bins - 1)
                        | ~jnp.isfinite(idx), num_bins, idx)
    return idx


class ASPPLite(nn.Module):
    """Compact atrous pyramid head (stands in for DeepLabV3's classifier
    over the dilated backbone)."""
    features: int = 256
    rates: Tuple[int, ...] = (1, 6, 12)
    use_running_average: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        branches = []
        for r in self.rates:
            b = nn.Conv(self.features, (3, 3), kernel_dilation=(r, r),
                        padding=r, use_bias=False, name=f"aspp{r}")(x)
            b = MaskedBatchNorm(
                name=f"aspp{r}_bn",
                use_running_average=self.use_running_average)(
                b, use_running_average=not train)
            branches.append(nn.relu(b))
        out = jnp.concatenate(branches, axis=-1)
        out = nn.Conv(self.features, (1, 1), use_bias=False,
                      name="proj")(out)
        out = MaskedBatchNorm(
            name="proj_bn", use_running_average=self.use_running_average)(
            out, use_running_average=not train)
        return nn.relu(out)


class DDN(nn.Module):
    """Depth distribution network: ResNet-50 trunk; stride-4 features +
    upsampled depth logits over D+1 bins (reference ``ddn_deeplabv3.py`` /
    ``ddn_template.py`` with feat_extract_layer='layer1')."""
    num_bins: int = 80
    feat_channels: int = 64
    use_running_average: bool = False

    @nn.compact
    def __call__(self, images, train: bool = False):
        c2, c3, c4, c5 = ResNet50(name="trunk")(images)
        head = ASPPLite(name="aspp",
                        use_running_average=self.use_running_average)(
            c5, train=train)
        logits = nn.Conv(self.num_bins + 1, (1, 1), name="depth_out")(head)
        h, w = c2.shape[1], c2.shape[2]
        logits = jax.image.resize(
            logits, (logits.shape[0], h, w, logits.shape[-1]),
            method="bilinear")
        feats = nn.Conv(self.feat_channels, (1, 1), use_bias=False,
                        name="channel_reduce")(c2)
        feats = MaskedBatchNorm(
            name="channel_reduce_bn",
            use_running_average=self.use_running_average)(
            feats, use_running_average=not train)
        feats = nn.relu(feats)
        return feats, logits  # (B, H/4, W/4, C), (B, H/4, W/4, D+1)


def trilinear_sample(vol, d, v, u):
    """vol (D, H, W, C); d/v/u (...,) continuous indices → (..., C);
    out-of-range samples → 0 (grid_sample zeros padding)."""
    D, H, W, C = vol.shape
    shape = d.shape

    def corner(di, vi, ui):
        inb = ((di >= 0) & (di <= D - 1) & (vi >= 0) & (vi <= H - 1)
               & (ui >= 0) & (ui <= W - 1))
        dc = jnp.clip(di, 0, D - 1)
        vc = jnp.clip(vi, 0, H - 1)
        uc = jnp.clip(ui, 0, W - 1)
        flat = (dc * H + vc) * W + uc
        vals = vol.reshape(-1, C)[flat.reshape(-1)].reshape(shape + (C,))
        return jnp.where(inb[..., None], vals, 0.0)

    d0 = jnp.floor(d).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u0 = jnp.floor(u).astype(jnp.int32)
    fd = (d - d0)[..., None]
    fv = (v - v0)[..., None]
    fu = (u - u0)[..., None]
    out = 0.0
    for dd in (0, 1):
        for dv in (0, 1):
            for du in (0, 1):
                w = ((fd if dd else 1 - fd) * (fv if dv else 1 - fv)
                     * (fu if du else 1 - fu))
                out = out + w * corner(d0 + dd, v0 + dv, u0 + du)
    return out


class CaDDN(nn.Module):
    num_classes: int = 3
    point_cloud_range: Tuple[float, ...] = (2.0, -30.08, -3.0,
                                            46.8, 30.08, 1.0)
    voxel_size: Tuple[float, float, float] = (0.16, 0.16, 0.16)
    grid_size: Tuple[int, int, int] = (280, 376, 25)
    depth_bins: int = 80
    depth_range: Tuple[float, float] = (2.0, 46.8)
    depth_mode: str = "LID"
    downsample: int = 4
    bev_features: int = 64
    anchor_configs: Tuple[Dict[str, Any], ...] = CADDN_ANCHOR_CONFIGS
    ddn_weight: float = 3.0
    fg_weight: float = 13.0
    bg_weight: float = 1.0
    use_running_average: bool = False

    def setup(self):
        self.ddn = DDN(num_bins=self.depth_bins, name="ddn")
        # upstream CaDDN BEV pyramid: strides [2,2,2], upsample [1,2,4]
        # -> stride-2 output (matching the anchors' feature_map_stride)
        self.bev_backbone = BaseBEVBackbone(
            layer_nums=(10, 10, 10), layer_strides=(2, 2, 2),
            num_filters=(64, 128, 256), upsample_strides=(1, 2, 4),
            num_upsample_filters=(128, 128, 128), name="backbone2d")
        self.anchor_head = AnchorHeadSingle(
            num_classes=self.num_classes,
            point_cloud_range=self.point_cloud_range,
            grid_size=self.grid_size,
            anchor_configs=self.anchor_configs, name="dense_head")
        self.collapse = ConvBNReLU(
            self.bev_features, kernel=1, padding=0, name="collapse",
            use_running_average=self.use_running_average)

    def _collapse(self, voxel_feats, train):
        """Conv2DCollapse (``backbones_2d/map_to_bev``): merge z into
        channels + 1x1 conv block → (B, Y, X, bev_features)."""
        b, y, x, z, c = voxel_feats.shape
        flat = voxel_feats.reshape(b, y, x, z * c)
        return self.collapse(flat, use_running_average=not train)

    def __call__(self, batch, train: bool = False):
        """batch: images (B, H, W, 3) [caffe BGR], lidar2cam (B, 4, 4),
        cam2img (B, 3, 4) [+ gt_boxes / depth_maps / gt_boxes2d train]."""
        feats, depth_logits = self.ddn(batch["images"], train=train)
        probs = jax.nn.softmax(depth_logits, axis=-1)[..., :self.depth_bins]
        # frustum (B, D, Hf, Wf, C)
        frustum = probs.transpose(0, 3, 1, 2)[..., None] * \
            feats[:, None, :, :, :]

        # voxel centers -> camera -> image plane -> frustum coords
        gx, gy, gz = self.grid_size
        pcr = self.point_cloud_range
        vs = self.voxel_size
        xs = pcr[0] + (jnp.arange(gx) + 0.5) * vs[0]
        ys = pcr[1] + (jnp.arange(gy) + 0.5) * vs[1]
        zs = pcr[2] + (jnp.arange(gz) + 0.5) * vs[2]
        X, Y, Z = jnp.meshgrid(xs, ys, zs, indexing="ij")  # (gx, gy, gz)
        pts = jnp.stack([X, Y, Z, jnp.ones_like(X)], axis=-1)  # homo

        def per_sample(fr, l2c, c2i):
            cam = jnp.einsum("ij,xyzj->xyzi", l2c, pts)  # (gx,gy,gz,4)
            img = jnp.einsum("ij,xyzj->xyzi", c2i, cam)
            depth = img[..., 2]
            u = img[..., 0] / jnp.maximum(depth, 1e-3) / self.downsample
            v = img[..., 1] / jnp.maximum(depth, 1e-3) / self.downsample
            d = bin_depths(depth, self.depth_mode, self.depth_range[0],
                           self.depth_range[1], self.depth_bins,
                           clamp=False)
            return trilinear_sample(fr, d, v, u)  # (gx, gy, gz, C)

        vox = jax.vmap(per_sample)(frustum, batch["lidar2cam"],
                                   batch["cam2img"])
        vox = vox.transpose(0, 2, 1, 3, 4)  # (B, Y=gy, X=gx, Z, C)
        bev_in = self._collapse(vox, train)
        bev = self.bev_backbone(bev_in, train=train)
        head_preds = self.anchor_head(bev)
        boxes, cls = self.anchor_head.decode_boxes(head_preds)
        return dict(head_preds=head_preds, batch_box_preds=boxes,
                    batch_cls_preds=cls, depth_logits=depth_logits)

    def ddn_loss(self, depth_logits, depth_maps, gt_boxes2d):
        """Focal CE on depth bins with fg/bg balancing (reference
        ``ddn_loss.py`` + ``balancer.py``): fg = pixels inside any
        (feature-scale) 2D gt box; each partition's loss normalized by
        its pixel count and weighted fg 13 / bg 1."""
        b, h, w, _ = depth_logits.shape
        tgt = bin_depths(depth_maps, self.depth_mode, self.depth_range[0],
                         self.depth_range[1], self.depth_bins,
                         clamp=True).astype(jnp.int32)
        logp = jax.nn.log_softmax(depth_logits, axis=-1)
        p_t = jnp.take_along_axis(jax.nn.softmax(depth_logits, -1),
                                  tgt[..., None], axis=-1)[..., 0]
        ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        focal = ((1 - p_t) ** 2.0) * ce  # gamma=2, alpha folded in weights

        uu = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        vv = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        boxes = gt_boxes2d / self.downsample  # (B, G, 4) xyxy
        valid = jnp.any(boxes[..., 2:] > boxes[..., :2], axis=-1)
        inside = ((uu[:, :, :, None] >= boxes[:, None, None, :, 0])
                  & (uu[:, :, :, None] <= boxes[:, None, None, :, 2])
                  & (vv[:, :, :, None] >= boxes[:, None, None, :, 1])
                  & (vv[:, :, :, None] <= boxes[:, None, None, :, 3])
                  & valid[:, None, None, :])
        fg = jnp.any(inside, axis=-1)
        bg = ~fg
        w_map = jnp.where(fg, self.fg_weight, self.bg_weight)
        norm = (self.fg_weight * jnp.sum(fg) + self.bg_weight * jnp.sum(bg))
        return (jnp.sum(focal * w_map) / jnp.maximum(norm, 1.0)
                * self.ddn_weight)

    def loss(self, out, batch):
        """rpn + depth (``caddn.py:get_training_loss``)."""
        targets = self.anchor_head.targets(batch["gt_boxes"])
        losses = self.anchor_head.loss(out["head_preds"], targets)
        losses["ddn_loss"] = self.ddn_loss(
            out["depth_logits"], batch["depth_maps"], batch["gt_boxes2d"])
        losses["loss"] = sum(losses.values())
        return losses
