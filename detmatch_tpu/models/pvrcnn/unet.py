"""UNetV2 sparse-conv backbone for Part-A2 (reference
``pcdet/models/backbones_3d/spconv_unet.py``): the VoxelBackbone8x encoder
plus a decoder of UR blocks — SparseBasicBlock lateral transform, concat
with the bottom-up path, channel-halving merge with a residual channel
reduction, then a SparseInverseConv back to the finer key set — ending in a
full-resolution per-voxel feature map (16ch) for the point-wise part head.

TPU design: identical fixed-capacity sparse buffers as VoxelBackbone8x; the
inverse convs reuse the exact fine-level key sets from the encoder (the
reference achieves the same by sharing spconv ``indice_key``s), so no new
key sets are ever computed in the decoder.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops import spconv
from ...ops.voxelize import INVALID_KEY
from ..layers import MaskedBatchNorm
from .backbone3d import KAIMING


class UNetBackbone(nn.Module):
    spatial_shape: Tuple[int, int, int]  # (Z, Y, X)
    channels: Tuple[int, ...] = (16, 16, 32, 64, 64)
    out_channels: int = 128
    caps: Tuple[int, int, int, int] = (24000, 16000, 10000, 10000)
    use_running_average: bool = False

    def _conv(self, feats, keys, nkeys, w, shape, out_keys=None):
        if jax.default_backend() == "tpu":
            from ...ops.pallas.window_key_conv import (
                window_key_conv_batched)
            band = int(np.prod(shape)) + 1
            ok = keys if out_keys is None else out_keys
            return window_key_conv_batched(feats, keys, nkeys, ok, w,
                                           band)
        b, n, k = nkeys.shape
        band = int(np.prod(shape)) + 2
        rb = spconv.lookup_batched(keys, nkeys.reshape(b, n * k),
                                   band=band).reshape(b, n, k)
        return spconv.gather_conv_batched(feats, rb, w)

    def _subm(self, name, feats, keys, nkeys, cin, cout, mask, train,
              shape, relu=True):
        w = self.param(name + "_w", KAIMING, (27, cin, cout))
        out = self._conv(feats, keys, nkeys, w, shape)
        out = MaskedBatchNorm(
            name=name + "_bn",
            use_running_average=self.use_running_average,
        )(out, mask=mask, use_running_average=not train)
        if relu:
            out = nn.relu(out)
        return jnp.where(mask[..., None], out, 0.0)

    def _basic_block(self, name, feats, keys, nkeys, c, mask, train, shape):
        """SparseBasicBlock (``spconv_unet.py:12-47``): two subm convs with
        identity residual."""
        out = self._subm(name + "_c1", feats, keys, nkeys, c, c, mask,
                         train, shape)
        out = self._subm(name + "_c2", out, keys, nkeys, c, c, mask,
                         train, shape, relu=False)
        out = nn.relu(out + feats)
        return jnp.where(mask[..., None], out, 0.0)

    def _down(self, name, feats, keys, shape_in, kernel, stride, padding,
              cin, cout, cap, train):
        kernel = spconv._triple(kernel)
        stride_t = spconv._triple(stride)
        padding_t = spconv._triple(padding)
        shape_out = spconv.output_spatial_shape(shape_in, kernel, stride_t,
                                                padding_t)
        out_keys, count = spconv.downsample_keys_batched(
            keys, shape_in, shape_out, kernel, stride_t, padding_t, cap)
        nkeys = spconv.sparse_neighbor_keys(
            out_keys, shape_in, shape_out, kernel, stride_t, padding_t)
        k_total = kernel[0] * kernel[1] * kernel[2]
        w = self.param(name + "_w", KAIMING, (k_total, cin, cout))
        out = self._conv(feats, keys, nkeys, w, shape_in)
        mask = out_keys != INVALID_KEY
        out = MaskedBatchNorm(
            name=name + "_bn",
            use_running_average=self.use_running_average,
        )(out, mask=mask, use_running_average=not train)
        out = jnp.where(mask[..., None], nn.relu(out), 0.0)
        geom = dict(kernel=kernel, stride=stride_t, padding=padding_t,
                    shape_in=shape_in, shape_out=shape_out)
        return out, out_keys, mask, shape_out, geom

    def _inverse(self, name, feats, coarse_keys, fine_keys, geom, cin, cout,
                 fine_mask, train):
        """SparseInverseConv3d + BN + ReLU back onto the paired fine keys."""
        k = geom["kernel"]
        w = self.param(name + "_w", KAIMING,
                       (k[0] * k[1] * k[2], cin, cout))
        out = spconv.sparse_inverse_conv_batched(
            feats, coarse_keys, fine_keys, geom["shape_in"],
            geom["shape_out"], k, geom["stride"], geom["padding"], w)
        out = MaskedBatchNorm(
            name=name + "_bn",
            use_running_average=self.use_running_average,
        )(out, mask=fine_mask, use_running_average=not train)
        return jnp.where(fine_mask[..., None], nn.relu(out), 0.0)

    def _ur_block(self, name, lateral, bottom, keys, nkeys, mask, shape,
                  c, train):
        """UR block core (``spconv_unet.py:134-143``): conv_m(cat) +
        channel_reduction(cat); the caller applies the inverse conv."""
        trans = self._basic_block(name + "_t", lateral, keys, nkeys, c,
                                  mask, train, shape)
        cat = jnp.concatenate([bottom, trans], axis=-1)  # (B, N, 2c)
        m = self._subm(name + "_m", cat, keys, nkeys, 2 * c, c, mask,
                       train, shape)
        # channel_reduction: view(n, c, 2).sum(-1)
        red = cat.reshape(cat.shape[0], cat.shape[1], c, 2).sum(-1)
        return m + red

    @nn.compact
    def __call__(self, voxel_features, voxel_keys, train: bool = False
                 ) -> Dict[str, Any]:
        c1, c1b, c2, c3, c4 = self.channels
        shape1 = self.spatial_shape
        mask1 = voxel_keys != INVALID_KEY

        nk1 = spconv.subm_neighbor_keys(voxel_keys, shape1, (3, 3, 3))
        x = self._subm("conv_input", voxel_features, voxel_keys, nk1,
                       voxel_features.shape[-1], c1, mask1, train, shape1)
        x_conv1 = self._subm("conv1_0", x, voxel_keys, nk1, c1, c1b, mask1,
                             train, shape1)

        x, keys2, mask2, shape2, geo2 = self._down(
            "conv2_down", x_conv1, voxel_keys, shape1, 3, 2, 1, c1b, c2,
            self.caps[0], train)
        nk2 = spconv.subm_neighbor_keys(keys2, shape2, (3, 3, 3))
        x = self._subm("conv2_0", x, keys2, nk2, c2, c2, mask2, train,
                       shape2)
        x_conv2 = self._subm("conv2_1", x, keys2, nk2, c2, c2, mask2,
                             train, shape2)

        x, keys3, mask3, shape3, geo3 = self._down(
            "conv3_down", x_conv2, keys2, shape2, 3, 2, 1, c2, c3,
            self.caps[1], train)
        nk3 = spconv.subm_neighbor_keys(keys3, shape3, (3, 3, 3))
        x = self._subm("conv3_0", x, keys3, nk3, c3, c3, mask3, train,
                       shape3)
        x_conv3 = self._subm("conv3_1", x, keys3, nk3, c3, c3, mask3,
                             train, shape3)

        x, keys4, mask4, shape4, geo4 = self._down(
            "conv4_down", x_conv3, keys3, shape3, 3, 2, (0, 1, 1), c3, c4,
            self.caps[2], train)
        nk4 = spconv.subm_neighbor_keys(keys4, shape4, (3, 3, 3))
        x = self._subm("conv4_0", x, keys4, nk4, c4, c4, mask4, train,
                       shape4)
        x_conv4 = self._subm("conv4_1", x, keys4, nk4, c4, c4, mask4,
                             train, shape4)

        out, keys_out, mask_out, shape_out, _ = self._down(
            "conv_out", x_conv4, keys4, shape4, (3, 1, 1), (2, 1, 1), 0,
            c4, self.out_channels, self.caps[3], train)

        # ---- decoder ----
        m4 = self._ur_block("up4", x_conv4, x_conv4, keys4, nk4, mask4,
                            shape4, c4, train)
        x_up4 = self._inverse("inv4", m4, keys4, keys3, geo4, c4, c3,
                              mask3, train)
        m3 = self._ur_block("up3", x_conv3, x_up4, keys3, nk3, mask3,
                            shape3, c3, train)
        x_up3 = self._inverse("inv3", m3, keys3, keys2, geo3, c3, c2,
                              mask2, train)
        m2 = self._ur_block("up2", x_conv2, x_up3, keys2, nk2, mask2,
                            shape2, c2, train)
        x_up2 = self._inverse("inv2", m2, keys2, voxel_keys, geo2, c2, c1b,
                              mask1, train)
        m1 = self._ur_block("up1", x_conv1, x_up2, voxel_keys, nk1, mask1,
                            shape1, c1b, train)
        point_feats = self._subm("conv5", m1, voxel_keys, nk1, c1b, c1b,
                                 mask1, train, shape1)

        def level(feats, keys, mask, shape, stride):
            return dict(feats=feats, keys=keys, mask=mask, shape=shape,
                        stride=stride)

        return {
            "x_conv1": level(x_conv1, voxel_keys, mask1, shape1, 1),
            "x_conv2": level(x_conv2, keys2, mask2, shape2, 2),
            "x_conv3": level(x_conv3, keys3, mask3, shape3, 4),
            "x_conv4": level(x_conv4, keys4, mask4, shape4, 8),
            "out": level(out, keys_out, mask_out, shape_out, 8),
            "point_features": point_feats,  # (B, N0, 16) on voxel_keys
        }
