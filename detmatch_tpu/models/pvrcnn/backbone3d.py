"""VoxelBackbone8x: sparse 3D conv backbone (reference
``pcdet/models/backbones_3d/spconv_backbone.py:70-199``), TPU-native.

Topology: SubM(4→16) → [SparseConv s2 + 2×SubM] ×3 (16→32→64→64) →
SparseConv (3,1,1)/(2,1,1) z-compression to 128ch. Emits multi-scale sparse
features x_conv1..4 (strides 1/2/4/8) and the z-compressed output for BEV.

TPU design: each resolution level is a fixed-capacity sparse buffer; the
rulebook for an indice_key is built once per level and shared by all layers
with that key (the reference's ``indice_dict`` cache, ``conv.py:95-169``,
becomes explicit dataflow). BatchNorm runs masked across the whole batch of
voxels, matching torch BatchNorm1d over the flattened voxel dim.
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

KAIMING = nn.initializers.he_normal(in_axis=(0, 1), out_axis=2)


def static_level_meta(spatial_shape):
    """Static (shape, stride) of every backbone level — pure config math,
    usable outside traces (the jit-crossing ms aux must stay static)."""
    shape1 = tuple(spatial_shape)
    shape2 = spconv.output_spatial_shape(shape1, (3, 3, 3), (2, 2, 2),
                                         (1, 1, 1))
    shape3 = spconv.output_spatial_shape(shape2, (3, 3, 3), (2, 2, 2),
                                         (1, 1, 1))
    shape4 = spconv.output_spatial_shape(shape3, (3, 3, 3), (2, 2, 2),
                                         (0, 1, 1))
    shape_out = spconv.output_spatial_shape(shape4, (3, 1, 1), (2, 1, 1),
                                            (0, 0, 0))
    return {
        "x_conv1": dict(shape=shape1, stride=1),
        "x_conv2": dict(shape=shape2, stride=2),
        "x_conv3": dict(shape=shape3, stride=4),
        "x_conv4": dict(shape=shape4, stride=8),
        "out": dict(shape=shape_out, stride=8),
    }


class VoxelBackbone8x(nn.Module):
    spatial_shape: Tuple[int, int, int]  # (Z, Y, X), e.g. (41, 1600, 1408)
    channels: Tuple[int, ...] = (16, 16, 32, 64, 64)
    out_channels: int = 128
    # capacity of each downsampled level (conv2, conv3, conv4, out)
    caps: Tuple[int, int, int, int] = (24000, 16000, 10000, 10000)
    use_running_average: bool = False
    # 'auto': fused key-compare MXU kernel on TPU (zero gathers),
    # XLA lookup+gather elsewhere; 'xla' / 'pallas_key' force a path.
    conv_impl: str = "auto"
    # Optional impl override for the full-resolution level-1 layers
    # (conv_input/conv1_0): at C=4/16 the MXU key-compare kernel is pure
    # compare overhead (channel math is negligible), so the rulebook
    # gather path can win there while the window kernel keeps the deep
    # layers. None = same impl everywhere; env DETMATCH_SPCONV_L1
    # overrides for experiments.
    conv_impl_level1: str = None

    def _impl(self, level1=False):
        if level1:
            impl = self.conv_impl_level1
            if impl is None:
                import os
                impl = os.environ.get("DETMATCH_SPCONV_L1")
            if impl:
                return impl
        impl = self.conv_impl
        if impl == "auto":
            import os
            env = os.environ.get("DETMATCH_SPCONV_IMPL")
            if env:
                return env
            return ("pallas_window" if jax.default_backend() == "tpu"
                    else "xla")
        return impl

    def _rulebook(self, keys, nkeys, shape, level1=False):
        """XLA path: resolve neighbor keys to indices ONCE per indice_key
        (the reference's rulebook cache, ``conv.py:95-169``); pallas paths
        fuse the lookup into the kernel, so no rulebook is needed."""
        if self._impl(level1) != "xla":
            return None
        b, n, k = nkeys.shape
        band = int(np.prod(shape)) + 2
        return spconv.lookup_batched(keys, nkeys.reshape(b, n * k),
                                     band=band).reshape(b, n, k)

    def _conv(self, feats, keys, nkeys, w, shape, rb=None,
              out_keys=None, level1=False):
        """Dispatch: windowed / full key-compare kernels vs rulebook
        gather-GEMM."""
        impl = self._impl(level1)
        if impl == "pallas_window":
            from ...ops.pallas.window_key_conv import (
                window_key_conv_batched)
            band = int(np.prod(shape)) + 1
            ok = keys if out_keys is None else out_keys
            return window_key_conv_batched(feats, keys, nkeys, ok, w,
                                           band)
        if impl == "pallas_key":
            from ...ops.pallas.onehot_key_conv import key_conv_batched
            band = int(np.prod(shape)) + 1
            return key_conv_batched(feats, keys, nkeys, w, band)
        if rb is None:
            rb = self._rulebook(keys, nkeys, shape, level1=level1)
        return spconv.gather_conv_batched(feats, rb, w)

    def _subm(self, name, feats, keys, nkeys, cin, cout, mask, train,
              shape, rb=None, level1=False):
        w = self.param(name + "_w", KAIMING, (27, cin, cout))
        out = self._conv(feats, keys, nkeys, w, shape, rb=rb,
                         level1=level1)
        out = MaskedBatchNorm(
            name=name + "_bn",
            use_running_average=self.use_running_average,
        )(out, mask=mask, use_running_average=not train)
        return jnp.where(mask[..., None], nn.relu(out), 0.0)

    def _down(self, name, feats, keys, shape_in, kernel, stride, padding,
              cin, cout, cap, mask_in, train):
        """Strided sparse conv level transition."""
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
        out = self._conv(feats, keys, nkeys, w, shape_in,
                         out_keys=out_keys)
        mask = out_keys != INVALID_KEY
        out = MaskedBatchNorm(
            name=name + "_bn",
            use_running_average=self.use_running_average,
        )(out, mask=mask, use_running_average=not train)
        out = jnp.where(mask[..., None], nn.relu(out), 0.0)
        return out, out_keys, count, mask, shape_out

    @nn.compact
    def __call__(self, voxel_features, voxel_keys, train: bool = False
                 ) -> Dict[str, Any]:
        """
        Args:
            voxel_features: (B, N0, C_in) mean-VFE features.
            voxel_keys: (B, N0) sorted int32 keys (INVALID_KEY padding).
        Returns:
            dict with x_conv1..4 (feats/keys/mask/shape/stride) and
            'out' (z-compressed, stride 8, for HeightCompression).
        """
        c1, c1b, c2, c3, c4 = self.channels
        shape1 = self.spatial_shape
        mask1 = voxel_keys != INVALID_KEY

        nk1 = spconv.subm_neighbor_keys(voxel_keys, shape1, (3, 3, 3))
        rb1 = self._rulebook(voxel_keys, nk1, shape1, level1=True)
        x = self._subm("conv_input", voxel_features, voxel_keys, nk1,
                       voxel_features.shape[-1], c1, mask1, train, shape1,
                       rb=rb1, level1=True)
        x = self._subm("conv1_0", x, voxel_keys, nk1, c1, c1b, mask1,
                       train, shape1, rb=rb1, level1=True)
        x_conv1 = x

        x, keys2, n2, mask2, shape2 = self._down(
            "conv2_down", x, voxel_keys, shape1, 3, 2, 1, c1b, c2,
            self.caps[0], mask1, train)
        nk2 = spconv.subm_neighbor_keys(keys2, shape2, (3, 3, 3))
        rb2 = self._rulebook(keys2, nk2, shape2)
        x = self._subm("conv2_0", x, keys2, nk2, c2, c2, mask2, train,
                       shape2, rb=rb2)
        x = self._subm("conv2_1", x, keys2, nk2, c2, c2, mask2, train,
                       shape2, rb=rb2)
        x_conv2 = x

        x, keys3, n3, mask3, shape3 = self._down(
            "conv3_down", x, keys2, shape2, 3, 2, 1, c2, c3,
            self.caps[1], mask2, train)
        nk3 = spconv.subm_neighbor_keys(keys3, shape3, (3, 3, 3))
        rb3 = self._rulebook(keys3, nk3, shape3)
        x = self._subm("conv3_0", x, keys3, nk3, c3, c3, mask3, train,
                       shape3, rb=rb3)
        x = self._subm("conv3_1", x, keys3, nk3, c3, c3, mask3, train,
                       shape3, rb=rb3)
        x_conv3 = x

        x, keys4, n4, mask4, shape4 = self._down(
            "conv4_down", x, keys3, shape3, 3, 2, (0, 1, 1), c3, c4,
            self.caps[2], mask3, train)
        nk4 = spconv.subm_neighbor_keys(keys4, shape4, (3, 3, 3))
        rb4 = self._rulebook(keys4, nk4, shape4)
        x = self._subm("conv4_0", x, keys4, nk4, c4, c4, mask4, train,
                       shape4, rb=rb4)
        x = self._subm("conv4_1", x, keys4, nk4, c4, c4, mask4, train,
                       shape4, rb=rb4)
        x_conv4 = x

        out, keys_out, n_out, mask_out, shape_out = self._down(
            "conv_out", x, keys4, shape4, (3, 1, 1), (2, 1, 1), 0, c4,
            self.out_channels, self.caps[3], mask4, train)

        def level(feats, keys, mask, shape, stride):
            return dict(feats=feats, keys=keys, mask=mask, shape=shape,
                        stride=stride)

        return {
            "x_conv1": level(x_conv1, voxel_keys, mask1, shape1, 1),
            "x_conv2": level(x_conv2, keys2, mask2, shape2, 2),
            "x_conv3": level(x_conv3, keys3, mask3, shape3, 4),
            "x_conv4": level(x_conv4, keys4, mask4, shape4, 8),
            "out": level(out, keys_out, mask_out, shape_out, 8),
        }
