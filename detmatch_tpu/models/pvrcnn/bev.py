"""HeightCompression + BaseBEVBackbone (reference
``pcdet/models/backbones_2d/map_to_bev/height_compression.py`` and
``base_bev_backbone.py:9-124``), as dense NHWC convs under XLA.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops import spconv
from ..layers import ConvBNReLU


def height_compression(level):
    """Sparse (stride-8, z-compressed) tensor → dense BEV NHWC.

    With y-major keys the scatter lands directly in (B, Y, X, Z, C); z
    merges into channels with a plain reshape → (B, Y, X, Z*C) =
    (B, 200, 176, 256). (Z-inner channel order vs the reference's
    C-inner — handled at checkpoint import, see import_torch_ckpt.)
    """
    dense = jax.vmap(spconv.to_dense_yxz, (0, None))(
        spconv.SparseTensor(level["feats"], level["keys"],
                            jnp.sum(level["mask"], axis=-1)),
        level["shape"],
    )  # (B, Y, X, Z, C)
    b, y, x, z, c = dense.shape
    return dense.reshape(b, y, x, z * c)


class BaseBEVBackbone(nn.Module):
    """Conv pyramid with deconv-upsampled concat output.

    DetMatch config (``split_0.py:119-125``): LAYER_NUMS [5, 5],
    STRIDES [1, 2], FILTERS [128, 256], UPSAMPLE_STRIDES [1, 2],
    UPSAMPLE_FILTERS [256, 256] → output 512ch at stride 1 (relative to
    the 200×176 BEV input).
    """
    layer_nums: Tuple[int, ...] = (5, 5)
    layer_strides: Tuple[int, ...] = (1, 2)
    num_filters: Tuple[int, ...] = (128, 256)
    upsample_strides: Tuple[int, ...] = (1, 2)
    num_upsample_filters: Tuple[int, ...] = (256, 256)
    use_running_average: bool = False
    dtype: Any = None  # bf16 MXU convs (params/BN stay f32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        ups = []
        for i, n_layers in enumerate(self.layer_nums):
            x = ConvBNReLU(self.num_filters[i], dtype=self.dtype, kernel=3,
                           stride=self.layer_strides[i], padding=1,
                           name=f"block{i}_0",
                           use_running_average=self.use_running_average,
                           )(x, use_running_average=not train)
            for j in range(n_layers):
                x = ConvBNReLU(self.num_filters[i], dtype=self.dtype, kernel=3, stride=1,
                               padding=1, name=f"block{i}_{j + 1}",
                               use_running_average=self.use_running_average,
                               )(x, use_running_average=not train)
            s = self.upsample_strides[i]
            if s > 1:
                up = ConvBNReLU(self.num_upsample_filters[i], dtype=self.dtype, kernel=s,
                                stride=s, transpose=True,
                                name=f"deblock{i}",
                                use_running_average=self.use_running_average,
                                )(x, use_running_average=not train)
            else:
                up = ConvBNReLU(self.num_upsample_filters[i], dtype=self.dtype, kernel=1,
                                stride=1, padding=0, name=f"deblock{i}",
                                use_running_average=self.use_running_average,
                                )(x, use_running_average=not train)
            ups.append(up)
        return jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
