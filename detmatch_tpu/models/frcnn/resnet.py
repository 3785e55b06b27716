"""ResNet-50 (caffe style) backbone with frozen BatchNorm.

Mirrors the external-mmdet backbone the reference configures
(``configs/detmatch/001/detmatch/split_0.py:42-53``): depth 50, caffe style
(stride on the 1x1 conv), BN frozen (norm_eval + requires_grad=False),
frozen_stages=1 (stem + layer1 get no gradients), out_indices (0,1,2,3) →
C2..C5. NHWC layout for TPU.

Frozen BN statistics and affines live in the 'frozen' variable collection so
optimizers never see them (reference: requires_grad=False params are skipped
by torch optimizers).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class FrozenBN(nn.Module):
    """y = (x - mean) / sqrt(var + eps) * scale + bias, all constants."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mean = self.variable("frozen", "mean",
                             lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("frozen", "var",
                            lambda: jnp.ones((c,), jnp.float32))
        scale = self.variable("frozen", "scale",
                              lambda: jnp.ones((c,), jnp.float32))
        bias = self.variable("frozen", "bias",
                             lambda: jnp.zeros((c,), jnp.float32))
        inv = jax.lax.rsqrt(var.value + self.eps) * scale.value
        return (x.astype(jnp.float32) * inv
                + (bias.value - mean.value * inv)).astype(x.dtype)


class Bottleneck(nn.Module):
    planes: int  # bottleneck width; out channels = planes * 4
    stride: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        identity = x
        # caffe style: stride on the first 1x1 conv
        out = nn.Conv(self.planes, (1, 1), strides=self.stride,
                      use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(FrozenBN(name="bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = nn.relu(FrozenBN(name="bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = FrozenBN(name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=self.stride, use_bias=False,
                               dtype=self.dtype, name="ds_conv")(x)
            identity = FrozenBN(name="ds_bn")(identity)
        return nn.relu(out + identity)


class ResNet50(nn.Module):
    """Returns (C2, C3, C4, C5) feature maps, NHWC."""
    stage_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    frozen_stages: int = 1
    dtype: Any = None  # bf16 MXU convs (params/FrozenBN constants f32)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(FrozenBN(name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        for stage, n_blocks in enumerate(self.stage_blocks):
            planes = 64 * (2 ** stage)
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                x = Bottleneck(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0), dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}")(x)
            if self.frozen_stages >= stage + 1:
                x = jax.lax.stop_gradient(x)
            outs.append(x)
        return tuple(outs)


class FPN(nn.Module):
    """mmdet-style FPN: laterals + top-down nearest-upsample + 3x3 convs;
    5th level = stride-2 maxpool of P5 (mmdet FPN extra level)."""
    out_channels: int = 256
    num_outs: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i}")(c)
            for i, c in enumerate(inputs)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = jax.image.resize(
                laterals[i],
                laterals[i - 1].shape[:-1] + (self.out_channels,),
                method="nearest")
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1,
                    dtype=self.dtype, name=f"fpn_conv{i}")(l)
            for i, l in enumerate(laterals)
        ]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)
