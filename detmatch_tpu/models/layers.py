"""Shared NN building blocks (flax.linen) for masked, fixed-capacity data.

MaskedBatchNorm mirrors torch ``BatchNorm1d(eps=1e-3, momentum=0.01)`` as
used throughout the reference PV-RCNN (``spconv_backbone.py:74``,
``base_bev_backbone.py``) but computes statistics only over valid (masked)
rows, since our sparse tensors are fixed-capacity buffers with padding.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all leading dims of (..., C) restricted to mask.

    torch-style running stats: running = (1 - momentum) * running +
    momentum * batch (torch momentum semantics, default here 0.01 to match
    the reference's ``momentum=0.01``).
    """
    momentum: float = 0.01
    eps: float = 1e-3
    use_running_average: bool = False

    @nn.compact
    def __call__(self, x, mask=None, use_running_average=None):
        use_ra = (self.use_running_average
                  if use_running_average is None else use_running_average)
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.reshape(-1, c).astype(jnp.float32)
            if mask is not None:
                m = mask.reshape(-1, 1).astype(jnp.float32)
                cnt = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(xf * m, axis=0) / cnt
                var = jnp.sum((xf - mean) ** 2 * m, axis=0) / cnt
                # unbiased var for running stats (torch semantics)
                var_unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
            else:
                mean = jnp.mean(xf, axis=0)
                var = jnp.var(xf, axis=0)
                n = xf.shape[0]
                var_unbiased = var * n / max(n - 1, 1)
            if not self.is_initializing():
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * var_unbiased)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        if mask is not None:
            y = jnp.where(mask[..., None], y, 0.0)
        return y.astype(x.dtype)


class MLP(nn.Module):
    """Pointwise Linear+BN+ReLU stack over the last axis (masked).

    ``eps`` mirrors the torch module being twinned: the reference's
    ``make_fc_layers`` BatchNorm1d keeps the torch default 1e-5
    (``point_head_template.py:36-46``), unlike the backbone's 1e-3."""
    features: Sequence[int]
    use_running_average: bool = False
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x, mask=None, use_running_average=None):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, use_bias=False, name=f"dense{i}")(x)
            x = MaskedBatchNorm(
                name=f"bn{i}", eps=self.eps,
                use_running_average=self.use_running_average,
            )(x, mask=mask, use_running_average=use_running_average)
            x = nn.relu(x)
        return x


class ConvBNReLU(nn.Module):
    """Dense 2D conv block (NHWC), torch BatchNorm2d(eps 1e-3, mom 0.01).

    ``dtype=bfloat16`` runs the conv on the MXU in bf16 (params stay f32;
    BN statistics are computed in f32)."""
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    use_running_average: bool = False
    transpose: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, use_running_average=None):
        if self.transpose:
            x = nn.ConvTranspose(
                self.features, (self.kernel, self.kernel),
                strides=(self.stride, self.stride), padding="SAME",
                use_bias=False, dtype=self.dtype, name="conv")(x)
        else:
            x = nn.Conv(
                self.features, (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=[(self.padding, self.padding)] * 2,
                use_bias=False, dtype=self.dtype, name="conv")(x)
        x = MaskedBatchNorm(
            name="bn", use_running_average=self.use_running_average,
        )(x, use_running_average=use_running_average)
        return nn.relu(x)
