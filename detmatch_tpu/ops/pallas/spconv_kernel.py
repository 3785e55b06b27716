"""Fused gather-GEMM sparse-conv kernel (Pallas/TPU).

The XLA path (``ops/spconv.gather_conv``) materializes the (N, K, Cin)
gathered-neighborhood tensor in HBM (write + read ≈ 2·N·K·Cin·4B per layer
— pure bandwidth waste). This kernel keeps the feature table resident in
VMEM (≤16k × 64ch ≈ 4MB) and, per output tile, gathers neighbor rows and
accumulates the K tap GEMMs on the MXU without touching HBM in between.

STATUS (2026-08): experimental, NOT wired into the backbone. Mosaic on this
stack rejects sub-shaped dynamic row gathers inside kernels
(tpu.DynamicGatherOp requires index shape == operand shape, and the square
formulation crashes the backend), so ``fused_gather_conv`` transparently
falls back to the XLA gather path. The kernel is kept as the intended
design for stacks where in-kernel gather lowers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(rb_ref, feats_ref, w_ref, out_ref):
    """One output tile.

    rb_ref: (T, K) int32 rulebook tile (VMEM)
    feats_ref: (N, C) full feature table (VMEM)
    w_ref: (K, C, Co) weights (VMEM)
    out_ref: (T, Co)
    """
    feats = feats_ref[:]            # (N, C)
    rb = rb_ref[:]                  # (T, K)
    k_taps = rb.shape[1]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for k in range(k_taps):
        idx = rb[:, k]
        valid = idx >= 0
        safe = jnp.where(valid, idx, 0)
        gathered = jnp.take(feats, safe, axis=0)   # (T, C)
        gathered = jnp.where(valid[:, None], gathered, 0.0)
        acc = acc + jax.lax.dot_general(
            gathered, w_ref[k],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("tile",))
def pallas_gather_conv(feats, rulebook, weights, tile=256):
    """feats (N, C), rulebook (M, K) int32, weights (K, C, Co) → (M, Co)."""
    m, k = rulebook.shape
    pad = (-m) % tile
    rb = jnp.concatenate(
        [rulebook, jnp.full((pad, k), -1, jnp.int32)], axis=0)
    grid = (rb.shape[0] // tile,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(feats.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, weights.shape[-1]),
                               lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rb.shape[0], weights.shape[-1]),
                                       jnp.float32),
    )(rb, feats, weights)
    return out[:m]


_PALLAS_OK = None


def fused_gather_conv(feats, rulebook, weights):
    """pallas kernel with transparent fallback to the XLA path."""
    global _PALLAS_OK
    from .. import spconv as spconv_mod
    if _PALLAS_OK is False:
        return spconv_mod.gather_conv(feats, rulebook, weights)
    try:
        out = pallas_gather_conv(feats, rulebook, weights)
        _PALLAS_OK = True
        return out
    except Exception:
        _PALLAS_OK = False
        return spconv_mod.gather_conv(feats, rulebook, weights)
