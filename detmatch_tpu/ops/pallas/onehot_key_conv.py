"""Sparse conv with lookup FUSED into the MXU one-hot matmul (Pallas/TPU).

Measurement on the real chip showed both halves of the classic sparse-conv
pipeline are gather-bound on TPU:
  * rulebook build via binary search = log2(N) rounds of row gathers
    (~187 ms per level on KITTI-sized inputs);
  * the gather-GEMM itself = one more giant row gather.

This kernel removes BOTH: instead of materializing integer neighbor
indices, each output tile compares its neighbor KEYS (computed elementwise
— no gathers) against the level's key table and feeds the resulting 0/1
matrix straight into the MXU:

    out[m] = Σ_k Σ_n 1[nkey[m,k] == key[n]] · F[n] · W[k]

Compares are VPU work (M·N·K), matmuls are MXU work (M·N·K·C); no dynamic
indexing anywhere. The backward pass uses the transposed compare
(scatter-by-key) plus two plain GEMMs — see ``_vjp_bwd``.

Key-space invariants: valid keys ∈ [0, prod(shape)) and are unique per
sample; INVALID_KEY (int32 max) pads both tables and neighbor keys, and
the table padding is remapped to -7 so INVALID == INVALID can never fire.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..voxelize import INVALID_KEY

_PAD_TABLE = -7


def _round_up(x, m):
    return (x + m - 1) // m * m


def _interpret():
    return jax.default_backend() != "tpu"


def _fwd_kernel(nk_ref, keys_ref, feats_ref, w_ref, out_ref, *, n_tile):
    """One (out-tile, tap) grid cell; taps accumulate into the revisited
    out block (grid iterates taps fastest → the block stays in VMEM).
    Keeping kernel bodies small (≤ ~40 matmuls) matters: some Mosaic
    compilers crash on bodies with hundreds of unrolled matmuls.

    nk block (K, Tm) from the transposed (K, M) neighbor keys; the tap
    row is extracted with an iota-select reduction — Mosaic lowers
    neither dynamic lane loads nor (1, ·) sublane blocks; keys (1, N);
    feats (N, C); w block (1, C, Co).
    """
    tm = nk_ref.shape[1]
    n = keys_ref.shape[1]
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    nk = nk_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, nk.shape, 0)
    q = jnp.sum(jnp.where(row == k, nk, 0), axis=0)
    g = jnp.zeros((tm, feats_ref.shape[1]), jnp.float32)
    for nt in range(n // n_tile):
        key_tile = keys_ref[0, nt * n_tile:(nt + 1) * n_tile]
        f_tile = feats_ref[nt * n_tile:(nt + 1) * n_tile, :]
        onehot = (q[:, None] == key_tile[None, :]).astype(jnp.bfloat16)
        g = g + jax.lax.dot_general(
            onehot, f_tile,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[:] += jax.lax.dot_general(
        g.astype(jnp.bfloat16), w_ref[0].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("m_tile", "n_tile"))
def _key_conv_fwd(feats, keys, nkeys, weights, m_tile=256, n_tile=512):
    """feats (N, C), keys (N,), nkeys (M, K), weights (K, C, Co) → (M, Co)."""
    n, c = feats.shape
    m, k = nkeys.shape
    n_pad = _round_up(n, n_tile)
    m_pad = _round_up(m, m_tile)
    feats_p = jnp.zeros((n_pad, c), jnp.bfloat16).at[:n].set(
        feats.astype(jnp.bfloat16))
    keys_clean = jnp.where(keys == INVALID_KEY, _PAD_TABLE, keys)
    keys_p = jnp.full((1, n_pad), _PAD_TABLE, jnp.int32).at[0, :n].set(
        keys_clean)
    nk_p = jnp.full((k, m_pad), INVALID_KEY, jnp.int32).at[:, :m].set(
        nkeys.T)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_tile=n_tile),
        grid=(m_pad // m_tile, k),
        in_specs=[
            pl.BlockSpec((k, m_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + weights.shape[1:], lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, weights.shape[-1]),
                               lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, weights.shape[-1]),
                                       jnp.float32),
        interpret=_interpret(),
    )(nk_p, keys_p, feats_p, weights)
    return out[:m]


def _scatter_kernel(nk_ref, keys_ref, dout_ref, s_ref, *, m_tile_inner):
    """S[k, n] = Σ_m 1[nkey[m,k] == key[n]] dOut[m] for one (key-tile, tap)
    grid cell. The tap loop lives in the GRID, not the body: large unrolled
    kernel bodies (hundreds of matmuls) crash some Mosaic compilers.

    nk block (K, M) = the transposed keys (full); the tap row is
    extracted via iota-select (dynamic sublane/lane loads don't lower);
    keys block (1, Tn); dout (M, Co); out block (1, Tn, Co).
    """
    tn = s_ref.shape[1]
    co = s_ref.shape[2]
    m = nk_ref.shape[1]
    k = pl.program_id(0)
    key_tile = keys_ref[0, :]
    acc = jnp.zeros((tn, co), jnp.float32)
    for mt in range(m // m_tile_inner):
        nk = nk_ref[:, pl.ds(mt * m_tile_inner, m_tile_inner)]
        row = jax.lax.broadcasted_iota(jnp.int32, nk.shape, 0)
        q = jnp.sum(jnp.where(row == k, nk, 0), axis=0)
        dvals = dout_ref[pl.ds(mt * m_tile_inner, m_tile_inner), :]
        onehot_t = (key_tile[:, None] == q[None, :]).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            onehot_t, dvals,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    s_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("n_total", "n_tile",
                                             "m_tile"))
def _key_scatter_all_taps(dout, keys, nkeys, n_total, n_tile=256,
                          m_tile=512):
    m, k = nkeys.shape
    co = dout.shape[-1]
    m_pad = _round_up(m, m_tile)
    n_pad = _round_up(n_total, n_tile)
    keys_clean = jnp.where(keys == INVALID_KEY, _PAD_TABLE, keys)
    keys_p = jnp.full((1, n_pad), _PAD_TABLE, jnp.int32).at[0, :n_total
                                                            ].set(keys_clean)
    nk_p = jnp.full((k, m_pad), INVALID_KEY, jnp.int32).at[:, :m].set(
        nkeys.T)
    dout_p = jnp.zeros((m_pad, co), jnp.bfloat16).at[:m].set(
        dout.astype(jnp.bfloat16))
    s = pl.pallas_call(
        functools.partial(_scatter_kernel, m_tile_inner=m_tile),
        grid=(k, n_pad // n_tile),
        in_specs=[
            pl.BlockSpec((k, m_pad), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, co), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_tile, co), lambda j, i: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n_pad, co), jnp.float32),
        interpret=_interpret(),
    )(nk_p, keys_p, dout_p)
    return s[:, :n_total]


@jax.custom_vjp
def key_conv(feats, keys, nkeys, weights):
    """Differentiable fused lookup+gather+GEMM sparse conv (single sample).

    feats (N, C) f32, keys (N,) int32 sorted/unique (INVALID_KEY pad),
    nkeys (M, K) int32 neighbor keys, weights (K, C, Co) → (M, Co) f32.
    """
    return _key_conv_fwd(feats, keys, nkeys, weights)


def _vjp_fwd(feats, keys, nkeys, weights):
    return _key_conv_fwd(feats, keys, nkeys, weights), (feats, keys,
                                                        nkeys, weights)


def _vjp_bwd(res, dout):
    feats, keys, nkeys, weights = res
    s = _key_scatter_all_taps(dout, keys, nkeys, feats.shape[0])
    dfeats = jnp.einsum("kno,kco->nc", s, weights,
                        preferred_element_type=jnp.float32)
    dw = jnp.einsum("nc,kno->kco", feats, s,
                    preferred_element_type=jnp.float32)
    return dfeats.astype(feats.dtype), None, None, dw.astype(weights.dtype)


key_conv.defvjp(_vjp_fwd, _vjp_bwd)


def key_conv_batched(feats, keys, nkeys, weights, band):
    """(B, N, C) × (B, N) × (B, M, K) × (K, C, Co) → (B, M, Co).

    Samples are flattened into the row dimension; keys get disjoint
    per-sample bands (band = prod(spatial_shape) + 1, static) so
    cross-sample keys never match. Requires B * band < 2^31.
    """
    b, n, c = feats.shape
    m, k = nkeys.shape[1], nkeys.shape[2]
    off = (jnp.arange(b, dtype=jnp.int32) * band)[:, None]
    keys_f = jnp.where(keys == INVALID_KEY, INVALID_KEY,
                       keys + off).reshape(-1)
    nk_f = jnp.where(nkeys == INVALID_KEY, INVALID_KEY,
                     nkeys + off[:, :, None]).reshape(b * m, k)
    out = key_conv(feats.reshape(b * n, c), keys_f, nk_f, weights)
    return out.reshape(b, m, -1)
