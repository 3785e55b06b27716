"""Plain row gather as one-hot matmul (Pallas/TPU), with custom VJP.

Generic replacement for ``x[idx]`` row gathers on TPU, where dynamic
gathers run at ~10M rows/s. One-hot matmuls run the same data movement on
the MXU: out = 1[idx == n] @ X. Used by the point-set ops (VSA grouping,
RoI-grid pooling, keypoint selection) through
``pointnet.gather_rows``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _interpret():
    return jax.default_backend() != "tpu"


def _gather_kernel(idx_ref, x_ref, out_ref, *, n_tile):
    tq = idx_ref.shape[0]
    n, c = x_ref.shape
    idx = idx_ref[:, 0]
    acc = jnp.zeros((tq, c), jnp.float32)
    for nt in range(n // n_tile):
        x_tile = x_ref[nt * n_tile:(nt + 1) * n_tile, :]
        cols = nt * n_tile + jax.lax.broadcasted_iota(
            jnp.int32, (tq, n_tile), 1)
        onehot = (idx[:, None] == cols).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            onehot, x_tile,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("q_tile", "n_tile"))
def _gather_fwd(x, idx, q_tile=512, n_tile=512):
    """x (N, C) f32, idx (Q,) int32 (-1 → zeros) → (Q, C) f32."""
    n, c = x.shape
    q = idx.shape[0]
    n_pad = _round_up(n, n_tile)
    q_pad = _round_up(q, q_tile)
    x_p = jnp.zeros((n_pad, c), jnp.bfloat16).at[:n].set(
        x.astype(jnp.bfloat16))
    idx_p = jnp.full((q_pad, 1), -1, jnp.int32).at[:q, 0].set(idx)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, n_tile=n_tile),
        grid=(q_pad // q_tile,),
        in_specs=[
            pl.BlockSpec((q_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q_pad, c), jnp.float32),
        interpret=_interpret(),
    )(idx_p, x_p)
    return out[:q]


def _scatter_kernel(idx_ref, d_ref, out_ref, *, q_tile):
    tn, c = out_ref.shape
    q = idx_ref.shape[0]
    i = pl.program_id(0)
    base = i * tn
    acc = jnp.zeros((tn, c), jnp.float32)
    for qt in range(q // q_tile):
        idx = idx_ref[pl.ds(qt * q_tile, q_tile), 0]
        dvals = d_ref[pl.ds(qt * q_tile, q_tile), :]
        rows = base + jax.lax.broadcasted_iota(jnp.int32, (tn, q_tile), 0)
        onehot_t = (rows == idx[None, :]).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            onehot_t, dvals,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("n_total", "q_tile",
                                             "n_tile"))
def _scatter_add(dout, idx, n_total, q_tile=512, n_tile=512):
    q, c = dout.shape
    q_pad = _round_up(q, q_tile)
    n_pad = _round_up(n_total, n_tile)
    idx_p = jnp.full((q_pad, 1), -1, jnp.int32).at[:q, 0].set(idx)
    d_p = jnp.zeros((q_pad, c), jnp.bfloat16).at[:q].set(
        dout.astype(jnp.bfloat16))
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, q_tile=q_tile),
        grid=(n_pad // n_tile,),
        in_specs=[
            pl.BlockSpec((q_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        interpret=_interpret(),
    )(idx_p, d_p)
    return out[:n_total]


@jax.custom_vjp
def onehot_take_rows(x, idx):
    """x (N, C) f32, idx (Q,) int32 → (Q, C); idx -1 yields zeros."""
    return _gather_fwd(x, idx)


def _vjp_fwd(x, idx):
    # zero-width template carries x's static row count + dtype through the
    # residuals (python ints / dtypes are not valid JAX residual types)
    template = jnp.zeros((x.shape[0], 0), x.dtype)
    return _gather_fwd(x, idx), (idx, template)


def _vjp_bwd(res, dout):
    idx, template = res
    n, dtype = template.shape[0], template.dtype
    return _scatter_add(dout, idx, n).astype(dtype), None


onehot_take_rows.defvjp(_vjp_fwd, _vjp_bwd)
