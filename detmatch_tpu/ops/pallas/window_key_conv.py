"""Windowed key-compare sparse conv (Pallas/TPU) — O(M·W·K) not O(M·N·K).

The fused one-hot key conv (``onehot_key_conv.py``) compares every output
tile against the ENTIRE key table: M·N·K compares dominate the backbone
(~24G compares per PV-RCNN forward). With the y-major key order
(``voxelize.linearize``) sorted keys are spatially local, so all 3x3x3
neighbor keys of a tile of consecutive outputs live in a small key window
W (typically ~tile-size, not N). This kernel:

* computes, per output tile, the window [lo, hi) of table positions that
  can contain its neighbor keys (min/max of the tile's neighbor keys +
  two searchsorteds — host-side XLA, exact for any distribution);
* in the kernel, loops over the window's chunks with dynamic trip count,
  DMA-ing keys+features chunks HBM→VMEM, building per-tap one-hot matches
  on the VPU and accumulating out += onehot @ (F_chunk @ W_k) on the MXU.

Backward runs the transposed compare per key tile over a symmetric
m-window: S[k, n, o] = Σ_m 1[nkey[m,k]==key[n]] dOut[m, o], with
dF_tile = Σ_k S_k W_kᵀ and dW_k += F_tileᵀ S_k contracted INSIDE the
kernel per key tile — S lives only in VMEM scratch (materializing it
was ~1.8 GB of HBM per backbone layer at batch 8; the fused contraction
removed that traffic and cut the measured backbone backward ~3x).

Replaces the reference CUDA rulebook+gather spconv
(``pcdet/ops/spconv/``) as the hot path; exact — no dropped neighbors,
any geometry (subm / strided / (3,1,1) z-compress).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..voxelize import INVALID_KEY

# DMA sources must live in HBM: the compiler would otherwise place small
# ANY-space operands in VMEM, where lane-unaligned (C < 128) slices are
# illegal; HBM is untiled so (chunk, C) slices DMA fine.
_HBM = getattr(pltpu, "HBM", None) or getattr(
    getattr(pltpu, "MemorySpace", None), "HBM", None) or pltpu.ANY

_PAD_TABLE = -7
M_TILE = 512
N_CHUNK = 1024


def _round_up(x, m):
    return (x + m - 1) // m * m


def _interpret():
    return jax.default_backend() != "tpu"


def _fwd_kernel(lo_ref, nw_ref, nk_ref, w_ref, keys_any, feats_any,
                out_ref, kbuf, fbuf, sems, *, n_chunk, k_real):
    i = pl.program_id(0)
    k_taps = k_real
    lo = lo_ref[i]
    nw = nw_ref[i]
    out_ref[:] = jnp.zeros_like(out_ref)
    nk = nk_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, nk.shape, 0)

    def start_dma(c, slot):
        start = (lo + c) * n_chunk
        pltpu.make_async_copy(
            keys_any.at[0, pl.ds(start, n_chunk)], kbuf.at[slot, 0],
            sems.at[2 * slot]).start()
        pltpu.make_async_copy(
            feats_any.at[pl.ds(start, n_chunk), :], fbuf.at[slot],
            sems.at[2 * slot + 1]).start()

    def wait_dma(c, slot):
        start = (lo + c) * n_chunk
        pltpu.make_async_copy(
            keys_any.at[0, pl.ds(start, n_chunk)], kbuf.at[slot, 0],
            sems.at[2 * slot]).wait()
        pltpu.make_async_copy(
            feats_any.at[pl.ds(start, n_chunk), :], fbuf.at[slot],
            sems.at[2 * slot + 1]).wait()

    @pl.when(nw > 0)
    def _():
        start_dma(0, 0)

    def body(c, _):
        slot = jax.lax.rem(c, 2)
        # prefetch the next chunk while computing this one
        @pl.when(c + 1 < nw)
        def _():
            start_dma(c + 1, jax.lax.rem(c + 1, 2))

        wait_dma(c, slot)
        # slot is traced; VMEM refs can't be dynamically sliced — branch
        kt, fb32 = jax.lax.cond(
            slot == 0,
            lambda: (kbuf[0, 0, :], fbuf[0]),
            lambda: (kbuf[1, 0, :], fbuf[1]))
        fb = fb32.astype(jnp.bfloat16)
        acc = jnp.zeros_like(out_ref)
        for k in range(k_taps):
            qk = jnp.sum(jnp.where(row == k, nk, 0), axis=0)  # (Tm,)
            onehot = (qk[:, None] == kt[None, :]).astype(jnp.bfloat16)
            fbw = jax.lax.dot_general(
                fb, w_ref[k].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                onehot, fbw,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[:] += acc
        return 0

    jax.lax.fori_loop(0, nw, body, 0)


@functools.partial(jax.jit, static_argnames=())
def _windows(sorted_keys, tile_queries_min, tile_queries_max, n_pad):
    """Per-tile chunk windows. sorted_keys: (N_pad,) with INVALID pad.

    Returns (lo_chunk (T,), n_chunks (T,)) int32; tiles with no valid
    queries get n_chunks = 0.
    """
    has = tile_queries_min <= tile_queries_max
    lo_pos = jnp.searchsorted(sorted_keys, tile_queries_min).astype(
        jnp.int32)
    hi_pos = jnp.searchsorted(sorted_keys, tile_queries_max,
                              side="right").astype(jnp.int32)
    lo_chunk = jnp.clip(lo_pos // N_CHUNK, 0, n_pad // N_CHUNK - 1)
    nch = jnp.clip(
        (hi_pos + N_CHUNK - 1) // N_CHUNK - lo_chunk,
        0, n_pad // N_CHUNK - lo_chunk)
    return (jnp.where(has, lo_chunk, 0),
            jnp.where(has, nch, 0))


def _fwd(feats, keys, nkeys, weights):
    """feats (N, C) f32, keys (N,) sorted int32 (INVALID pad),
    nkeys (M, K), weights (K, C, Co) → (M, Co) f32."""
    n, c = feats.shape
    m, k = nkeys.shape
    co = weights.shape[-1]
    n_pad = _round_up(n, N_CHUNK)
    m_pad = _round_up(m, M_TILE)
    # lane-pad channels to 128: DMA slices must be lane-aligned, and the
    # padded contraction is exactly one full-width MXU pass (zeros cost
    # nothing on the systolic array)
    c_pad = _round_up(c, 128)
    # the tap dim must respect the int32 sublane tile (conv_out has K=3)
    k_pad = _round_up(k, 8)

    keys_kernel = jnp.full((1, n_pad), _PAD_TABLE, jnp.int32).at[0, :n].set(
        jnp.where(keys == INVALID_KEY, _PAD_TABLE, keys))
    feats_p = jnp.zeros((n_pad, c_pad), feats.dtype).at[:n, :c].set(feats)
    weights_p = jnp.zeros((k_pad, c_pad, co), weights.dtype
                          ).at[:k, :c, :].set(weights)
    keys_search = jnp.full((n_pad,), INVALID_KEY, jnp.int32).at[:n].set(keys)

    nk_p = jnp.full((m_pad, k_pad), INVALID_KEY, jnp.int32
                    ).at[:m, :k].set(nkeys)
    tiles = nk_p.reshape(m_pad // M_TILE, M_TILE * k_pad)
    valid_q = tiles != INVALID_KEY
    tmin = jnp.min(jnp.where(valid_q, tiles, INVALID_KEY), axis=1)
    tmax = jnp.max(jnp.where(valid_q, tiles, -1), axis=1)
    lo, nw = _windows(keys_search, tmin, tmax, n_pad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(m_pad // M_TILE,),
        in_specs=[
            pl.BlockSpec((k_pad, M_TILE), lambda i, lo, nw: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, whole
            pl.BlockSpec(memory_space=_HBM),   # keys (DMA)
            pl.BlockSpec(memory_space=_HBM),   # feats (DMA)
        ],
        out_specs=pl.BlockSpec((M_TILE, co), lambda i, lo, nw: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 1, N_CHUNK), jnp.int32),     # double-buffered
            pltpu.VMEM((2, N_CHUNK, c_pad), feats.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_chunk=N_CHUNK, k_real=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, co), jnp.float32),
        interpret=_interpret(),
    )(lo, nw, nk_p.T, weights_p, keys_kernel, feats_p)
    return out[:m]


def _bwd_kernel(lo_ref, nw_ref, keys_ref, feats_ref, w_ref, nk_any,
                dout_any, dfeats_ref, dw_ref, s_scr, nkbuf, dbuf, sems,
                *, m_chunk, k_real):
    """Per key tile: accumulate the per-tap scatter S in VMEM scratch,
    then contract it against the weights (→ dfeats tile) and the feats
    tile (→ dw accumulator) WITHOUT ever writing S to HBM (the previous
    formulation materialized S (K, N, Co) ≈ 1.8 GB per backbone layer at
    batch 8, and the two XLA einsums re-read it — the whole backbone
    backward was HBM-bound on that tensor)."""
    i = pl.program_id(0)
    k_taps = k_real
    lo = lo_ref[i]
    nw = nw_ref[i]
    s_scr[:] = jnp.zeros_like(s_scr)
    kt = keys_ref[0, :]  # (Tn,)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    def body(c, _):
        start = (lo + c) * m_chunk
        cp_n = pltpu.make_async_copy(
            nk_any.at[:, pl.ds(start, m_chunk)], nkbuf, sems.at[0])
        cp_d = pltpu.make_async_copy(
            dout_any.at[pl.ds(start, m_chunk), :], dbuf, sems.at[1])
        cp_n.start()
        cp_d.start()
        cp_n.wait()
        cp_d.wait()
        nk = nkbuf[:]
        row = jax.lax.broadcasted_iota(jnp.int32, nk.shape, 0)
        db = dbuf[:].astype(jnp.bfloat16)
        for k in range(k_taps):
            qk = jnp.sum(jnp.where(row == k, nk, 0), axis=0)  # (mc,)
            onehot_t = (kt[:, None] == qk[None, :]).astype(jnp.bfloat16)
            s_scr[k] += jax.lax.dot_general(
                onehot_t, db,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, nw, body, 0)

    ft = feats_ref[:]  # (Tn, C)
    dfe = jnp.zeros_like(dfeats_ref)
    for k in range(k_taps):
        sk = s_scr[k]  # (Tn, Co)
        # dfeats_tile += S_k @ W_k^T   (contraction over Co)
        dfe = dfe + jax.lax.dot_general(
            sk, w_ref[k],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dW_k += F_tile^T @ S_k      (contraction over Tn)
        dw_ref[k] += jax.lax.dot_general(
            ft, sk,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dfeats_ref[:] = dfe


def _bwd_fused(dout, feats, keys, nkeys, out_keys, weights):
    """(dfeats (N, C), dw (K, C, Co)) in one kernel — the per-tap
    scatter S lives only in VMEM scratch per key tile."""
    m, k = nkeys.shape
    n, c = feats.shape
    co = dout.shape[-1]
    m_chunk = 512
    n_tile = 512
    m_pad = _round_up(m, m_chunk)
    n_pad = _round_up(n, n_tile)
    c_pad = _round_up(c, 128)
    co_pad = _round_up(co, 128)
    k_pad = _round_up(k, 8)

    keys_kernel = jnp.full((1, n_pad), _PAD_TABLE, jnp.int32).at[0, :n].set(
        jnp.where(keys == INVALID_KEY, _PAD_TABLE, keys))
    nk_p = jnp.full((m_pad, k_pad), INVALID_KEY, jnp.int32
                    ).at[:m, :k].set(nkeys)
    dout_p = jnp.zeros((m_pad, co_pad), dout.dtype).at[:m, :co].set(dout)
    ok_p = jnp.full((m_pad,), INVALID_KEY, jnp.int32).at[:m].set(out_keys)

    # m-window per key tile: consumers m with key_m in
    # [tile_min - delta, tile_max + delta], delta = max |nkey - out_key|
    valid = (nk_p != INVALID_KEY) & (ok_p != INVALID_KEY)[:, None]
    delta = jnp.max(jnp.where(
        valid, jnp.abs(nk_p - ok_p[:, None]), 0))
    keys_t = jnp.full((n_pad,), INVALID_KEY, jnp.int32).at[:n].set(keys)
    tiles = keys_t.reshape(n_pad // n_tile, n_tile)
    tvalid = tiles != INVALID_KEY
    tmin = jnp.min(jnp.where(tvalid, tiles, INVALID_KEY), axis=1)
    tmax = jnp.max(jnp.where(tvalid, tiles, -1), axis=1)
    has = tmin <= tmax
    ok_search = jnp.where(ok_p == INVALID_KEY, INVALID_KEY, ok_p)
    lo_pos = jnp.searchsorted(ok_search, tmin - delta).astype(jnp.int32)
    hi_pos = jnp.searchsorted(ok_search, tmax + delta,
                              side="right").astype(jnp.int32)
    lo = jnp.clip(lo_pos // m_chunk, 0, m_pad // m_chunk - 1)
    nw = jnp.clip((hi_pos + m_chunk - 1) // m_chunk - lo,
                  0, m_pad // m_chunk - lo)
    lo = jnp.where(has, lo, 0)
    nw = jnp.where(has, nw, 0)

    feats_p = jnp.zeros((n_pad, c_pad), feats.dtype).at[:n, :c].set(feats)
    weights_p = jnp.zeros((k_pad, c_pad, co_pad), weights.dtype
                          ).at[:k, :c, :co].set(weights)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pad // n_tile,),
        in_specs=[
            pl.BlockSpec((1, n_tile), lambda i, lo, nw: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tile, c_pad), lambda i, lo, nw: (i, 0),
                         memory_space=pltpu.VMEM),  # feats tile
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, whole
            pl.BlockSpec(memory_space=_HBM),  # nkT
            pl.BlockSpec(memory_space=_HBM),  # dout
        ],
        out_specs=[
            pl.BlockSpec((n_tile, c_pad), lambda i, lo, nw: (i, 0),
                         memory_space=pltpu.VMEM),  # dfeats tile
            # dw: every grid step maps the SAME block — it stays VMEM-
            # resident across the whole kernel, written back at the end
            pl.BlockSpec((k_pad, c_pad, co_pad),
                         lambda i, lo, nw: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((k_pad, n_tile, co_pad), jnp.float32),
            pltpu.VMEM((k_pad, m_chunk), jnp.int32),
            pltpu.VMEM((m_chunk, co_pad), dout.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dfeats, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, m_chunk=m_chunk, k_real=k),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((k_pad, c_pad, co_pad), jnp.float32),
        ],
        interpret=_interpret(),
    )(lo, nw, keys_kernel, feats_p, weights_p, nk_p.T, dout_p)
    return dfeats[:n, :c], dw[:k, :c, :co]


@jax.custom_vjp
def window_key_conv(feats, keys, nkeys, out_keys, weights):
    """Windowed sparse conv, single sample.

    feats (N, C) f32; keys (N,) sorted int32 (INVALID pad);
    nkeys (M, K) neighbor keys (INVALID = no tap); out_keys (M,) the
    conv's output keys (only used for backward windows — == keys for
    submanifold convs); weights (K, C, Co) → out (M, Co) f32.
    """
    return _fwd(feats, keys, nkeys, weights)


def _vjp_fwd(feats, keys, nkeys, out_keys, weights):
    return _fwd(feats, keys, nkeys, weights), (feats, keys, nkeys,
                                               out_keys, weights)


def _vjp_bwd(res, dout):
    feats, keys, nkeys, out_keys, weights = res
    dfeats, dw = _bwd_fused(dout, feats, keys, nkeys, out_keys, weights)
    return dfeats.astype(feats.dtype), None, None, None, \
        dw.astype(weights.dtype)


window_key_conv.defvjp(_vjp_fwd, _vjp_bwd)


def window_key_conv_batched(feats, keys, nkeys, out_keys, weights, band):
    """(B, N, C) x (B, N) x (B, M, K) x (B, M) x (K, C, Co) → (B, M, Co).

    Samples flatten into the row dim with disjoint per-sample key bands
    (band = prod(spatial_shape) + 1, static; requires B * band < 2^31).
    Window locality survives flattening because bands keep samples
    disjoint and each sample stays sorted.
    """
    b, n, c = feats.shape
    m, k = nkeys.shape[1], nkeys.shape[2]
    off = (jnp.arange(b, dtype=jnp.int32) * band)[:, None]
    keys_f = jnp.where(keys == INVALID_KEY, INVALID_KEY,
                       keys + off).reshape(-1)
    nk_f = jnp.where(nkeys == INVALID_KEY, INVALID_KEY,
                     nkeys + off[:, :, None]).reshape(b * m, k)
    ok_f = jnp.where(out_keys == INVALID_KEY, INVALID_KEY,
                     out_keys + off).reshape(-1)
    out = window_key_conv(feats.reshape(b * n, c), keys_f, nk_f, ok_f,
                          weights)
    return out.reshape(b, m, -1)
