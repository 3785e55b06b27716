"""Batched Jonker-Volgenant assignment (Pallas/TPU), whole solve in VMEM.

The reference solves its DETR-style 3D↔2D matching on the host with
``scipy.optimize.linear_sum_assignment``
(``mmdet3d/core/bbox/assigners/modified_hungarian_assigner.py:128-135``).
The on-device XLA formulation (``core/hungarian.py:_solve_masked``) keeps
the math on the TPU but pays XLA while-loop dispatch for every one of the
~K augmenting-path inner steps: profiled at K=128, B=4 the two solves in
the SSL step burn ~224 ms/iter (~3.5k sequential inner steps × ~32 µs
dispatch+HBM round-trip), pure latency on ~100 KB of state.

Here the ENTIRE solve — the outer row-insertion loop, the inner
shortest-augmenting-path relaxation, and the backtracking — runs inside
one kernel body with the (B, K, K) cost matrix and all solver state
resident in VMEM. The B problems advance in lockstep (a (B, K) VPU op
costs barely more than a (1, K) one); per inner step the work is one
masked (B, K, K) row-select reduction plus a handful of (B, K) selects
and reductions. Measured per-step cost in-kernel is ~4 µs (dominated by
(B,1)→(B,K) lane-broadcast relayouts), ~8x cheaper than the XLA
dispatch; end to end the two SSL-step solves drop 224 → ~10 ms
(teacher phase 446 → 303 ms, stu3d heads 827 → 607 ms).

Scatter-free formulation: TPU vector memory has no efficient
lane-dynamic scatter, so every ``x.at[j].set`` of the XLA version becomes
a masked select against a lane iota, and the ``u.at[rows].add`` scatter
becomes an incrementally-maintained ``row_used`` mask (the set of rows on
the current alternating tree — exactly ``{p[j] : used[j]}``).

Semantics are bit-identical to ``core/hungarian.py:_solve_masked`` on the
same padded input: same float op order, same first-occurrence argmin
tie-breaks (verified by ``tests/test_hungarian_coders_losses.py``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9
INF = 1e18


def _round_up(x, m):
    return (x + m - 1) // m * m


def _interpret():
    return jax.default_backend() != "tpu"


def _jv_kernel(cost_ref, rv_ref, p_ref, *, K):
    """Lockstep-batched masked JV: insert valid rows one at a time via
    shortest augmenting paths.

    cost_ref: (B, K, K) f32 — invalid columns pre-padded with BIG.
    rv_ref:   (B, K) f32 — 1.0 where the row is valid (inserted).
    p_ref:    (B, K) i32 out — row matched to each column, -1 if none.
    Requires per-element #valid_rows <= #valid_cols (caller orients).
    """
    cost = cost_ref[...]
    rv = rv_ref[...] > 0.0
    b = cost.shape[0]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (b, K), 1)
    row_iota3 = jax.lax.broadcasted_iota(jnp.int32, (b, K, K), 1)
    virt = jnp.int32(K)  # virtual start column (index K, stored nowhere)

    def at_cols(vec, j):
        """vec[:, j] per element via one-hot reduce → (B, 1)."""
        return jnp.sum(jnp.where(col_iota == j, vec, 0), axis=1,
                       keepdims=True)

    def insert_row(i, state):
        u, v, p = state
        act = at_cols(rv.astype(jnp.int32), i)  # (B, 1) 1 iff row i valid
        # p[virt] = i is implicit: reads of p at virt return i below.
        # Masks are carried as int32 (0/1): Mosaic's scf layout
        # unification rejects loop-carried i1 vectors (scf.yield fails
        # to legalize), while i32/f32 vectors round-trip fine through
        # both scf.for and scf.while. Early exit matters: the augmenting
        # path is usually a handful of steps, vs the K+1 worst case.

        minv0 = jnp.full((b, K), INF, jnp.float32)
        way0 = jnp.full((b, K), virt, jnp.int32)
        used0 = jnp.zeros((b, K), jnp.int32)
        row_used0 = jnp.zeros((b, K), jnp.int32)
        j0_0 = jnp.full((b, 1), virt, jnp.int32)
        done0 = 1 - act  # active elements start at virt, p[virt]=i != -1

        def cond(c):
            return jnp.sum(1 - c[7]) > 0  # any element still pathing

        def body(c):
            u_, v_, minv, way, used, row_used, j0, done = c
            upd = 1 - done  # (B, 1) int
            updb = upd > 0
            p_j0 = jnp.where(j0 == virt, i,
                             jnp.sum(jnp.where(col_iota == j0, p, 0),
                                     axis=1, keepdims=True))
            i0 = p_j0  # row being relaxed (guaranteed >= 0 while ~done)
            used = jnp.maximum(
                used, jnp.where(updb & (col_iota == j0), 1, 0))
            row_used = jnp.maximum(
                row_used, jnp.where(updb & (col_iota == i0), 1, 0))
            usedb = used > 0
            crow = jnp.sum(
                jnp.where(row_iota3 == i0[:, :, None], cost, 0.0), axis=1)
            u_i0 = jnp.sum(jnp.where(col_iota == i0, u_, 0.0), axis=1,
                           keepdims=True)
            cur = crow - u_i0 - v_
            better = (cur < minv) & ~usedb & updb
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(usedb, INF, minv)
            delta = jnp.min(masked, axis=1, keepdims=True)
            # first-occurrence argmin (matches jnp.argmin)
            hit = masked == delta
            j1 = jnp.min(jnp.where(hit, col_iota, K), axis=1,
                         keepdims=True).astype(jnp.int32)
            u_ = u_ + jnp.where((row_used > 0) & updb, delta, 0.0)
            v_ = v_ - jnp.where(usedb & updb, delta, 0.0)
            minv = jnp.where(~usedb & updb, minv - delta, minv)
            j0 = jnp.where(updb, j1, j0)
            p_j1 = jnp.sum(jnp.where(col_iota == j1, p, 0), axis=1,
                           keepdims=True)
            done = jnp.maximum(done,
                               jnp.where(updb & (p_j1 == -1), 1, 0))
            return (u_, v_, minv, way, used, row_used, j0, done)

        u, v, _, way, _, _, j0, _ = jax.lax.while_loop(
            cond, body,
            (u, v, minv0, way0, used0, row_used0, j0_0, done0))

        # backtrack: p[j0] = p[way[j0]]; j0 = way[j0]; stop at virt
        def bt_cond(c):
            return jnp.sum(1 - c[2]) > 0

        def bt_body(c):
            p_, j0_, bdone = c
            live = bdone == 0
            j1 = jnp.sum(jnp.where(col_iota == j0_, way, 0), axis=1,
                         keepdims=True)
            p_j1 = jnp.where(j1 == virt, i,
                             jnp.sum(jnp.where(col_iota == j1, p_, 0),
                                     axis=1, keepdims=True))
            p_ = jnp.where((col_iota == j0_) & live, p_j1, p_)
            j0_ = jnp.where(live, j1, j0_)
            bdone = jnp.maximum(bdone, jnp.where(j0_ == virt, 1, 0))
            return (p_, j0_, bdone)

        p, _, _ = jax.lax.while_loop(bt_cond, bt_body,
                                     (p, j0, 1 - act))
        return (u, v, p)

    u0 = jnp.zeros((b, K), jnp.float32)
    v0 = jnp.zeros((b, K), jnp.float32)
    p0 = jnp.full((b, K), -1, jnp.int32)
    # dynamic outer bound: rows past the last valid one (any element)
    # are guaranteed no-ops — don't pay their inner loops
    nr_max = jnp.max(jnp.where(rv, col_iota + 1, 0))
    _, _, p = jax.lax.fori_loop(0, nr_max, insert_row, (u0, v0, p0))
    p_ref[...] = p


@functools.partial(jax.jit, static_argnames=())
def _jv_pallas(cost, row_valid):
    b, k, _ = cost.shape
    k_pad = _round_up(max(k, 128), 128)
    c = jnp.full((b, k_pad, k_pad), BIG, jnp.float32)
    c = c.at[:, :k, :k].set(cost.astype(jnp.float32))
    rv = jnp.zeros((b, k_pad), jnp.float32).at[:, :k].set(
        row_valid.astype(jnp.float32))
    p = pl.pallas_call(
        functools.partial(_jv_kernel, K=k_pad),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k_pad), jnp.int32),
        interpret=_interpret(),
    )(c, rv)
    return p[:, :k]


def solve_masked_batched(cost, row_valid, impl=None):
    """Batched masked rectangular JV solve.

    Args:
        cost: (B, K, K) float — invalid columns pre-padded with BIG;
        row_valid: (B, K) bool — rows to insert. Per element requires
            #valid_rows <= #valid_cols (caller transposes otherwise).
        impl: None (auto), "pallas", or "xla".
    Returns:
        p: (B, K) int32 — row matched to each column, -1 if none.
    """
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return _jv_pallas(cost, row_valid)
    from ...core.hungarian import _solve_masked
    return jax.vmap(_solve_masked)(cost, row_valid)
