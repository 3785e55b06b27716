"""Exact Hungarian (Jonker-Volgenant) assignment, on-device and batched.

The reference solves its DETR-style 3D↔2D matching with
``scipy.optimize.linear_sum_assignment`` on the CPU
(``mmdet3d/core/bbox/assigners/modified_hungarian_assigner.py:128-135``) —
a device→host sync in the middle of every unlabeled SSL step. Here the same
exact optimum is computed on the TPU with the classic potentials-based
shortest-augmenting-path algorithm (O(K^3), K = padded problem size ≤ ~128),
expressed as ``lax`` loops so it jits and vmaps across the batch: the SSL
step keeps zero host round-trips.

Masking/rectangularity: rows are only *inserted* if valid, and we always
process the smaller side (transposing if needed), so the BIG padding used
for invalid columns is never selected and never contaminates the f32
potentials — the result is exactly scipy's rectangular optimum.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 1e9
INF = 1e18


def _solve_masked(cost, row_valid):
    """Insert valid rows one by one via shortest augmenting paths.

    Args:
        cost: (K, K); invalid columns must be pre-padded with BIG.
        row_valid: (K,) bool; invalid rows are skipped entirely.
    Requires #valid_rows <= #valid_cols (caller transposes otherwise).
    Returns:
        p: (K,) int32 — row matched to each column, -1 if none.
    """
    K = cost.shape[0]
    virt = K  # virtual start column index

    def insert_row(i, state):
        u, v, p = state  # u:(K,), v:(K+1,), p:(K+1,) row matched to col
        p = p.at[virt].set(i)
        minv0 = jnp.full((K,), INF, cost.dtype)
        way0 = jnp.full((K + 1,), virt, jnp.int32)
        used0 = jnp.zeros((K + 1,), bool)

        def cond(c):
            _, _, _, _, _, j0_, p_ = c
            return p_[j0_] != -1

        def body(c):
            u_, v_, minv_, way_, used_, j0_, p_ = c
            used_ = used_.at[j0_].set(True)
            i0 = p_[j0_]
            cur = cost[i0, :] - u_[i0] - v_[:K]
            better = (cur < minv_) & ~used_[:K]
            minv_ = jnp.where(better, cur, minv_)
            way_ = way_.at[:K].set(jnp.where(better, j0_, way_[:K]))
            masked = jnp.where(used_[:K], INF, minv_)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            rows = jnp.where(used_, p_, 0)
            u_ = u_.at[rows].add(jnp.where(used_, delta, 0.0))
            v_ = v_ - jnp.where(used_, delta, 0.0)
            minv_ = jnp.where(used_[:K], minv_, minv_ - delta)
            return (u_, v_, minv_, way_, used_, j1, p_)

        u, v, minv, way, used, j0, p = jax.lax.while_loop(
            cond, body, (u, v, minv0, way0, used0, jnp.int32(virt), p)
        )

        def back_cond(c):
            _, j0_ = c
            return j0_ != virt

        def back_body(c):
            p_, j0_ = c
            j1 = way[j0_]
            p_ = p_.at[j0_].set(p_[j1])
            return (p_, j1)

        p, _ = jax.lax.while_loop(back_cond, back_body, (p, j0))
        return (u, v, p)

    def maybe_insert(i, state):
        return jax.lax.cond(row_valid[i], lambda s: insert_row(i, s),
                            lambda s: s, state)

    u0 = jnp.zeros((K,), cost.dtype)
    v0 = jnp.zeros((K + 1,), cost.dtype)
    p0 = jnp.full((K + 1,), -1, jnp.int32)
    _, _, p = jax.lax.fori_loop(0, K, maybe_insert, (u0, v0, p0))
    return p[:K]


@jax.jit
def solve(cost):
    """Exact min-cost square assignment of a full (K, K) matrix.

    Returns col4row: (K,) int32 — the optimal column permutation.
    """
    K = cost.shape[0]
    p = _solve_masked(cost, jnp.ones((K,), bool))
    col4row = jnp.zeros((K,), jnp.int32)
    col4row = col4row.at[p].set(jnp.arange(K, dtype=jnp.int32))
    return col4row


@jax.jit
def assign(cost, row_valid, col_valid):
    """Masked rectangular assignment (scipy ``linear_sum_assignment``
    semantics on the valid submatrix).

    Args:
        cost: (K, K) float; row_valid/col_valid: (K,) bool.
    Returns:
        (col4row (K,) int32 with -1 for unmatched/invalid rows,
         match_cost (K,) float — cost of each row's match, +inf if unmatched)

    Matches the reference assigner's outputs: per-pred matched gt index
    (``assigned_gt_inds - 1``) and per-pred total cost (``max_overlaps``,
    Inf for background) — ``modified_hungarian_assigner.py:137-162``.
    """
    K = cost.shape[0]
    nr = jnp.sum(row_valid)
    nc = jnp.sum(col_valid)

    def rows_small(_):
        c = jnp.where(col_valid[None, :], cost, BIG)
        p = _solve_masked(c, row_valid)  # p[j] = row matched to col j
        c4r = jnp.full((K,), -1, jnp.int32)
        cols = jnp.arange(K, dtype=jnp.int32)
        # out-of-bounds scatter indices are dropped by JAX: route unmatched
        # columns (p[j] == -1) to index K so they don't clobber row 0
        idx = jnp.where(p >= 0, p, K)
        c4r = c4r.at[idx].set(cols)
        return c4r

    def cols_small(_):
        c = jnp.where(row_valid[None, :], cost.T, BIG)
        p = _solve_masked(c, col_valid)  # p[j] = col matched to row j
        return p  # already col4row

    col4row = jax.lax.cond(nr <= nc, rows_small, cols_small, None)
    safe = jnp.clip(col4row, 0, K - 1)
    matched_cost = jnp.take_along_axis(cost, safe[:, None], axis=1)[:, 0]
    ok = (col4row >= 0) & row_valid & col_valid[safe]
    col4row = jnp.where(ok, col4row, -1)
    matched_cost = jnp.where(ok, matched_cost, jnp.inf)
    return col4row, matched_cost


def assign_batched(cost, row_valid, col_valid, impl=None):
    """Batched :func:`assign` — same outputs, one batched solve.

    ``jax.vmap(assign)`` has two problems on the hot path: ``lax.cond``
    under vmap evaluates BOTH orientation branches (two full O(K^3)
    solves per element), and the vmapped while-loops pay XLA dispatch
    per inner step (~224 ms/iter at K=128, B=4 in the SSL step).  Here
    the orientation is selected *before* a single batched solve, which
    dispatches to the Pallas in-VMEM kernel on TPU
    (``ops/pallas/hungarian.py``) and a vmapped XLA solve elsewhere.

    Args:
        cost: (B, K, K) float; row_valid/col_valid: (B, K) bool.
    Returns:
        (col4row (B, K) int32, matched_cost (B, K) float) — per-element
        identical to :func:`assign`.
    """
    from ..ops.pallas.hungarian import solve_masked_batched

    nr = jnp.sum(row_valid, axis=1)
    nc = jnp.sum(col_valid, axis=1)
    transposed = (nr > nc)[:, None]  # (B, 1)
    c_rows = jnp.where(col_valid[:, None, :], cost, BIG)
    c_cols = jnp.where(row_valid[:, None, :],
                       jnp.swapaxes(cost, 1, 2), BIG)
    c_eff = jnp.where(transposed[:, :, None], c_cols, c_rows)
    rv_eff = jnp.where(transposed, col_valid, row_valid)
    p = solve_masked_batched(c_eff, rv_eff, impl=impl)

    def post(cost_b, rv_b, cv_b, p_b, tr_b):
        K = cost_b.shape[0]
        cols = jnp.arange(K, dtype=jnp.int32)
        # rows_small orientation: p maps col -> row; scatter to col4row
        # (out-of-bounds index K drops unmatched columns)
        idx = jnp.where(p_b >= 0, p_b, K)
        c4r_rows = jnp.full((K,), -1, jnp.int32).at[idx].set(cols)
        col4row = jnp.where(tr_b, p_b, c4r_rows)
        safe = jnp.clip(col4row, 0, K - 1)
        mcost = jnp.take_along_axis(cost_b, safe[:, None], axis=1)[:, 0]
        ok = (col4row >= 0) & rv_b & cv_b[safe]
        return (jnp.where(ok, col4row, -1),
                jnp.where(ok, mcost, jnp.inf))

    return jax.vmap(post)(cost, row_valid, col_valid, p,
                          transposed[:, 0])
