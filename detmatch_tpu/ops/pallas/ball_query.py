"""Natively-batched, spatially-WINDOWED ball query (Pallas/TPU).

Replaces the XLA formulation in ``ops/pointnet.py:ball_query`` on the VSA
hot path (reference CUDA: ``pcdet/ops/pointnet2/pointnet2_stack/src/
ball_query_gpu.cu`` — per-center thread scanning points in index order,
keeping the first ``nsample`` within ``radius``).

Why a kernel: the XLA version materialises a (chunk, N, nsample)
rank-compare tensor whose HBM traffic dominates (measured 400-660 ms per
VSA forward inside the SSL step). Here every intermediate — the
(tile_m, chunk) distance tile, the running per-center neighbor count,
and the (nsample, tile_m) slot accumulator — lives in VMEM/registers.

Why windowed: a neighbor within radius r differs from its center by at
most r in y, so after sorting BOTH the points and the centers by y
(``ball_query_batched`` does this internally and maps indices back),
each 256-center tile only has candidates inside a narrow y-band of the
point table. Two searchsorteds per tile bound that band exactly; the
kernel loops over just its chunks with double-buffered HBM→VMEM DMA.
At VSA shapes (radii 0.4–4.8 m over an 80 m scene) this skips 75–95 %
of the distance/rank work the full scan paid.

Scan-order note: neighbors are kept first-``nsample`` in *y-sorted*
order (both the Pallas kernel and the XLA fallback — they stay exactly
equal). The reference keeps first-K in CUDA thread scan order over
hash-ordered voxels, which is equally arbitrary; any K-subset of the
in-radius neighbors is a valid grouping (the consumer max-pools).

Layout notes:
* Coordinates are passed coordinate-major ((B, 8, M) / (B, 8, N), rows
  x/y/z + sublane pad) so the lane dimension is the long axis.
* Validity is encoded positionally: invalid/padded centers are moved to
  +BIG, invalid/padded points to -BIG, so every invalid pair has
  d^2 >> r^2 and masks never enter the kernel.
* First-``nsample``-in-scan-order semantics drop out of a running
  count carried across point chunks: global rank = carried count +
  in-chunk inclusive cumsum (an upper-triangular MXU matmul — Mosaic
  has no cumsum); slot ``s`` takes the (unique) column with rank s+1.
* The batch is an explicit grid dimension (vmapping a ``pallas_call``
  through Mosaic compiles pathologically slowly — see
  ``onehot_rows.py``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9

_HBM = getattr(pltpu, "HBM", None) or getattr(
    getattr(pltpu, "MemorySpace", None), "HBM", None) or pltpu.ANY


def _round_up(x, m):
    return (x + m - 1) // m * m


def _interpret():
    return jax.default_backend() != "tpu"


def _bqw_kernel(lo_ref, nw_ref, cen_ref, pts_any, idx_ref, cnt_ref,
                acc_scr, cnt_scr, pbuf, sems, *, r2, nsample, chunk):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    m_tiles = pl.num_programs(1)
    lo = lo_ref[bi * m_tiles + i]
    nw = nw_ref[bi * m_tiles + i]
    cx = cen_ref[0, 0, :]
    cy = cen_ref[0, 1, :]
    cz = cen_ref[0, 2, :]
    tm = cx.shape[0]

    acc_scr[:] = jnp.zeros_like(acc_scr)
    cnt_scr[:] = jnp.zeros_like(cnt_scr)

    # Mosaic has no cumsum lowering; an inclusive lane-axis cumsum is a
    # matmul with an upper-triangular ones matrix (exact in f32 for
    # counts < 2^24 — chunk is 512).
    tri = (jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
           ).astype(jnp.float32)

    def start_dma(c, slot):
        start = (lo + c) * chunk
        pltpu.make_async_copy(
            pts_any.at[bi, :, pl.ds(start, chunk)], pbuf.at[slot],
            sems.at[slot]).start()

    def wait_dma(c, slot):
        start = (lo + c) * chunk
        pltpu.make_async_copy(
            pts_any.at[bi, :, pl.ds(start, chunk)], pbuf.at[slot],
            sems.at[slot]).wait()

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
        p = jax.lax.cond(slot == 0, lambda: pbuf[0], lambda: pbuf[1])
        px = p[0, :]
        py = p[1, :]
        pz = p[2, :]
        dx = cx[:, None] - px[None, :]
        dy = cy[:, None] - py[None, :]
        dz = cz[:, None] - pz[None, :]
        d2 = dx * dx + dy * dy + dz * dz
        within = d2 <= r2  # (tm, chunk)
        wf = within.astype(jnp.float32)
        csum = jnp.dot(wf, tri, preferred_element_type=jnp.float32)
        cnt = cnt_scr[0, :]
        rank = cnt[:, None] + csum.astype(jnp.int32)  # global, inclusive
        cols = ((lo + c) * chunk
                + jax.lax.broadcasted_iota(jnp.int32, (tm, chunk), 1))
        sel = within & (rank <= nsample)
        contribs = []
        for s in range(nsample):
            hit = sel & (rank == (s + 1))
            contribs.append(
                jnp.sum(jnp.where(hit, cols, 0), axis=1))  # (tm,)
        acc_scr[:] += jnp.stack(contribs, axis=0)  # (nsample, tm)
        cnt_scr[0, :] = cnt + jnp.sum(wf, axis=1).astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, nw, body, 0)

    new_cnt = cnt_scr[0, :]
    acc = acc_scr[:]
    fin = jnp.minimum(new_cnt, nsample)
    # reference semantics: unused slots hold the first neighbor
    slot = jax.lax.broadcasted_iota(jnp.int32, (nsample, tm), 0)
    filled = slot < jnp.maximum(fin, 1)[None, :]
    idx_ref[0] = jnp.where(filled, acc, acc[0:1, :])
    cnt_ref[0] = jnp.broadcast_to(fin[None, :], (8, tm))


@functools.partial(jax.jit, static_argnames=("radius", "nsample",
                                             "tile_m", "chunk"))
def _ball_query_pallas(centers, centers_valid, points, points_valid,
                       radius, nsample, tile_m=256, chunk=512):
    """Points MUST be y-sorted (ball_query_batched guarantees this);
    returned idx are positions in that sorted table. Centers are sorted
    by y internally (the window trick needs y-local center tiles) and
    the outputs are unsorted back to the caller's center order."""
    b, m, _ = centers.shape
    n = points.shape[1]
    m_pad = _round_up(max(m, tile_m), tile_m)
    n_pad = _round_up(max(n, chunk), chunk)
    m_tiles = m_pad // tile_m
    r = float(radius)

    # sort centers by y (invalid → +BIG, to the end)
    ckey = jnp.where(centers_valid, centers[..., 1], BIG)
    cperm = jnp.argsort(ckey, axis=1, stable=True)  # (b, m)
    cen_s = jnp.take_along_axis(centers, cperm[..., None], axis=1)
    cv_s = jnp.take_along_axis(centers_valid, cperm, axis=1)
    ckey_s = jnp.take_along_axis(ckey, cperm, axis=1)

    cen = jnp.where(cv_s[..., None], cen_s, BIG)
    pts = jnp.where(points_valid[..., None], points, -BIG)
    cen_t = jnp.full((b, 8, m_pad), BIG, jnp.float32)
    cen_t = cen_t.at[:, :3, :m].set(cen.transpose(0, 2, 1))
    pts_t = jnp.full((b, 8, n_pad), -BIG, jnp.float32)
    pts_t = pts_t.at[:, :3, :n].set(pts.transpose(0, 2, 1))

    # per-tile y-window → chunk range [lo, lo+nw) in the sorted table
    pkey = jnp.full((b, n_pad), BIG, jnp.float32).at[:, :n].set(
        jnp.where(points_valid, points[..., 1], BIG))
    ckey_p = jnp.full((b, m_pad), BIG, jnp.float32).at[:, :m].set(ckey_s)
    tiles = ckey_p.reshape(b, m_tiles, tile_m)
    tmin = tiles[:, :, 0]                       # sorted ascending
    tmax = jnp.max(jnp.where(tiles < BIG / 2, tiles, -BIG), axis=2)
    has = tmin < BIG / 2

    lo_pos = jax.vmap(jnp.searchsorted)(pkey, tmin - r).astype(jnp.int32)
    hi_pos = jax.vmap(
        lambda k, q: jnp.searchsorted(k, q, side="right"))(
        pkey, tmax + r).astype(jnp.int32)
    lo = jnp.clip(lo_pos // chunk, 0, n_pad // chunk - 1)
    nw = jnp.clip((hi_pos + chunk - 1) // chunk - lo,
                  0, n_pad // chunk - lo)
    lo = jnp.where(has, lo, 0).reshape(-1)
    nw = jnp.where(has, nw, 0).reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, m_tiles),
        in_specs=[
            pl.BlockSpec((1, 8, tile_m), lambda bi, i, lo, nw: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=_HBM),  # points (windowed DMA)
        ],
        out_specs=[
            pl.BlockSpec((1, nsample, tile_m),
                         lambda bi, i, lo, nw: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile_m), lambda bi, i, lo, nw: (bi, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((nsample, tile_m), jnp.int32),
            pltpu.VMEM((8, tile_m), jnp.int32),
            pltpu.VMEM((2, 8, chunk), jnp.float32),  # double-buffered
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    idx_out, cnt_out = pl.pallas_call(
        functools.partial(_bqw_kernel, r2=r * r, nsample=nsample,
                          chunk=chunk),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, nsample, m_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, 8, m_pad), jnp.int32),
        ],
        interpret=_interpret(),
    )(lo, nw, cen_t, pts_t)
    idx_s = idx_out[:, :, :m].transpose(0, 2, 1)  # sorted-center order
    cnt_s = cnt_out[:, 0, :m]
    # unsort the center axis back to the caller's order
    cinv = jnp.argsort(cperm, axis=1)
    idx = jnp.take_along_axis(idx_s, cinv[..., None], axis=1)
    cnt = jnp.take_along_axis(cnt_s, cinv, axis=1)
    return idx, cnt


def sort_points_by_y(points, points_valid):
    """Sort a point table by y (invalid rows to the end, stable).

    Returns (points_sorted, valid_sorted, perm) with
    ``points_sorted[b, i] == points[b, perm[b, i]]``.
    """
    key = jnp.where(points_valid, points[..., 1], BIG)
    perm = jnp.argsort(key, axis=1, stable=True).astype(jnp.int32)
    pts_s = jnp.take_along_axis(points, perm[..., None], axis=1)
    pv_s = jnp.take_along_axis(points_valid, perm, axis=1)
    return pts_s, pv_s, perm


def ball_query_batched(centers, centers_valid, points, points_valid,
                       radius, nsample, impl=None, point_perm=None):
    """First-``nsample`` neighbors within ``radius``, batched.

    Dispatches to the windowed Pallas kernel on TPU and to the vmapped
    XLA formulation (``pointnet.ball_query``) elsewhere — the
    interpret-mode kernel is correct but slow, and the CPU mesh tests
    don't need it. Both impls scan the points in y-sorted order, so
    they return EXACTLY the same neighbors (see module docstring).

    Args:
        centers: (B, M, 3) f32; centers_valid: (B, M) bool.
        points: (B, N, 3) f32; points_valid: (B, N) bool.
        radius: static float; nsample: static int.
        impl: None (auto), "pallas", or "xla".
        point_perm: pass the ``perm`` from ``sort_points_by_y`` to skip
            the internal sort when ``points``/``points_valid`` are
            ALREADY y-sorted (callers issuing several queries against
            one table); returned idx still index the original table.
    Returns:
        idx (B, M, nsample) int32 — first neighbor broadcast into unused
        slots (CUDA-kernel behavior), 0 if the ball is empty;
        cnt (B, M) int32 — number of real neighbors (0 = empty ball).
    """
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if point_perm is None:
        pts_s, pv_s, perm = sort_points_by_y(points, points_valid)
    else:
        pts_s, pv_s, perm = points, points_valid, point_perm
    if impl == "pallas":
        idx_s, cnt = _ball_query_pallas(centers, centers_valid, pts_s,
                                        pv_s, radius, nsample)
    else:
        from .. import pointnet
        idx_s, cnt = jax.vmap(
            pointnet.ball_query, (0, 0, 0, 0, None, None))(
            centers, centers_valid, pts_s, pv_s, radius, nsample)
    # map sorted-table positions back to original point indices
    idx = jnp.take_along_axis(
        perm, idx_s.reshape(idx_s.shape[0], -1), axis=1
    ).reshape(idx_s.shape)
    return idx, cnt
