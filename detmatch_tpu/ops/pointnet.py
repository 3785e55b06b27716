"""PointNet++-style set ops: farthest point sampling, ball query, grouping.

Replaces the reference's ``pointnet2_stack`` CUDA kernels
(``pcdet/ops/pointnet2/pointnet2_stack/src/{sampling,ball_query,
group_points}_gpu.cu``) with static-shape XLA formulations. The reference's
"stack" layout (ragged batches via ``batch_cnt`` arrays) is unnecessary
here: samples are fixed-capacity with validity masks and batched by vmap.

Semantics mirrored:
* FPS: greedy max-min sampling starting from point 0; invalid points are
  never selected. If fewer valid points than samples, selection repeats
  (downstream consumers mask by count, matching the CUDA behavior of
  repeated indices when npoints > N).
* ball_query: up to ``nsample`` neighbors within ``radius``, **first-found
  in index order** (reference ``ball_query_gpu.cu`` takes the first
  nsample), empty balls flagged.
* grouping: neighbors gathered, xyz made keypoint-relative; invalid slots
  zeroed (reference QueryAndGroup + empty_ball_mask semantics).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG_DIST = 1e10


@jax.custom_vjp
def _fenced_take_rows(x2d, flat_idx):
    """Flat row gather with barriers on both sides.

    XLA-TPU lowers an ISOLATED row gather as a fast bulk copy (~1 ms for
    324k rows) but degrades ~36x when the gather fuses with its index
    producer or consumer — the optimization_barriers pin the fast path
    (measured; see tools/misc/bench_lookup2.py). The custom VJP fences
    the transposed scatter-add the same way (XLA's default gather
    transpose was ~16x the forward cost inside the SSL step)."""
    src = jax.lax.optimization_barrier(x2d)
    i = jax.lax.optimization_barrier(flat_idx)
    return jax.lax.optimization_barrier(src[i])


def _fenced_take_fwd(x2d, flat_idx):
    return _fenced_take_rows(x2d, flat_idx), (flat_idx, x2d.shape)


def _fenced_take_bwd(res, g):
    flat_idx, shape = res
    i = jax.lax.optimization_barrier(flat_idx)
    gg = jax.lax.optimization_barrier(g)
    # accumulate in f32: each table row collects up to thousands of
    # contributions (RoI-grid pool), which bf16 += would round away
    dx = jnp.zeros(shape, jnp.float32).at[i].add(
        gg.astype(jnp.float32)).astype(g.dtype)
    return jax.lax.optimization_barrier(dx), None


_fenced_take_rows.defvjp(_fenced_take_fwd, _fenced_take_bwd)


def gather_rows(x, idx):
    """Batched row gather via a barrier-fenced flat gather (fenced
    scatter-add backward).

    Measured head-to-head on TPU v5e at the RoI-grid-pool shape
    (B=8 table 2048x128, 3.5M gathered rows, sum-consumed output):
    this fenced XLA gather runs in 12.6 ms fwd, while the one-hot-GEMM
    formulation (``ops/pallas/onehot_rows``) takes 105.7 ms and loses
    ~0.3% precision to the bf16 MXU cast — so the one-hot kernels are
    NOT routed here; they exist for genuinely tiny tables only.

    Args:
        x: (B, N, C); idx: (B, ...) int32 row indices into N.
    Returns:
        (B, ..., C).
    """
    b, n, c = x.shape
    base = jnp.arange(b, dtype=jnp.int32).reshape(
        (b,) + (1,) * (idx.ndim - 1)) * n
    flat = (idx + base).reshape(-1)
    out = _fenced_take_rows(x.reshape(b * n, c), flat)
    return out.reshape(idx.shape + (c,))


@partial(jax.jit, static_argnames=("num_samples",))
def farthest_point_sample(xyz, valid, num_samples):
    """Greedy farthest point sampling.

    Args:
        xyz: (N, 3); valid: (N,) bool; num_samples: static int.
    Returns:
        idx: (num_samples,) int32.
    """
    n = xyz.shape[0]
    d2 = jnp.where(valid, BIG_DIST, -1.0)  # invalid never selected

    first = jnp.argmax(valid.astype(jnp.int32)).astype(jnp.int32)

    def body(i, state):
        d2_, idx_, last = state
        delta = xyz - xyz[last]
        nd = jnp.sum(delta * delta, axis=-1)
        d2_ = jnp.minimum(d2_, jnp.where(valid, nd, -1.0))
        nxt = jnp.argmax(d2_).astype(jnp.int32)
        idx_ = idx_.at[i].set(nxt)
        return d2_, idx_, nxt

    idx0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(first)
    d2, idx, _ = jax.lax.fori_loop(
        1, num_samples, body,
        (jnp.where(valid, BIG_DIST, -1.0), idx0, first))
    return idx


@partial(jax.jit, static_argnames=("nsample", "chunk"))
def ball_query(centers, centers_valid, points, points_valid, radius,
               nsample, chunk=512):
    """First-``nsample`` neighbors within ``radius`` of each center.

    First-k selection runs as a cumsum rank over the within-radius mask
    plus an unrolled per-slot masked sum (rank s+1 is unique per row, so
    the sum extracts its index exactly). This is pure fused VPU work —
    roughly 30x faster than ``lax.top_k`` over the N axis on TPU, with
    identical first-in-index-order semantics.

    Args:
        centers: (M, 3); points: (N, 3); *_valid: bool masks.
    Returns:
        (idx (M, nsample) int32 — first valid neighbor broadcast into
         unused slots (CUDA kernel behavior), garbage if empty;
         cnt (M,) int32 — number of real neighbors (0 = empty ball)).
    """
    M = centers.shape[0]
    N = points.shape[0]
    r2 = radius * radius
    pad = (-M) % chunk
    c = jnp.concatenate(
        [centers, jnp.zeros((pad, 3), centers.dtype)], axis=0
    ).reshape(-1, chunk, 3)
    cv = jnp.concatenate(
        [centers_valid, jnp.zeros((pad,), bool)]
    ).reshape(-1, chunk)

    arange_n = jnp.arange(N, dtype=jnp.int32)[None, :]
    slot_ar = jnp.arange(nsample, dtype=jnp.int32)[None, :]

    def one_chunk(args):
        cc, ccv = args
        d2 = jnp.sum(
            (cc[:, None, :] - points[None, :, :]) ** 2, axis=-1
        )  # (chunk, N)
        within = (d2 <= r2) & points_valid[None, :] & ccv[:, None]
        rank = jnp.cumsum(within.astype(jnp.int32), axis=1)  # inclusive
        cnt = jnp.minimum(rank[:, -1], nsample)
        wr = jnp.where(within & (rank <= nsample), rank, 0)
        # slot s holds the index whose (unique) rank is s+1; one fused
        # 3D compare+reduce (an unrolled per-slot loop bloats the program)
        eq = wr[:, :, None] == jnp.arange(1, nsample + 1,
                                          dtype=jnp.int32)[None, None, :]
        idx = jnp.sum(jnp.where(eq, arange_n[:, :, None], 0), axis=1)
        # broadcast first neighbor into empty slots (reference semantics)
        idx = jnp.where(slot_ar < jnp.maximum(cnt, 1)[:, None],
                        idx, idx[:, :1])
        return idx.astype(jnp.int32), cnt

    idx, cnt = jax.lax.map(one_chunk, (c, cv))
    idx = idx.reshape(-1, nsample)[:M]
    cnt = cnt.reshape(-1)[:M]
    return idx, cnt


@partial(jax.jit, static_argnames=())
def three_nn(queries, queries_valid, points, points_valid):
    """3 nearest neighbors (reference ``pointnet2_stack`` three_nn,
    ``interpolate_gpu.cu``): per query, the 3 closest valid points.

    Returns (dists (Q, 3), idx (Q, 3) int32).
    """
    d2 = jnp.sum((queries[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(points_valid[None, :], d2, BIG_DIST)
    neg_top, idx = jax.lax.top_k(-d2, 3)
    dists = jnp.sqrt(jnp.maximum(-neg_top, 0.0))
    dists = jnp.where(queries_valid[:, None], dists, BIG_DIST)
    return dists, idx.astype(jnp.int32)


def three_interpolate(feats, idx, dists, eps=1e-8):
    """Inverse-distance-weighted interpolation over 3 neighbors
    (reference three_interpolate). feats (N, C), idx (Q, 3),
    dists (Q, 3) → (Q, C)."""
    w = 1.0 / jnp.maximum(dists * dists, eps)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    gathered = feats[idx]  # (Q, 3, C)
    return jnp.sum(gathered * w[..., None], axis=1)


def group_and_pool(centers, centers_valid, points, points_valid,
                   point_feats, radius, nsample, mlp_fn):
    """QueryAndGroup + shared MLP + masked max-pool (one SA branch).

    Mirrors reference ``StackSAModuleMSG`` (``pointnet2_modules.py:10-94``):
    grouped features = concat(rel_xyz, point_feats); MLP applied pointwise;
    max over valid neighbors; empty balls → zeros.

    Args:
        centers: (M, 3); points: (N, 3); point_feats: (N, C) or None.
        mlp_fn: callable (M, nsample, 3+C) → (M, nsample, C') —
            the pointwise MLP (a flax module partial).
    Returns:
        (M, C') pooled features.
    """
    idx, cnt = ball_query(centers, centers_valid, points, points_valid,
                          radius, nsample)
    grouped_xyz = points[idx] - centers[:, None, :]  # (M, nsample, 3)
    feats = [grouped_xyz]
    if point_feats is not None:
        feats.append(point_feats[idx])
    grouped = jnp.concatenate(feats, axis=-1)
    slot_valid = (jnp.arange(nsample)[None, :] < cnt[:, None])
    grouped = jnp.where(slot_valid[..., None], grouped, 0.0)
    out = mlp_fn(grouped)  # (M, nsample, C')
    out = jnp.where(slot_valid[..., None], out, -BIG_DIST)
    pooled = jnp.max(out, axis=1)
    return jnp.where((cnt > 0)[:, None], pooled, 0.0)
