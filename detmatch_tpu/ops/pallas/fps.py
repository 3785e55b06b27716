"""Farthest point sampling (Pallas/TPU), natively batched.

Replaces the XLA formulation in ``ops/pointnet.py:farthest_point_sample``
on the VSA hot path (reference CUDA:
``pcdet/ops/pointnet2/pointnet2_stack/src/sampling_gpu.cu`` — one block
per sample running the greedy max-min loop in shared memory).

FPS is strictly sequential (each selection depends on the running
min-distance vector), so the only lever is per-iteration cost. The XLA
fori_loop round-trips the (B, N) distance state through HBM every
iteration and pays loop/kernel overhead 2048 times; here the whole loop
runs inside one kernel with the (3, N) coordinates and the (N,) running
distances resident in VMEM — per iteration it is pure VPU work (one
masked 3xN reduction to read the last point, one fused
distance-min-argmax sweep), with a single lane-dynamic int32 store.

Layout: coordinates are passed coordinate-major (B, 3, N) so the lane
dimension is the long axis; the WHOLE batch runs in one kernel body so
the B greedy chains advance in lockstep (a (B, N) VPU op costs barely
more than a (1, N) one). Validity arrives as an f32 mask.

Semantics match the XLA version exactly (first-occurrence argmax,
invalid points never selected, all-invalid rows degrade to index 0).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e10


def _round_up(x, m):
    return (x + m - 1) // m * m


def _interpret():
    return jax.default_backend() != "tpu"


def _fps_kernel(xyz_ref, vmask_ref, idx_ref, *, num_samples, n_pad):
    """Whole batch in ONE kernel body: the B greedy chains advance in
    lockstep, so the sequential-dependency latency is paid once for the
    batch instead of once per sample (a (B, N) VPU op costs barely more
    than a (1, N) one at these shapes — measured 24.2 → 12.0 ms at
    B=8, N=18432, K=2048)."""
    xs = xyz_ref[:, 0, :]  # (B, n_pad)
    ys = xyz_ref[:, 1, :]
    zs = xyz_ref[:, 2, :]
    vm = vmask_ref[:, 0, :] > 0.0
    b = xs.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, n_pad), 1)
    k_pad = idx_ref.shape[2]
    kiota = jax.lax.broadcasted_iota(jnp.int32, (b, k_pad), 1)

    def first_min_rows(mask):
        """Per-row smallest index where mask, n_pad if none → (B, 1)."""
        m = jnp.min(jnp.where(mask, iota, n_pad), axis=1, keepdims=True)
        return jnp.where(m >= n_pad, 0, m).astype(jnp.int32)

    first = first_min_rows(vm)  # (B, 1)

    d2_0 = jnp.where(vm, BIG, -1.0)
    # the result vector is CARRIED (lane-dynamic stores don't lower);
    # one masked select per iteration, one static store at the end
    res0 = jnp.where(kiota == 0, first, 0)

    def body(i, carry):
        d2, last, res = carry
        sel = iota == last  # (B, n_pad), one hit per row
        lx = jnp.sum(jnp.where(sel, xs, 0.0), axis=1, keepdims=True)
        ly = jnp.sum(jnp.where(sel, ys, 0.0), axis=1, keepdims=True)
        lz = jnp.sum(jnp.where(sel, zs, 0.0), axis=1, keepdims=True)
        dx = xs - lx
        dy = ys - ly
        dz = zs - lz
        nd = dx * dx + dy * dy + dz * dz
        d2 = jnp.minimum(d2, jnp.where(vm, nd, -1.0))
        m = jnp.max(d2, axis=1, keepdims=True)
        nxt = first_min_rows(d2 == m)
        res = jnp.where(kiota == i, nxt, res)
        return d2, nxt, res

    _, _, res = jax.lax.fori_loop(1, num_samples, body,
                                  (d2_0, first, res0))
    idx_ref[:, 0, :] = res


@functools.partial(jax.jit, static_argnames=("num_samples",))
def _fps_pallas(xyz, valid, num_samples):
    b, n, _ = xyz.shape
    n_pad = _round_up(max(n, 512), 512)
    xyz_t = jnp.zeros((b, 3, n_pad), jnp.float32).at[:, :, :n].set(
        xyz.transpose(0, 2, 1))
    vmask = jnp.zeros((b, 1, n_pad), jnp.float32).at[:, 0, :n].set(
        valid.astype(jnp.float32))
    k_pad = _round_up(num_samples, 128)
    idx = pl.pallas_call(
        functools.partial(_fps_kernel, num_samples=num_samples,
                          n_pad=n_pad),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k_pad), jnp.int32),
        interpret=_interpret(),
    )(xyz_t, vmask)
    return idx[:, 0, :num_samples]


def fps_batched(xyz, valid, num_samples, impl=None):
    """Greedy farthest point sampling, batched.

    Dispatches to the Pallas kernel on TPU and the vmapped XLA loop
    elsewhere (the interpret-mode kernel is correct but slow).

    Args:
        xyz: (B, N, 3) f32; valid: (B, N) bool; num_samples static int.
        impl: None (auto), "pallas", or "xla".
    Returns:
        idx (B, num_samples) int32.
    """
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return _fps_pallas(xyz, valid, num_samples)
    from .. import pointnet
    return jax.vmap(pointnet.farthest_point_sample, (0, 0, None))(
        xyz, valid, num_samples)
