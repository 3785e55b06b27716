"""Windowed key-compare sparse conv vs the rulebook gather reference."""
import numpy as np
import jax
import jax.numpy as jnp

from detmatch_tpu.ops import spconv, voxelize
from detmatch_tpu.ops.pallas.window_key_conv import (
    window_key_conv, window_key_conv_batched)

SHAPE = (8, 40, 36)


def _sparse_sample(rng, n_valid, n_cap, c):
    z = rng.randint(0, SHAPE[0], n_valid * 2)
    y = rng.randint(0, SHAPE[1], n_valid * 2)
    x = rng.randint(0, SHAPE[2], n_valid * 2)
    keys = np.unique(np.asarray(jax.device_get(voxelize.linearize(
        jnp.asarray(np.stack([z, y, x], -1)), SHAPE))))[:n_valid]
    keys = np.sort(keys).astype(np.int32)
    pad = n_cap - len(keys)
    keys_p = np.concatenate(
        [keys, np.full(pad, voxelize.INVALID_KEY, np.int32)])
    feats = rng.randn(n_cap, c).astype(np.float32)
    feats[len(keys):] = 0.0
    return jnp.asarray(feats), jnp.asarray(keys_p)


def test_window_conv_matches_gather_subm():
    rng = np.random.RandomState(0)
    feats, keys = _sparse_sample(rng, 300, 320, 8)
    w = jnp.asarray(rng.randn(27, 8, 16).astype(np.float32) * 0.1)
    nkeys = spconv.subm_neighbor_keys(keys[None], SHAPE, (3, 3, 3))[0]

    rb = spconv.lookup_batched(keys[None], nkeys.reshape(1, -1),
                               band=int(np.prod(SHAPE)) + 2
                               ).reshape(nkeys.shape)
    want = jax.device_get(spconv.gather_conv(feats, rb, w))
    got = jax.device_get(window_key_conv(feats, keys, nkeys, keys, w))
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-2)


def test_window_conv_strided_and_batched():
    rng = np.random.RandomState(1)
    b, cap, c = 2, 256, 8
    feats = []
    keys = []
    for i in range(b):
        f, k = _sparse_sample(rng, 200, cap, c)
        feats.append(f)
        keys.append(k)
    feats = jnp.stack(feats)
    keys = jnp.stack(keys)
    w = jnp.asarray(rng.randn(27, c, 12).astype(np.float32) * 0.1)

    shape_out = spconv.output_spatial_shape(SHAPE, (3, 3, 3), (2, 2, 2),
                                            (1, 1, 1))
    out_keys, counts = spconv.downsample_keys_batched(
        keys, SHAPE, shape_out, (3, 3, 3), (2, 2, 2), (1, 1, 1), 200)
    nkeys = spconv.sparse_neighbor_keys(out_keys, SHAPE, shape_out,
                                        (3, 3, 3), (2, 2, 2), (1, 1, 1))
    rb = spconv.lookup_batched(
        keys, nkeys.reshape(b, -1),
        band=int(np.prod(SHAPE)) + 2).reshape(nkeys.shape)
    want = jax.device_get(spconv.gather_conv_batched(feats, rb, w))
    got = jax.device_get(window_key_conv_batched(
        feats, keys, nkeys, out_keys, w, band=int(np.prod(SHAPE)) + 1))
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-2)


def test_window_conv_grads_match():
    rng = np.random.RandomState(2)
    feats, keys = _sparse_sample(rng, 120, 128, 4)
    w = jnp.asarray(rng.randn(27, 4, 8).astype(np.float32) * 0.1)
    nkeys = spconv.subm_neighbor_keys(keys[None], SHAPE, (3, 3, 3))[0]
    rb = spconv.lookup_batched(keys[None], nkeys.reshape(1, -1),
                               band=int(np.prod(SHAPE)) + 2
                               ).reshape(nkeys.shape)
    tgt = jnp.asarray(rng.randn(128, 8).astype(np.float32))

    def loss_ref(f, w):
        return jnp.sum((spconv.gather_conv(f, rb, w) - tgt) ** 2)

    def loss_win(f, w):
        return jnp.sum((window_key_conv(f, keys, nkeys, keys, w)
                        - tgt) ** 2)

    gr_f, gr_w = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    gw_f, gw_w = jax.grad(loss_win, argnums=(0, 1))(feats, w)
    # kernel matmuls run in bf16 (f32 accumulate): grads agree to bf16
    # rounding of the cotangents, not f32 exactness
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gr_f),
                               atol=2e-1, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(gw_w), np.asarray(gr_w),
                               atol=2e-1, rtol=5e-2)
