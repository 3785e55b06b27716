import numpy as np
import jax
import jax.numpy as jnp

from detmatch_tpu.train import checkpoints


def test_save_restore_roundtrip(tmp_path):
    payload = dict(
        state=dict(
            student=dict(det3d=dict(params=dict(
                w=jnp.asarray(np.random.randn(4, 3).astype(np.float32))))),
            teacher=dict(det3d=dict(params=dict(
                w=jnp.zeros((4, 3), jnp.float32)))),
        ),
        opt_state=dict(count=jnp.asarray(7, jnp.int32)),
    )
    path = str(tmp_path / "ckpt")
    checkpoints.save(path, payload, step=5000)
    assert checkpoints.latest_step(path) == 5000
    template = jax.tree.map(jnp.zeros_like, payload)
    restored = checkpoints.restore(path, 5000, template)
    for a, b in zip(jax.tree_util.tree_leaves(payload),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_load_pretrained_into_both_branches():
    """Reference semantics (ssl.py:102-127): a pretrain checkpoint loads
    into BOTH teacher and student."""
    state = dict(
        student=dict(det3d=dict(params=dict(w=jnp.zeros(3))),
                     det2d=dict(params=dict(w=jnp.zeros(2)))),
        teacher=dict(det3d=dict(params=dict(w=jnp.zeros(3))),
                     det2d=dict(params=dict(w=jnp.zeros(2)))),
    )
    pre = dict(params=dict(w=jnp.asarray([1.0, 2.0, 3.0])))
    out = checkpoints.load_pretrained_into_ssl(state, pre, "det3d")
    np.testing.assert_allclose(
        np.asarray(out["student"]["det3d"]["params"]["w"]), [1, 2, 3])
    np.testing.assert_allclose(
        np.asarray(out["teacher"]["det3d"]["params"]["w"]), [1, 2, 3])
    np.testing.assert_allclose(
        np.asarray(out["student"]["det2d"]["params"]["w"]), 0.0)
