"""Data-parallel sharding correctness on virtual CPU devices.

conftest.py provisions 8 virtual CPU devices via
``--xla_force_host_platform_device_count=8``. These tests assert that
the SAME global batch produces the same losses / updated params whether
it runs on a single device or sharded over a ``Mesh(("data",))`` — i.e.
the XLA-inserted gradient psums, global BatchNorm statistics, and
replicated optimizer updates are correct.

Reference capability being matched: 3-GPU DDP SSL training
(``mmdet3d/apis/ssl_train.py:61-69``, ``tools/dist_train.sh``).
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from detmatch_tpu.train.optim import detmatch_branch_optimizers
from detmatch_tpu.train.ssl_step import (make_ssl_train_fns_split,
                                         voxelize_views)
from detmatch_tpu.utils import tiny


pytestmark = pytest.mark.slow


def _mesh(n):
    devs = jax.devices()
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n]), ("data",))


def _tree_close(a, b, atol, rtol=0.0):
    """Per-leaf |a-b| <= atol + rtol * max|a| (rtol=0 → pure absolute)."""
    def leaf_bad(x, y):
        d = float(jnp.max(jnp.abs(x - y)))
        return d - (atol + rtol * float(jnp.max(jnp.abs(x))))

    diffs = jax.tree.map(leaf_bad, a, b)
    worst = max(jax.tree.leaves(diffs))
    assert worst < 0, f"worst leaf over budget by {worst}"


@pytest.mark.parametrize("n", [2, 8])
def test_pretrain_grads_match_single_device(n):
    """PVRCNN loss+grads: n-device data-parallel == single device.

    Tolerance for the continuous comparison is justified by an fp64
    ground-truth study (``tools/misc/dp_noise_study.py``): the worst
    1-dev↔8-dev fp32 leaf divergence is ~3.5e-3 abs / ~3e-3 relative
    (BatchNorm-chain accumulation-order noise in the deep backbone),
    while the same grads deviate from an fp64 run by up to ~2e0
    RELATIVE (fp32 itself flips discrete RoI-sampling decisions vs
    fp64) — the sharded step is three orders of magnitude inside
    fp32's own precision envelope. Discrete decisions are additionally
    required to match EXACTLY, so sharding can never flip a
    sampling/assignment outcome (guaranteed by the tie-break
    quantization in core.iou.quantize).
    """
    from detmatch_tpu.models.pvrcnn.pvrcnn import PVRCNN

    rng = np.random.RandomState(0)
    view = tiny.tiny_view(rng, b=n, p=128, with_gt=True)
    vb = voxelize_views({"x": {"v": view}}, tiny.TINY_SPEC)["x"]["v"]
    batch = {k: vb[k] for k in ("points", "points_valid", "voxel_features",
                                "voxel_keys", "gt_boxes")}

    model = PVRCNN(**tiny.TINY_PV_CFG)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "sampling": key,
                            "dropout": key}, batch, train=True)

    def loss_and_grads(params, batch, rng_):
        def loss_fn(p):
            out, _ = model.apply(
                dict(variables, params=p), batch, train=True,
                rngs={"sampling": rng_, "dropout": rng_},
                mutable=["batch_stats"])
            losses = model.apply(dict(variables, params=p), out, batch,
                                 method=PVRCNN.loss)
            return losses["loss"]

        return jax.value_and_grad(loss_fn)(params)

    def discrete(params, batch, rng_):
        """All integer/bool forward outputs (sampling + assignment
        decisions) — must be bit-identical under sharding."""
        out, _ = model.apply(
            dict(variables, params=params), batch, train=True,
            rngs={"sampling": rng_, "dropout": rng_},
            mutable=["batch_stats"])
        return {k: v for k, v in out.items()
                if hasattr(v, "dtype") and v.dtype in (jnp.int32,
                                                       jnp.bool_)}

    step_rng = jax.random.PRNGKey(1)
    loss_1, grads_1 = jax.jit(loss_and_grads)(
        variables["params"], batch, step_rng)
    disc_1 = jax.device_get(jax.jit(discrete)(
        variables["params"], batch, step_rng))

    mesh = _mesh(n)
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    sharded = jax.jit(loss_and_grads, in_shardings=(repl, shard, repl),
                      out_shardings=(repl, repl))
    with mesh:
        loss_n, grads_n = sharded(
            jax.device_put(variables["params"], repl),
            jax.device_put(batch, shard), step_rng)
        jax.block_until_ready(loss_n)
        disc_n = jax.device_get(jax.jit(
            discrete, in_shardings=(repl, shard, repl))(
            jax.device_put(variables["params"], repl),
            jax.device_put(batch, shard), step_rng))

    for k in disc_1:
        assert np.array_equal(disc_1[k], disc_n[k]), \
            f"discrete output {k} flipped under sharding"
    np.testing.assert_allclose(float(loss_n), float(loss_1), rtol=1e-4)
    _tree_close(grads_1, grads_n, atol=1e-3, rtol=1e-2)


@pytest.mark.parametrize("n", [2, 8])
def test_ssl_staged_step_matches_single_device(n):
    """One full staged SSL step (teacher → stu3d → stu2d → EMA) over an
    n-device mesh equals the single-device run on the same global batch."""
    rng = np.random.RandomState(0)
    batch = tiny.tiny_ssl_batch(rng, b=n, p=128)
    ssl, spec = tiny.tiny_ssl()

    key = jax.random.PRNGKey(0)
    vbatch = voxelize_views(batch, spec)
    lab3d = vbatch["lab"]["stu"]
    state = ssl.init_states(key, lab3d, lab3d["img"], lab3d["img_shape"])
    tx3, tx2 = detmatch_branch_optimizers(1e-3, 1e-3)
    opt0 = dict(det3d=tx3.init(state["student"]["det3d"]["params"]),
                det2d=tx2.init(state["student"]["det2d"]["params"]))
    teacher_fn, stu3d_fn, stu2d_fn, ema_fn = make_ssl_train_fns_split(
        ssl, tx3, tx2, spec)
    it, r3, r2 = jnp.int32(0), jax.random.PRNGKey(1), jax.random.PRNGKey(2)

    def run(mesh=None):
        if mesh is None:
            tj = jax.jit(teacher_fn)
            s3 = jax.jit(stu3d_fn)
            s2 = jax.jit(stu2d_fn)
            ej = jax.jit(ema_fn)
            st, op, bt = state, opt0, batch
            ctx = None
        else:
            repl = NamedSharding(mesh, P())
            shard = NamedSharding(mesh, P("data"))
            tj = jax.jit(teacher_fn, in_shardings=(repl, shard))
            s3 = jax.jit(stu3d_fn,
                         in_shardings=(repl, repl, None, None, None, None),
                         out_shardings=(repl, repl, repl))
            s2 = jax.jit(stu2d_fn,
                         in_shardings=(repl, repl, None, None, None, None),
                         out_shardings=(repl, repl, repl))
            ej = jax.jit(ema_fn, in_shardings=(repl, repl, None),
                         out_shardings=repl)
            st = jax.device_put(state, repl)
            op = jax.device_put(opt0, repl)
            bt = jax.device_put(batch, shard)
            ctx = mesh
        import contextlib
        with (ctx if ctx is not None else contextlib.nullcontext()):
            pseudo, vb = tj(st["teacher"], bt)
            d3, _, logs3 = s3(st["student"]["det3d"], op["det3d"], vb,
                              pseudo, it, r3)
            d2, _, logs2 = s2(st["student"]["det2d"], op["det2d"], vb,
                              pseudo, it, r2)
            teacher = ej(st["teacher"], dict(det3d=d3, det2d=d2), it)
            jax.block_until_ready(teacher)
        return jax.device_get(dict(loss3=logs3["loss"],
                                   loss2=logs2["loss"],
                                   p3=d3["params"], t=teacher))

    ref = run(mesh=None)
    got = run(mesh=_mesh(n))

    np.testing.assert_allclose(got["loss3"], ref["loss3"], rtol=1e-4)
    np.testing.assert_allclose(got["loss2"], ref["loss2"], rtol=1e-4)
    _tree_close(ref["p3"], got["p3"], atol=1e-4)
    _tree_close(ref["t"], got["t"], atol=1e-4)
