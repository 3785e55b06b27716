"""Multi-host (multi-PROCESS) SPMD correctness.

The other sharding tests (``test_multichip.py``) validate data-parallel
math over many devices in ONE process. This one validates the
multi-host layer (``detmatch_tpu/parallel/``): two OS processes, each
owning 2 virtual CPU devices, join one ``jax.distributed`` coordination
service (gloo collectives) and train on a 4-device global mesh via
``put_global_batch`` / ``put_replicated``. The resulting loss and
updated params must equal a single-process 4-device run on the same
global batch.

Reference capability: multi-node DDP launchers
(``tools/dist_train.sh``, ``mmdet3d/apis/ssl_train.py:61-69``).
"""
import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import json, os, sys
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, %r)
    from detmatch_tpu.parallel import (init_distributed, is_primary,
                                       put_global_batch, put_replicated)
    assert init_distributed(f"localhost:{port}", nproc, pid,
                            local_device_count=2)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == nproc
    assert len(jax.devices()) == 2 * nproc, jax.devices()
    mesh = Mesh(np.array(jax.devices()), ("data",))
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    # toy model, same global batch/params as the single-process check
    rng = np.random.RandomState(0)
    W0 = rng.randn(8, 8).astype(np.float32)
    gx = rng.randn(8, 8).astype(np.float32)   # global batch (8 rows)
    gy = rng.randn(8, 1).astype(np.float32)
    lo, hi = pid * 4, (pid + 1) * 4           # this process's local shard

    params = put_replicated({"w": jnp.asarray(W0)}, repl)
    batch = put_global_batch({"x": gx[lo:hi], "y": gy[lo:hi]}, shard)

    def loss_fn(p, b):
        pred = jnp.tanh(b["x"] @ p["w"]).sum(axis=1, keepdims=True)
        return jnp.mean((pred - b["y"]) ** 2)

    step = jax.jit(lambda p, b: jax.value_and_grad(loss_fn)(p, b),
                   out_shardings=(repl, repl))
    with mesh:
        loss, grads = step(params, batch)
        new_w = params["w"] - 0.1 * grads["w"]
        jax.block_until_ready(new_w)
    out = dict(loss=float(loss),
               w_sum=float(jnp.sum(new_w)),
               w00=float(new_w[0, 0]),
               primary=is_primary())
    print("RESULT" + json.dumps(out), flush=True)
""") % (REPO,)


def _single_process_reference():
    """The same step on this process (jax already on 8 CPU devices)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    W0 = rng.randn(8, 8).astype(np.float32)
    gx = rng.randn(8, 8).astype(np.float32)
    gy = rng.randn(8, 1).astype(np.float32)

    def loss_fn(p, b):
        pred = jnp.tanh(b["x"] @ p["w"]).sum(axis=1, keepdims=True)
        return jnp.mean((pred - b["y"]) ** 2)

    loss, grads = jax.jit(
        lambda p, b: jax.value_and_grad(loss_fn)(p, b))(
        {"w": jnp.asarray(W0)}, {"x": gx, "y": gy})
    new_w = W0 - 0.1 * np.asarray(grads["w"])
    return float(loss), float(new_w.sum()), float(new_w[0, 0])


def test_two_process_training_matches_single_process(tmp_path):
    nproc, port = 2, "29517"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(nproc), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for pid in range(nproc)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    results = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert line, f"proc {pid} printed no RESULT:\n{out[-3000:]}"
        results.append(json.loads(line[-1][len("RESULT"):]))

    assert results[0]["primary"] and not results[1]["primary"]
    ref_loss, ref_sum, ref_w00 = _single_process_reference()
    for r in results:
        np.testing.assert_allclose(r["loss"], ref_loss, rtol=1e-5)
        np.testing.assert_allclose(r["w_sum"], ref_sum, rtol=1e-5)
        np.testing.assert_allclose(r["w00"], ref_w00, rtol=1e-5)


def test_single_process_helpers_are_device_put():
    """put_global_batch / put_replicated degrade to device_put when
    there is one process (the train loop calls them unconditionally)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from detmatch_tpu.parallel import put_global_batch, put_replicated

    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    x = {"a": np.arange(8, dtype=np.float32).reshape(4, 2)}
    g = put_global_batch(x, NamedSharding(mesh, P("data")))
    r = put_replicated(x, NamedSharding(mesh, P()))
    np.testing.assert_array_equal(np.asarray(g["a"]), x["a"])
    np.testing.assert_array_equal(np.asarray(r["a"]), x["a"])
    assert g["a"].sharding.spec == P("data")


def test_init_distributed_noop_without_config(monkeypatch):
    from detmatch_tpu.parallel import init_distributed
    for k in ("DETMATCH_COORDINATOR", "DETMATCH_NUM_PROCESSES",
              "DETMATCH_PROCESS_ID"):
        monkeypatch.delenv(k, raising=False)
    assert init_distributed() is False
    assert init_distributed(num_processes=1) is False
