"""Multi-host SPMD correctness ON THE PRODUCT STEP.

``test_distributed.py`` proves the 2-process mesh machinery on a toy
matmul; this file promotes that proof to the real model: two OS
processes (2 virtual CPU devices each) run ONE full staged SSL training
step (teacher pseudo-labels → student-3d fwd+bwd+opt → student-2d
fwd+bwd+opt → EMA) over a 4-device global mesh via
``put_global_batch`` / ``put_replicated``, and the resulting losses and
updated parameters must equal a single-device run on the same global
batch — the DDP guarantee the reference relies on for multi-node SSL
training (``mmdet3d/apis/ssl_train.py:61-69``, ``tools/dist_train.sh``).
"""
import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow

# Each worker builds the same global batch (seed 0) and feeds its local
# rows; state/optimizer replicate (same seed on both processes).
WORKER = textwrap.dedent("""
    import json, sys
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    import os
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, %(repo)r)
    from detmatch_tpu.utils.env import host_cache_dir
    _cache = host_cache_dir()
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from detmatch_tpu.parallel import (init_distributed, is_primary,
                                       put_global_batch, put_replicated)
    assert init_distributed(f"localhost:{port}", nproc, pid,
                            local_device_count=2)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from detmatch_tpu.utils import tiny
    from detmatch_tpu.train.ssl_step import (make_ssl_train_fns_split,
                                             voxelize_views)
    from detmatch_tpu.train.optim import detmatch_branch_optimizers

    n_global = 2 * nproc
    assert len(jax.devices()) == n_global
    mesh = Mesh(np.array(jax.devices()), ("data",))
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    rng = np.random.RandomState(0)
    gbatch = tiny.tiny_ssl_batch(rng, b=n_global, p=128)
    lo, hi = pid * 2, pid * 2 + 2
    local = jax.tree.map(lambda x: np.asarray(x)[lo:hi], gbatch)

    ssl, spec = tiny.tiny_ssl()
    key = jax.random.PRNGKey(0)
    lab3d = voxelize_views(jax.tree.map(np.asarray, gbatch),
                           spec)["lab"]["stu"]
    state = jax.device_get(
        ssl.init_states(key, jax.tree.map(jnp.asarray, lab3d),
                        jnp.asarray(lab3d["img"]),
                        jnp.asarray(lab3d["img_shape"])))
    tx3, tx2 = detmatch_branch_optimizers(1e-3, 1e-3)
    opt0 = jax.device_get(
        dict(det3d=tx3.init(state["student"]["det3d"]["params"]),
             det2d=tx2.init(state["student"]["det2d"]["params"])))

    teacher_fn, stu3d_fn, stu2d_fn, ema_fn = make_ssl_train_fns_split(
        ssl, tx3, tx2, spec)
    it, r3, r2 = jnp.int32(0), jax.random.PRNGKey(1), jax.random.PRNGKey(2)

    st = put_replicated(state, repl)
    op = put_replicated(opt0, repl)
    bt = put_global_batch(local, shard)

    tj = jax.jit(teacher_fn, in_shardings=(repl, shard))
    s3 = jax.jit(stu3d_fn,
                 in_shardings=(repl, repl, None, None, None, None),
                 out_shardings=(repl, repl, repl))
    s2 = jax.jit(stu2d_fn,
                 in_shardings=(repl, repl, None, None, None, None),
                 out_shardings=(repl, repl, repl))
    ej = jax.jit(ema_fn, in_shardings=(repl, repl, None),
                 out_shardings=repl)
    with mesh:
        pseudo, vb = tj(st["teacher"], bt)
        d3, _, logs3 = s3(st["student"]["det3d"], op["det3d"], vb,
                          pseudo, it, r3)
        d2, _, logs2 = s2(st["student"]["det2d"], op["det2d"], vb,
                          pseudo, it, r2)
        teacher = ej(st["teacher"], dict(det3d=d3, det2d=d2), it)
        jax.block_until_ready(teacher)

    # reduce inside jit: eager ops on non-fully-addressable global
    # arrays are invalid in multi-process jax; a replicated jit OUTPUT
    # scalar is readable on every process
    import jax.tree_util as jtu
    _sum = jax.jit(lambda t: jtu.tree_reduce(
        lambda a, l: a + jnp.sum(jnp.abs(l.astype(jnp.float32))), t, 0.0),
        out_shardings=repl)
    with mesh:
        p3_sum = float(_sum(d3["params"]))
        tea_sum = float(_sum(teacher))
    out = dict(loss3=float(logs3["loss"]), loss2=float(logs2["loss"]),
               p3_sum=p3_sum, tea_sum=tea_sum,
               primary=is_primary())
    print("RESULT" + json.dumps(out), flush=True)
""")


def _single_device_reference():
    """Same step, one device, in this (8-virtual-device) process."""
    import jax
    import jax.numpy as jnp
    from detmatch_tpu.utils import tiny
    from detmatch_tpu.train.ssl_step import (make_ssl_train_fns_split,
                                             voxelize_views)
    from detmatch_tpu.train.optim import detmatch_branch_optimizers

    rng = np.random.RandomState(0)
    batch = tiny.tiny_ssl_batch(rng, b=4, p=128)
    ssl, spec = tiny.tiny_ssl()
    key = jax.random.PRNGKey(0)
    lab3d = voxelize_views(batch, spec)["lab"]["stu"]
    state = ssl.init_states(key, lab3d, lab3d["img"], lab3d["img_shape"])
    tx3, tx2 = detmatch_branch_optimizers(1e-3, 1e-3)
    opt0 = dict(det3d=tx3.init(state["student"]["det3d"]["params"]),
                det2d=tx2.init(state["student"]["det2d"]["params"]))
    teacher_fn, stu3d_fn, stu2d_fn, ema_fn = make_ssl_train_fns_split(
        ssl, tx3, tx2, spec)
    it, r3, r2 = jnp.int32(0), jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    pseudo, vb = jax.jit(teacher_fn)(state["teacher"], batch)
    d3, _, logs3 = jax.jit(stu3d_fn)(state["student"]["det3d"],
                                     opt0["det3d"], vb, pseudo, it, r3)
    d2, _, logs2 = jax.jit(stu2d_fn)(state["student"]["det2d"],
                                     opt0["det2d"], vb, pseudo, it, r2)
    teacher = jax.jit(ema_fn)(state["teacher"],
                              dict(det3d=d3, det2d=d2), it)

    def _sum(t):
        return sum(float(jnp.sum(jnp.abs(l.astype(jnp.float32))))
                   for l in jax.tree.leaves(t))

    return dict(loss3=float(logs3["loss"]), loss2=float(logs2["loss"]),
                p3_sum=_sum(d3["params"]), tea_sum=_sum(teacher))


def test_two_process_ssl_step_matches_single_device(tmp_path):
    nproc, port = 2, "29531"
    script = tmp_path / "worker.py"
    script.write_text(WORKER % dict(repo=REPO))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(nproc), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for pid in range(nproc)]
    outs = [p.communicate(timeout=3000)[0] for p in procs]
    results = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert line, f"proc {pid} printed no RESULT:\n{out[-4000:]}"
        results.append(json.loads(line[-1][len("RESULT"):]))

    assert results[0]["primary"] and not results[1]["primary"]
    ref = _single_device_reference()
    for r in results:
        np.testing.assert_allclose(r["loss3"], ref["loss3"], rtol=1e-4)
        np.testing.assert_allclose(r["loss2"], ref["loss2"], rtol=1e-4)
        np.testing.assert_allclose(r["p3_sum"], ref["p3_sum"], rtol=1e-4)
        np.testing.assert_allclose(r["tea_sum"], ref["tea_sum"],
                                   rtol=1e-4)
