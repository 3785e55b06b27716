#!/usr/bin/env python
"""Multi-process training launcher (reference ``tools/dist_train.sh`` /
``tools/slurm_train.sh`` equivalent).

On a real TPU pod this launcher is unnecessary: run ``tools/train.py``
once per host and ``jax.distributed.initialize()`` auto-detects the
topology. This script covers the other two launch modes:

* ``--nproc N``: spawn N local processes (multi-host simulation on one
  machine; combine with ``JAX_PLATFORMS=cpu`` and
  ``--local-devices K`` for an N*K-device virtual pod), wiring the
  ``DETMATCH_*`` env protocol for each.
* under SLURM (``SLURM_PROCID`` set): exec one training process with
  the coordinator derived from the node list, mirroring the reference
  slurm launcher's env contract.

Everything after ``--`` is forwarded to ``tools/train.py``.
"""
import os
import subprocess
import sys


def main():
    argv = sys.argv[1:]
    fwd = []
    if "--" in argv:
        i = argv.index("--")
        argv, fwd = argv[:i], argv[i + 1:]

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, default=None,
                    help="spawn N local processes (simulation mode)")
    ap.add_argument("--port", type=int, default=29400)
    ap.add_argument("--local-devices", type=int, default=None,
                    help="virtual CPU devices per process (simulation)")
    args = ap.parse_args(argv)

    here = os.path.dirname(os.path.abspath(__file__))
    train = os.path.join(here, "train.py")

    if os.environ.get("SLURM_PROCID") is not None and args.nproc is None:
        # SLURM: one task per host; coordinator = first node
        nodelist = subprocess.check_output(
            ["scontrol", "show", "hostnames",
             os.environ["SLURM_JOB_NODELIST"]], text=True).split()
        env = dict(os.environ,
                   DETMATCH_COORDINATOR=f"{nodelist[0]}:{args.port}",
                   DETMATCH_NUM_PROCESSES=os.environ["SLURM_NTASKS"],
                   DETMATCH_PROCESS_ID=os.environ["SLURM_PROCID"])
        os.execve(sys.executable, [sys.executable, train] + fwd, env)

    assert args.nproc, "--nproc N required outside SLURM"
    procs = []
    for pid in range(args.nproc):
        env = dict(os.environ,
                   DETMATCH_COORDINATOR=f"localhost:{args.port}",
                   DETMATCH_NUM_PROCESSES=str(args.nproc),
                   DETMATCH_PROCESS_ID=str(pid))
        if args.local_devices:
            env["JAX_PLATFORMS"] = "cpu"
            env["DETMATCH_LOCAL_DEVICES"] = str(args.local_devices)
        procs.append(subprocess.Popen(
            [sys.executable, train] + fwd, env=env))
    rc = 0
    for p in procs:
        rc = rc or p.wait()
    sys.exit(rc)


if __name__ == "__main__":
    main()
