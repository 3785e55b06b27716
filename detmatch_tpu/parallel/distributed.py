"""jax.distributed wiring: one coordination service, N host processes.

Replaces the reference's per-process torch.distributed NCCL groups +
DistributedDataParallel gradient hooks (``tools/dist_train.sh``,
``mmdet3d/apis/ssl_train.py:61-69``): under SPMD there is nothing to
hook — a jitted step whose inputs carry a ``NamedSharding`` over the
global mesh IS the distributed program, and XLA emits the gradient
all-reduces itself. This module only handles process bring-up and the
host-side data feed.

Environment contract (mirrors the launchers' env protocol):

* ``DETMATCH_COORDINATOR``   host:port of process 0 (e.g. "10.0.0.1:1234")
* ``DETMATCH_NUM_PROCESSES`` total host processes
* ``DETMATCH_PROCESS_ID``    this process's rank

On a real TPU pod none of these are needed — ``jax.distributed
.initialize()`` auto-detects the topology from the TPU metadata — so
``init_distributed()`` with no args is always safe to call. On CPU
(multi-host simulation, tests) the gloo collectives backend is enabled
automatically.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_count: Optional[int] = None) -> bool:
    """Join (or create) the jax.distributed coordination service.

    Args fall back to the ``DETMATCH_*`` env vars above; if neither is
    present this is a single-process run and the call is a no-op.
    Returns True iff a multi-process runtime was initialized.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "DETMATCH_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("DETMATCH_NUM_PROCESSES", 0)) \
            or None
    if process_id is None:
        pid = os.environ.get("DETMATCH_PROCESS_ID")
        process_id = int(pid) if pid is not None else None

    if coordinator_address is None and num_processes is None:
        return False  # single process
    if num_processes is not None and num_processes <= 1:
        return False

    if local_device_count is None:
        ld = os.environ.get("DETMATCH_LOCAL_DEVICES")
        local_device_count = int(ld) if ld else None
    if local_device_count is not None:
        jax.config.update("jax_num_cpu_devices", local_device_count)
    # CPU backends need an explicit cross-process collectives impl; the
    # TPU backend's ICI/DCN collectives need none.
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu") or \
            (jax.config.read("jax_platforms") or "") == "cpu":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that owns checkpoint/log/vis IO."""
    return jax.process_index() == 0


def put_global_batch(tree, sharding, data_axis: int = 0):
    """Assemble a global batch-sharded array tree from per-process data.

    Single-process: a plain ``device_put``. Multi-process: every leaf is
    this process's LOCAL slice along ``data_axis``; the global array
    (leading dim = local * process_count) is stitched logically — no
    cross-host copies, each shard stays on the host that produced it.
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def put(x):
        x = np.asarray(x)
        gshape = (x.shape[:data_axis]
                  + (x.shape[data_axis] * jax.process_count(),)
                  + x.shape[data_axis + 1:])
        return jax.make_array_from_process_local_data(sharding, x, gshape)

    return jax.tree.map(put, tree)


def put_replicated(tree, sharding):
    """Replicate a host tree onto every device of the global mesh.

    All processes must pass identical values (true for params/opt-state
    built from the same seed, and for anything restored from the same
    checkpoint).
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x, x.shape)

    return jax.tree.map(put, tree)
