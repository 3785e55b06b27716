"""Multi-host SPMD support.

Reference capability: multi-GPU/multi-node DDP launchers
(``tools/dist_train.sh:7-9``, ``mmdet3d/apis/ssl_train.py:61-69`` —
torch.distributed process groups + gradient all-reduce hooks).

TPU-native redesign: every host joins ONE ``jax.distributed``
coordination service; ``jax.devices()`` then spans all hosts and the
same ``Mesh``/``NamedSharding`` code that runs single-host runs
multi-host unchanged — XLA partitions each jitted program and inserts
the collectives (ICI within a slice, DCN across). The only host-side
differences are (a) each process feeds its LOCAL shard of the global
batch and (b) checkpoint/log IO runs on process 0 only.
"""
from .distributed import (init_distributed, is_primary, process_count,
                          process_index, put_global_batch, put_replicated)

__all__ = [
    "init_distributed", "is_primary", "process_count", "process_index",
    "put_global_batch", "put_replicated",
]
