"""Multi-host utilities.

The reference spawns one process per GPU and wires NCCL by hand
(`distributed.py:41-182`).  On TPU pods the equivalent is: one process per
host, `jax.distributed.initialize` for DCN rendezvous, a global
`jax.sharding.Mesh` over all devices, per-host rank-sharded dataset loading
(the data layer already takes rank/world_size), and
`make_array_from_process_local_data` to assemble the globally-sharded batch.
Gradient/metric reductions are in-graph XLA collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def maybe_initialize_distributed(coordinator_address: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None):
    """Initialize jax.distributed when a coordinator is configured; a no-op
    for single-host runs (replaces `init_distributed`,
    `distributed.py:47-57`)."""
    if coordinator_address is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def world_info():
    """(process_index, process_count, local_device_count, global_device_count)."""
    return (jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count())


def global_batch_from_local(mesh, batch: dict, sharding=None) -> dict:
    """Assemble each process's local batch shard into globally-sharded arrays
    on `mesh`'s 'data' axis (the TPU-native replacement for the reference's
    per-rank dataloaders feeding per-rank models)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = sharding or NamedSharding(mesh, P("data"))
    out = {}
    for k, v in batch.items():
        if isinstance(v, (list, tuple)) and v and isinstance(v[0], str):
            out[k] = v            # host-side metadata stays local
            continue
        arr = np.asarray(v)
        out[k] = jax.make_array_from_process_local_data(sharding, arr)
    return out


def process_allgather(tree):
    """Gather host-local values across processes (replaces the rank-file
    npz merge for in-memory paths; `multihost_utils.process_allgather`)."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)
