"""Multi-host orchestration.

The reference has no inter-host communication at all (SURVEY §2.3: the
"backend" is the filesystem). Here multi-host training follows the standard
jax recipe: ``jax.distributed.initialize`` connects the hosts, the global
mesh spans every chip (ICI within a slice, DCN across slices — XLA routes
collectives), each host feeds its shard of the dataset
(``data.load_split(shard_index=process_index, num_shards=process_count)``),
and per-host batches assemble into globally-sharded arrays with
``jax.make_array_from_process_local_data``.

This module is exercised single-process in CI (the virtual CPU mesh); on a
real pod each host runs the same program.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> tuple[int, int]:
    """Connect this host to the job. No-ops gracefully in single-process
    runs. Returns (process_index, process_count)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()


def global_batch(mesh: Mesh, local_batch: dict[str, np.ndarray],
                 axis: str = "data"):
    """Assemble per-host local batch arrays into global arrays sharded over
    ``axis``. Each host contributes its local slice; the global batch size
    is local_batch_size * process_count."""
    sharding = NamedSharding(mesh, P(axis))
    out = {}
    for k, v in local_batch.items():
        global_shape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(
            sharding, np.asarray(v), global_shape)
    return out
