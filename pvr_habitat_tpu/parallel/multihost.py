"""Multi-host (DCN) bring-up: jax.distributed + per-host shard loading.

SURVEY.md §2.3 names "jax.distributed over DCN for multi-host" as the
TPU-native replacement for the reference's single-GPU-per-job Slurm
scaling (slurm_bc.py:203).  The model:

- every host runs the SAME program and calls ``initialize`` (or passes
  ``--coordinator`` to the CLI entry points, wired via
  ``maybe_initialize``);
- a global mesh spans all hosts' devices; params are replicated,
  batches shard over 'data';
- each host touches only ITS slice of the input (``process_slice``) and
  assembles the global array with
  ``jax.make_array_from_process_local_data`` — no host ever
  materializes the full batch;
- XLA routes collectives over ICI within a slice and DCN across hosts.

Verified by a real 2-process localhost CPU run in
tests/test_multihost.py (no multi-host hardware needed: each process
gets 4 virtual CPU devices and they form one 8-device world).
"""

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def initialize(coordinator, num_processes, process_id,
               local_device_ids=None):
    """jax.distributed bring-up.  Call before any other JAX API.

    coordinator: 'host:port' of process 0 (DCN-reachable).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)


def maybe_initialize(flags):
    """CLI hook: ``--coordinator host:port --num_processes N
    --process_id i`` turns any entry point into one rank of a
    multi-host run.  No-op when --coordinator is unset."""
    coordinator = getattr(flags, "coordinator", "")
    if coordinator:
        initialize(coordinator, flags.num_processes, flags.process_id)


def process_slice(n, num_processes=None, process_id=None):
    """The contiguous [start, stop) slice of n items owned by this
    process (block partitioning; the first ``n % p`` ranks get one
    extra item)."""
    p = num_processes if num_processes is not None else jax.process_count()
    i = process_id if process_id is not None else jax.process_index()
    base, rem = divmod(n, p)
    start = i * base + min(i, rem)
    return start, start + base + (1 if i < rem else 0)


def global_array_from_local(mesh, local_rows, axis_name="data"):
    """Assemble a globally-sharded array from each process's local rows
    (sharded over the mesh axis `axis_name` on dim 0).  Every process
    must contribute the same number of rows."""
    sharding = NamedSharding(
        mesh, P(*([axis_name] + [None] * (local_rows.ndim - 1))))
    global_shape = (local_rows.shape[0] * jax.process_count(),) \
        + local_rows.shape[1:]
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_rows), global_shape)


def local_rows_from_global(global_array):
    """This process's rows of a dim-0-sharded global array, in order."""
    shards = sorted(global_array.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
