"""Multi-host execution helpers.

The reference has no distributed runtime at all (SURVEY.md §2.10); here the
batch axis shards over every chip of every host.  On a multi-host TPU slice:

    from hpmpc_tpu.parallel import multihost
    multihost.initialize()             # jax.distributed under the hood
    mesh = multihost.global_batch_mesh()
    sols = batch.solve_sharded(dims, qp, cfg, mesh)

Per-instance solves need no collectives, so scaling across ICI/DCN is linear
up to input distribution; use `jax.make_array_from_process_local_data` to
feed each host its own shard of instances.
"""

from __future__ import annotations

import numpy as np


def is_initialized() -> bool:
    """Whether the jax.distributed client is live for this process."""
    import jax

    if hasattr(jax.distributed, "is_initialized"):  # jax >= 0.7
        return bool(jax.distributed.is_initialized())
    from jax._src import distributed as _dist

    return _dist.global_state.client is not None


def initialize(**kwargs):
    """Initialize jax.distributed (idempotent).

    Must be called BEFORE any backend-touching JAX API (jax.devices,
    jax.process_count, device_put, ...) — instantiating the local backend
    first would make distributed initialization fail.  kwargs pass through
    to ``jax.distributed.initialize`` (coordinator_address, num_processes,
    process_id, ...).  With no kwargs and no cluster environment variables
    JAX cannot auto-detect a cluster; that specific error is suppressed and
    the process proceeds single-process — any other failure propagates.
    """
    import jax

    if is_initialized():
        return
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:
        # only swallow the driverless single-process cases when
        # auto-detecting (no kwargs): "coordinator_address should be
        # defined" / backend already up; explicit-argument failures
        # always propagate
        benign = (
            "coordinator_address" in str(e)
            or "must be called before" in str(e)
        )
        if kwargs or not benign:
            raise


def global_batch_mesh(axis: str = "batch"):
    """A 1-D mesh over every addressable device of every process."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def shard_local_batch(x_local, mesh, axis: str = "batch"):
    """Assemble a global sharded array from per-process local instance data
    (each host contributes its own contiguous slice of the global batch)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, x_local)
