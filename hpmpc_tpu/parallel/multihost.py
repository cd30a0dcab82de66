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


def initialize(**kwargs):
    """Initialize jax.distributed (no-op if single-process)."""
    import jax

    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(**kwargs)
    except Exception:
        # single-process / driverless environments
        pass


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
