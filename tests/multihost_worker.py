"""Worker process for the 2-process jax.distributed multihost test.

Launched (twice) by ``tests/test_sharding.py::test_multihost_two_process_cpu``
with argv ``<coordinator_port> <process_id>``.  Each process owns 4 virtual
CPU devices (8 global) and contributes its own contiguous half of the batch
via :func:`hpmpc_tpu.parallel.multihost.shard_local_batch` — the structural
analogue of one host of a multi-host TPU slice feeding its local shard
(SURVEY.md §2.10 multi-host axis; the reference has no distributed runtime
at all, this capability is TPU-native-only).

Not a pytest module (no ``test_`` prefix): run only as a subprocess.
"""

import dataclasses
import os
import pathlib
import sys

REPO = str(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

port, proc_id = sys.argv[1], int(sys.argv[2])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hpmpc_tpu.models import ipm  # noqa: E402
from hpmpc_tpu.parallel import batch as pbatch, multihost  # noqa: E402
from hpmpc_tpu.utils.mass_spring import mass_spring_qp  # noqa: E402

# distributed init MUST precede any backend-touching API (multihost doc)
multihost.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2,
    process_id=proc_id,
)
assert multihost.is_initialized()
assert jax.process_count() == 2, jax.process_count()
assert len(jax.local_devices()) == 4
assert len(jax.devices()) == 8

B = 16
dims, qp = mass_spring_qp(4, 1, 6, dtype=jnp.float64)
qpb = pbatch.broadcast_qp(qp, B)
scales = jnp.linspace(0.5, 1.5, B, dtype=qp.b.dtype)
qpb = dataclasses.replace(qpb, b=qpb.b * scales[:, None, None])
cfg = ipm.IPMConfig(k_max=20, mu_tol=1e-8)

mesh = multihost.global_batch_mesh()
assert mesh.devices.size == 8

# each process feeds only ITS half of the global batch
lo, hi = proc_id * (B // 2), (proc_id + 1) * (B // 2)
qp_glob = jax.tree_util.tree_map(
    lambda x: multihost.shard_local_batch(np.asarray(x)[lo:hi], mesh), qpb
)
sol = pbatch.solve_sharded(dims, qp_glob, cfg, mesh)

# independent single-process reference for the FULL batch (local compute)
sol_ref = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg))(qpb)
z_ref = np.asarray(sol_ref.z)
kk_ref = np.asarray(sol_ref.kk)

# every addressable shard of the distributed result matches its batch rows
n_checked = 0
for shard in sol.z.addressable_shards:
    rows = shard.index[0]
    np.testing.assert_allclose(np.asarray(shard.data), z_ref[rows], atol=1e-9)
    n_checked += shard.data.shape[0]
for shard in sol.kk.addressable_shards:
    np.testing.assert_array_equal(np.asarray(shard.data), kk_ref[shard.index[0]])
assert n_checked == B // 2, n_checked  # 4 local devices x 2 instances

print(f"MULTIHOST_OK {proc_id} checked={n_checked}", flush=True)
