"""Sharded fleet solving: one QP batch spread over a device mesh.

The deployment pattern for fleet-scale MPC (thousands of independent
plants, one controller program): the instance batch is laid out over a
``jax.sharding.Mesh`` and ``parallel.batch.solve_sharded`` runs the
batched IPM per device — with ``use_pallas`` each device runs the full
Pallas engine on its local shard via ``jax.shard_map`` (the kernels are
opaque to XLA's SPMD partitioner).  Per-instance solves are independent,
so sharded must equal unsharded BIT-FOR-BIT — asserted here on the
8-virtual-device CPU mesh (real-Mosaic twin:
``tools/check_shardmap_tpu.py``).

Run: python examples/sharded_fleet.py
(env: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8)
"""

import dataclasses
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import jax.numpy as jnp
import numpy as np

from hpmpc_tpu.models import ipm
from hpmpc_tpu.parallel import batch as pbatch
from hpmpc_tpu.utils.mass_spring import mass_spring_qp


def main():
    n_dev = len(jax.devices())
    assert n_dev == 8, f"expected the 8-device CPU mesh, got {n_dev}"

    # a fleet of 64 mass-spring plants, each with its own disturbance
    nx, nu, N = 8, 3, 12
    dims, qp = mass_spring_qp(nx, nu, N)
    B = 64
    qpb = pbatch.broadcast_qp(qp, B)
    rng = np.random.default_rng(0)
    qpb = dataclasses.replace(
        qpb,
        b=qpb.b * jnp.asarray(
            1 + 0.05 * rng.standard_normal(B), qp.b.dtype)[:, None, None],
    )
    cfg = ipm.IPMConfig(k_max=25, mu_tol=1e-8)

    # reference: the plain single-device batched solve
    sol_one = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg))(qpb)
    assert int(jnp.sum(sol_one.status == 0)) == B, "fleet must converge"

    # the same fleet sharded over the mesh
    mesh = pbatch.make_mesh(n_dev)
    qps = pbatch.shard_qp(qpb, mesh)
    sol_sh = pbatch.solve_sharded(dims, qps, cfg, mesh)
    jax.block_until_ready(sol_sh.z)

    assert len(sol_sh.z.sharding.device_set) == n_dev, "not sharded"
    np.testing.assert_array_equal(np.asarray(sol_sh.z),
                                  np.asarray(sol_one.z))
    np.testing.assert_array_equal(np.asarray(sol_sh.kk),
                                  np.asarray(sol_one.kk))

    u0 = np.asarray(sol_sh.z[:, 0, :nu])
    print(f"fleet of {B} plants over {n_dev} devices: all converged, "
          f"sharded == unsharded bit-for-bit; mean iters "
          f"{float(np.mean(np.asarray(sol_sh.kk))):.1f}, "
          f"u0 range [{u0.min():.3f}, {u0.max():.3f}]")
    print("OK")


if __name__ == "__main__":
    main()
