"""Multi-device sharding tests on the virtual 8-device CPU mesh:
batch-sharded IPM solves must match unsharded results and actually
partition over the mesh (SURVEY.md §2.10 — the framework's DP axis)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hpmpc_tpu.models import ipm
from hpmpc_tpu.parallel import batch as pbatch
from hpmpc_tpu.utils.mass_spring import mass_spring_qp


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_solve_matches_batched():
    dims, qp = mass_spring_qp(4, 1, 6)
    B = 16
    qpb = pbatch.broadcast_qp(qp, B)
    scales = jnp.linspace(0.5, 1.5, B, dtype=qp.b.dtype)
    qpb = dataclasses.replace(qpb, b=qpb.b * scales[:, None, None])
    cfg = ipm.IPMConfig(k_max=20, mu_tol=1e-8)

    mesh = pbatch.make_mesh(8)
    qps = pbatch.shard_qp(qpb, mesh)
    sol_sharded = pbatch.solve_sharded(dims, qps, cfg, mesh)

    sol_plain = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg))(qpb)

    np.testing.assert_allclose(
        np.asarray(sol_sharded.z), np.asarray(sol_plain.z), atol=1e-9
    )
    np.testing.assert_array_equal(
        np.asarray(sol_sharded.kk), np.asarray(sol_plain.kk)
    )
    # the output really is sharded over the mesh
    assert len(sol_sharded.z.sharding.device_set) == 8


def test_graft_entry_compiles():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)

    ge.dryrun_multichip(8)
