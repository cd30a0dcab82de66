"""Multi-device sharding tests on the virtual 8-device CPU mesh:
batch-sharded IPM solves must match unsharded results and actually
partition over the mesh (SURVEY.md §2.10 — the framework's DP axis)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from hpmpc_tpu.models import ipm
from hpmpc_tpu.parallel import batch as pbatch
from hpmpc_tpu.utils.mass_spring import mass_spring_qp


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    yield


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


@pytest.mark.parametrize("engine", ["flat", "lanes"])
def test_sharded_engine_matches_unsharded(interpret_pallas, monkeypatch,
                                          engine):
    """The fast Pallas engines under a 2-device mesh (VERDICT r3 #2): the
    engines are opaque kernels with no SPMD partitioning rules, so
    solve_sharded wraps them in jax.shard_map — each device runs the full
    engine on its local 1024-instance shard.  Per-instance results are
    independent, so sharded must equal unsharded BIT-FOR-BIT."""
    monkeypatch.setenv("HPMPC_LANES_LOOP", "1" if engine == "lanes" else "0")
    monkeypatch.setenv("HPMPC_MEGA_SWEEPS", "1" if engine == "lanes" else "0")
    monkeypatch.setenv("HPMPC_RESIDENT", "0")

    dims, qp = mass_spring_qp(8, 3, 4, dtype=jnp.float32)
    B = 2048
    qpb = pbatch.broadcast_qp(qp, B)
    rng = np.random.default_rng(7)
    qpb = dataclasses.replace(
        qpb,
        b=qpb.b * jnp.asarray(
            1 + 0.02 * rng.standard_normal(B), jnp.float32)[:, None, None],
    )
    cfg = ipm.IPMConfig(k_max=3, mu_tol=0.0, alpha_min=1e-8,
                        use_pallas=True)
    # the dispatch must actually select the engine under test (the
    # per-device batch inside shard_map is 1024, a BI multiple)
    assert pbatch.select_engine(dims, cfg, 1024, jnp.float32) == engine

    sol_plain = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg))(qpb)

    mesh = pbatch.make_mesh(2)
    qps = pbatch.shard_qp(qpb, mesh)
    sol_sh = pbatch.solve_sharded(dims, qps, cfg, mesh)
    jax.block_until_ready(sol_sh.z)

    assert len(sol_sh.z.sharding.device_set) == 2
    np.testing.assert_array_equal(np.asarray(sol_sh.z),
                                  np.asarray(sol_plain.z))
    np.testing.assert_array_equal(np.asarray(sol_sh.kk),
                                  np.asarray(sol_plain.kk))
    np.testing.assert_array_equal(np.asarray(sol_sh.inf_norm_res),
                                  np.asarray(sol_plain.inf_norm_res))


def test_graft_entry_compiles():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)

    ge.dryrun_multichip(8)


def test_batched_soft_and_admm_and_tree():
    """All solver families are vmap-safe (per-instance gating) — smoke test
    with per-instance perturbed data."""
    import dataclasses as dc

    from hpmpc_tpu.models import admm, ipm_soft, tree
    from hpmpc_tpu.utils.mass_spring import mass_spring_soft_qp

    B = 4
    # soft IPM batched
    dims, qp, soft = mass_spring_soft_qp(4, 1, 6)
    qps = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), qp)
    softs = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), soft)
    scales = jnp.linspace(0.9, 1.1, B, dtype=qp.b.dtype)
    qps = dc.replace(qps, b=qps.b * scales[:, None, None])
    cfg = ipm.IPMConfig(k_max=40, mu0=100.0, mu_tol=1e-6)
    sols = jax.jit(jax.vmap(lambda q, s: ipm_soft.solve(dims, q, s, cfg)))(qps, softs)
    assert int(jnp.sum(sols.status == 0)) == B

    # ADMM batched
    from hpmpc_tpu.utils.mass_spring import mass_spring_qp

    dims2, qp2 = mass_spring_qp(4, 1, 6)
    qps2 = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), qp2)
    qps2 = dc.replace(qps2, b=qps2.b * scales[:, None, None])
    acfg = admm.ADMMConfig(k_max=1500, tol_p=1e-7, tol_d=1e-7)
    asols = jax.jit(jax.vmap(lambda q: admm.solve_box(dims2, q, acfg)))(qps2)
    assert int(jnp.sum(asols.status == 0)) == B

    # tree IPM batched
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_tree import _tree_qp

    tdef = tree.TreeDef.from_md_nr_nh(2, 1, 3)
    dims3, qp3 = _tree_qp(tdef, nb=1)
    qps3 = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), qp3)
    qps3 = dc.replace(qps3, b=qps3.b * scales[:, None, None])
    tcfg = ipm.IPMConfig(k_max=25, mu_tol=1e-8)
    tsols = jax.jit(jax.vmap(lambda q: tree.solve_tree_ipm(tdef, dims3, q, tcfg)))(qps3)
    assert int(jnp.sum(tsols.status == 0)) == B


def test_multihost_two_process_cpu():
    """Structural multi-host validation (VERDICT #6): two REAL processes
    under jax.distributed (coordinator + worker), 4 virtual CPU devices
    each -> an 8-device global mesh; each process feeds its own half of
    the batch through multihost.shard_local_batch and both assert their
    addressable shards of the sharded solve against an independently
    computed full-batch reference.  Per-instance solves need no
    collectives, so the DCN-scaling argument is input distribution only —
    this test proves the initialization/mesh/feed path end-to-end."""
    import os
    import socket
    import subprocess
    import sys

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    # bypass this machine's sitecustomize (pins the axon TPU plugin) and
    # the parent's 8-device flag; the worker sets its own env
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"MULTIHOST_OK {i} checked=8" in out, out


def test_multihost_helpers_single_process():
    """multihost helpers degrade gracefully in a single-process run and
    build a mesh/global array over all local devices."""
    from hpmpc_tpu.parallel import multihost

    multihost.initialize()  # no-op single-process
    mesh = multihost.global_batch_mesh()
    assert mesh.devices.size == 8

    local = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    arr = multihost.shard_local_batch(local, mesh)
    assert arr.shape == (16, 3)
    assert len(arr.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(arr), local)


def test_sharded_engine_warm_start(interpret_pallas, monkeypatch):
    """Warm starts flow through the shard_map wrapper (the warm dict is
    sharded alongside the QP); sharded warm == unsharded warm bit-for-bit."""
    monkeypatch.setenv("HPMPC_LANES_LOOP", "0")
    monkeypatch.setenv("HPMPC_MEGA_SWEEPS", "0")
    monkeypatch.setenv("HPMPC_RESIDENT", "0")

    dims, qp = mass_spring_qp(8, 3, 4, dtype=jnp.float32)
    B = 2048
    qpb = pbatch.broadcast_qp(qp, B)
    rng = np.random.default_rng(3)
    qpb = dataclasses.replace(
        qpb,
        b=qpb.b * jnp.asarray(
            1 + 0.02 * rng.standard_normal(B), jnp.float32)[:, None, None],
    )
    cfg0 = ipm.IPMConfig(k_max=3, mu_tol=0.0, alpha_min=1e-8,
                         use_pallas=True)
    sol0 = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg0))(qpb)

    cfg_w = dataclasses.replace(cfg0, warm_start=True, k_max=2)
    sol_w = jax.jit(
        lambda q, z, p: pbatch.solve_batched(dims, q, cfg_w, z0=z, pi0=p)
    )(qpb, sol0.z, sol0.pi)

    mesh = pbatch.make_mesh(2)
    qps = pbatch.shard_qp(qpb, mesh)
    sol_ws = pbatch.solve_sharded(dims, qps, cfg_w, mesh,
                                  z0=sol0.z, pi0=sol0.pi)
    jax.block_until_ready(sol_ws.z)
    np.testing.assert_array_equal(np.asarray(sol_ws.z),
                                  np.asarray(sol_w.z))
    np.testing.assert_array_equal(np.asarray(sol_ws.kk),
                                  np.asarray(sol_w.kk))
