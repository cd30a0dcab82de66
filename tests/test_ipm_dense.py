"""Dense condensed-QP latency engine (5th generation): plan + oracle +
kernel parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from hpmpc_tpu.models import ipm, ipm_dense
from hpmpc_tpu.utils.mass_spring import mass_spring_qp


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    yield


def test_dense_ref_matches_sequential_solver():
    """The dense-QP oracle converges the full N=30 flagship problem with
    the same iteration count as the sequential structured solver and
    agrees on the controls to the converged-mu scale, in BOTH dtypes
    (f32 is the latency-deployment mode)."""
    for dt in (jnp.float64, jnp.float32):
        dims, qp = mass_spring_qp(8, 3, 30, dtype=dt)
        cfg = ipm.IPMConfig(k_max=10, mu_tol=1e-4, alpha_min=1e-8)
        sol_s = jax.jit(lambda q: ipm.solve(dims, q, cfg))(qp)
        plan = ipm_dense.plan_dense(dims, qp)
        res = jax.jit(lambda bf: ipm_dense.solve_dense_ref(
            plan, bf, cfg))(qp.b.reshape(-1))
        assert int(res.status) == 0
        assert int(res.kk) == int(sol_s.kk)
        du = np.abs(np.asarray(res.u0, np.float64)
                    - np.asarray(sol_s.z[0, :dims.NU], np.float64))
        assert du.max() < 1e-3, du


def test_dense_kernel_matches_oracle(interpret_pallas):
    """The one-pallas_call dense IPM == the pure-JAX oracle, iterate for
    iterate (same kk, mu to fp32 roundoff, controls to 1e-4)."""
    dims, qp = mass_spring_qp(8, 3, 12, dtype=jnp.float32)
    cfg = ipm.IPMConfig(k_max=8, mu_tol=1e-4, alpha_min=1e-8)
    plan = ipm_dense.plan_dense(dims, qp)
    bflat = qp.b.reshape(-1)
    ref = jax.jit(lambda bf: ipm_dense.solve_dense_ref(
        plan, bf, cfg))(bflat)
    res = jax.jit(lambda bf: ipm_dense.solve_dense_tick(
        plan, bf, cfg))(bflat)
    assert int(res.kk) == int(ref.kk)
    assert int(res.status) == int(ref.status)
    np.testing.assert_allclose(float(res.mu), float(ref.mu),
                               rtol=2e-2, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(res.y), np.asarray(ref.y), atol=2e-4)


def test_dense_kernel_flagship_n30(interpret_pallas):
    """Flagship horizon through the kernel (nz=90, ngd=120): converges
    with the sequential solver's iteration count; u0 parity."""
    dims, qp = mass_spring_qp(8, 3, 30, dtype=jnp.float32)
    cfg = ipm.IPMConfig(k_max=8, mu_tol=1e-4, alpha_min=1e-8)
    sol_s = jax.jit(lambda q: ipm.solve(dims, q, cfg))(qp)
    plan = ipm_dense.plan_dense(dims, qp)
    res = jax.jit(lambda bf: ipm_dense.solve_dense_tick(
        plan, bf, cfg))(qp.b.reshape(-1))
    assert int(res.status) == 0
    assert int(res.kk) == int(sol_s.kk)
    du = np.abs(np.asarray(res.u0, np.float64)
                - np.asarray(sol_s.z[0, :dims.NU], np.float64))
    assert du.max() < 1e-3, du


def test_dense_warm_tick(interpret_pallas):
    """Warm-started dense tick (RTI hot loop): seeding from the previous
    tick's y cuts iterations and kernel == oracle on the warm path."""
    dims, qp = mass_spring_qp(8, 3, 12, dtype=jnp.float32)
    cfg = ipm.IPMConfig(k_max=10, mu_tol=1e-4, alpha_min=1e-8)
    plan = ipm_dense.plan_dense(dims, qp)
    bflat = qp.b.reshape(-1)
    cold = jax.jit(lambda bf: ipm_dense.solve_dense_ref(
        plan, bf, cfg))(bflat)
    b2 = bflat * 1.01
    warm_ref = jax.jit(lambda bf, y0: ipm_dense.solve_dense_ref(
        plan, bf, cfg, y0=y0))(b2, cold.y)
    warm_k = jax.jit(lambda bf, y0: ipm_dense.solve_dense_tick(
        plan, bf, cfg, y0=y0))(b2, cold.y)
    cold2 = jax.jit(lambda bf: ipm_dense.solve_dense_ref(
        plan, bf, cfg))(b2)
    assert int(warm_ref.status) == 0
    assert int(warm_ref.kk) <= int(cold2.kk)
    assert int(warm_k.kk) == int(warm_ref.kk)
    np.testing.assert_allclose(
        np.asarray(warm_k.y), np.asarray(warm_ref.y), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(warm_ref.u0), np.asarray(cold2.u0), atol=2e-3)
