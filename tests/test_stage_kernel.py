"""Pallas fused-stage-kernel tests (interpret mode on CPU): the kernels must
reproduce the XLA Riccati path and drive the IPM to the same iterates."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from hpmpc_tpu.models import ipm, riccati
from hpmpc_tpu.parallel import batch as pbatch
from hpmpc_tpu.utils.mass_spring import mass_spring_qp


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    # stage_kernel captured pl.pallas_call at call time (module-level import
    # of pl), so patching the attribute is enough
    yield


def _batch_qp(N=4, B=1024, ngN=0, ng=0):
    dims, qp = mass_spring_qp(8, 3, N, ng=ng, ngN=ngN, dtype=jnp.float32)
    qpb = pbatch.broadcast_qp(qp, B)
    rng = np.random.default_rng(0)
    qpb = dataclasses.replace(
        qpb,
        b=qpb.b * jnp.asarray(1 + 0.02 * rng.standard_normal(B), jnp.float32)[:, None, None],
    )
    return dims, qpb


def test_fused_sv_matches_xla(interpret_pallas):
    from hpmpc_tpu.ops import stage_kernel as sk

    dims, qpb = _batch_qp()
    H_eff = qpb.H + jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(qpb.pad_diag)
    g_eff = qpb.g * qpb.z_mask
    z, pi, L, eu, px, Pb = sk.factor_solve_batched(
        H_eff, g_eff, qpb.F, qpb.b, dims.NU
    )
    with jax.default_matmul_precision("float32"):
        ref = jax.vmap(
            lambda H, g, F, b: riccati.factor_solve(H, g, F, b, dims.NU)
        )(H_eff, g_eff, qpb.F, qpb.b)
    sol_ref, L_ref, _, px_ref, Pb_ref = ref
    np.testing.assert_allclose(np.asarray(z), np.asarray(sol_ref.z), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pi), np.asarray(sol_ref.pi), atol=2e-4)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref), atol=2e-5)

    # retained-factor trs with cached Pb
    z2, pi2 = sk.solve_batched(L, g_eff, qpb.F, qpb.b, Pb, dims.NU)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=2e-5)


def test_fused_ipm_matches_xla_path(interpret_pallas):
    dims, qpb = _batch_qp()
    cfg_x = ipm.IPMConfig(k_max=3, mu_tol=1e-4)
    cfg_p = dataclasses.replace(cfg_x, use_pallas=True)
    sol_x = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg_x))(qpb)
    sol_p = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg_p))(qpb)
    assert bool(jnp.all(sol_x.kk == sol_p.kk))
    np.testing.assert_allclose(
        np.asarray(sol_p.z), np.asarray(sol_x.z), atol=5e-4
    )


def test_fused_ipm_with_general_constraints(interpret_pallas):
    """The folded kernel's in-VMEM ng-stage Hessian add (terminal equality
    rows) must match the XLA path."""
    dims, qpb = _batch_qp(ngN=4)
    cfg_x = ipm.IPMConfig(k_max=3, mu_tol=1e-4)
    cfg_p = dataclasses.replace(cfg_x, use_pallas=True)
    sol_x = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg_x))(qpb)
    sol_p = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg_p))(qpb)
    assert bool(jnp.all(sol_x.kk == sol_p.kk))
    np.testing.assert_allclose(
        np.asarray(sol_p.z), np.asarray(sol_x.z), atol=5e-4
    )


def test_fused_ipm_with_interior_general_constraints(interpret_pallas):
    """Multiple ng-active stages exercise the folded kernel's ng_slot index
    mapping (one barrier-term slot per active stage) and the flat path's
    multi-stage C_ngF rows."""
    dims, qpb = _batch_qp(N=5, ng=2, ngN=4)
    assert sum(1 for n in dims.ng if n > 0) > 2  # interior + terminal
    cfg_x = ipm.IPMConfig(k_max=2, mu_tol=1e-4)
    cfg_p = dataclasses.replace(cfg_x, use_pallas=True)
    sol_x = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg_x))(qpb)
    sol_p = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg_p))(qpb)
    assert bool(jnp.all(sol_x.kk == sol_p.kk))
    np.testing.assert_allclose(
        np.asarray(sol_p.z), np.asarray(sol_x.z), atol=5e-4
    )


def test_structured_pallas_path_via_direct_vmap(interpret_pallas):
    """The structured custom_vmap Pallas route (used when callers vmap
    ipm.solve directly rather than through solve_batched) must still match
    the XLA path."""
    dims, qpb = _batch_qp()
    cfg_x = ipm.IPMConfig(k_max=2, mu_tol=1e-4)
    cfg_p = dataclasses.replace(cfg_x, use_pallas=True)
    sol_x = jax.jit(jax.vmap(lambda q: ipm.solve(dims, q, cfg_x)))(qpb)
    sol_p = jax.jit(jax.vmap(lambda q: ipm.solve(dims, q, cfg_p)))(qpb)
    assert bool(jnp.all(sol_x.kk == sol_p.kk))
    np.testing.assert_allclose(
        np.asarray(sol_p.z), np.asarray(sol_x.z), atol=5e-4
    )
