"""ADMM tests: convergence to the IPM solutions (the gate SURVEY.md §7
step 9 prescribes, mirroring the orphaned reference tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from hpmpc_tpu.models import admm, ipm, ipm_soft
from hpmpc_tpu.utils.mass_spring import mass_spring_qp, mass_spring_soft_qp


def test_admm_box_converges_to_ipm_solution():
    dims, qp = mass_spring_qp(8, 3, 10)
    cfg_ipm = ipm.IPMConfig(k_max=30, mu_tol=1e-10)
    sol_ipm = jax.jit(lambda q: ipm.solve(dims, q, cfg_ipm))(qp)
    assert int(sol_ipm.status) == 0

    cfg = admm.ADMMConfig(k_max=2000, rho=2.0, alpha=1.5, tol_p=1e-8, tol_d=1e-8)
    sol = jax.jit(lambda q: admm.solve_box(dims, q, cfg))(qp)
    assert int(sol.status) == 0, f"ADMM did not converge, kk={int(sol.kk)}"
    np.testing.assert_allclose(
        np.asarray(sol.v), np.asarray(sol_ipm.z), atol=2e-6
    )
    # active box constraints are respected exactly by the split variable
    v = np.asarray(sol.v)
    assert np.max(v[:, :3]) <= 0.5 + 1e-12
    assert np.min(v[:, :3]) >= -0.5 - 1e-12


def test_admm_box_warm_start_resumes():
    dims, qp = mass_spring_qp(8, 3, 10)
    cfg = admm.ADMMConfig(k_max=2000, tol_p=1e-8, tol_d=1e-8)
    sol1 = jax.jit(lambda q: admm.solve_box(dims, q, cfg))(qp)
    # warm start from the solution: should converge (almost) immediately
    sol2 = jax.jit(
        lambda q, z, v, w: admm.solve_box(dims, q, cfg, z0=z, v0=v, w0=w)
    )(qp, sol1.z, sol1.v, sol1.w)
    assert int(sol2.kk) <= max(2, int(sol1.kk) // 10)


def test_admm_soft_converges_to_soft_ipm_solution():
    dims, qp, soft = mass_spring_soft_qp(8, 3, 10, Z=10.0, z_lin=100.0)
    cfg_ipm = ipm.IPMConfig(k_max=40, mu0=100.0, mu_tol=1e-10)
    sol_ipm = jax.jit(lambda q, s: ipm_soft.solve(dims, q, s, cfg_ipm))(qp, soft)
    assert int(sol_ipm.status) == 0

    # map the SoftSpec (soft state bounds) onto per-coordinate penalties:
    # hard input boxes stay in qp; soft state bands become prox penalties
    NZ = dims.NZ
    N = dims.N
    Z = np.zeros((N + 1, NZ))
    zl = np.zeros((N + 1, NZ))
    lb_extra = np.zeros((N + 1, NZ))
    import dataclasses as dc

    # add the soft bounds as box bounds on the previously-unbounded state
    # coords so the prox sees them, with the soft penalty attached
    idxbs = np.asarray(soft.idxbs)
    msk = np.asarray(soft.ns_mask)
    NB_new = dims.NB + idxbs.shape[1]
    idxb2 = np.zeros((N + 1, NB_new), dtype=np.int32)
    dlb2 = np.zeros((N + 1, NB_new))
    dub2 = np.zeros((N + 1, NB_new))
    nbm2 = np.zeros((N + 1, NB_new))
    idxb2[:, : dims.NB] = np.asarray(qp.idxb)
    dlb2[:, : dims.NB] = np.asarray(qp.d_lb)
    dub2[:, : dims.NB] = np.asarray(qp.d_ub)
    nbm2[:, : dims.NB] = np.asarray(qp.nb_mask)
    for n in range(N + 1):
        for j in range(idxbs.shape[1]):
            if msk[n, j] > 0:
                k = dims.NB + j
                idxb2[n, k] = idxbs[n, j]
                dlb2[n, k] = np.asarray(soft.d_lbs)[n, j]
                dub2[n, k] = np.asarray(soft.d_ubs)[n, j]
                nbm2[n, k] = 1.0
                Z[n, idxbs[n, j]] = np.asarray(soft.Z)[n, 0, j]
                zl[n, idxbs[n, j]] = np.asarray(soft.z_lin)[n, 0, j]
    qp2 = dc.replace(
        qp,
        idxb=jnp.asarray(idxb2),
        d_lb=jnp.asarray(dlb2),
        d_ub=jnp.asarray(dub2),
        nb_mask=jnp.asarray(nbm2),
    )
    # hard input boxes must stay hard: zero penalty means the prox clips
    # (our prox treats Z=z_lin=0 as... penalty-free violation!), so give the
    # hard coords effectively-infinite linear penalty
    for n in range(N + 1):
        for j in range(dims.nb[n]):
            zl[n, int(np.asarray(qp.idxb)[n, j])] = 1e12

    cfg = admm.ADMMConfig(k_max=4000, rho=10.0, alpha=1.6, tol_p=1e-8, tol_d=1e-8)
    sol = jax.jit(
        lambda q, Zp, zp: admm.solve_soft(dims, q, Zp, zp, cfg)
    )(qp2, jnp.asarray(Z), jnp.asarray(zl))
    assert int(sol.status) == 0, f"kk={int(sol.kk)}"
    np.testing.assert_allclose(
        np.asarray(sol.z), np.asarray(sol_ipm.z), atol=5e-5
    )


def test_admm_pallas_resolve_matches_xla(monkeypatch):
    """cfg.use_pallas routes the per-iteration retained-factor resolve
    through the custom_vmap stage-solve kernels (interpret mode on CPU);
    iterates must match the XLA resolve to fp round-off."""
    import dataclasses

    import pytest
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)

    from hpmpc_tpu.parallel import batch as pbatch

    dims, qp = mass_spring_qp(8, 3, 4, dtype=jnp.float32)
    B = 1024
    qpb = pbatch.broadcast_qp(qp, B)
    rng = np.random.default_rng(5)
    qpb = __import__("dataclasses").replace(
        qpb,
        b=qpb.b * jnp.asarray(
            1 + 0.02 * rng.standard_normal(B), jnp.float32)[:, None, None],
    )
    cfg_x = admm.ADMMConfig(k_max=30, tol_p=1e-5, tol_d=1e-5)
    cfg_p = __import__("dataclasses").replace(cfg_x, use_pallas=True)
    sol_x = jax.jit(
        lambda q: pbatch.solve_batched_admm(dims, q, cfg_x))(qpb)
    sol_p = jax.jit(
        lambda q: pbatch.solve_batched_admm(dims, q, cfg_p))(qpb)
    np.testing.assert_array_equal(np.asarray(sol_p.kk), np.asarray(sol_x.kk))
    np.testing.assert_allclose(
        np.asarray(sol_p.z), np.asarray(sol_x.z), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(sol_p.v), np.asarray(sol_x.v), atol=2e-5
    )
