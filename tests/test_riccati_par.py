"""Parallel-in-time (associative-scan) Riccati: must reproduce the
sequential recursion to solver precision, including the golden fixtures."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import golden_ab, load_golden
from hpmpc_tpu.models import riccati, riccati_par
from hpmpc_tpu.utils.mass_spring import mass_spring_qp


@functools.partial(jax.jit, static_argnums=(0,))
def _both(NU, H_eff, g, F, b):
    seq = riccati.factor_solve(H_eff, g, F, b, NU)
    par = riccati_par.factor_solve(H_eff, g, F, b, NU)
    return seq, par


@pytest.mark.parametrize("nx,nu,N", [(8, 3, 10), (16, 1, 30), (4, 2, 64)])
def test_parallel_matches_sequential(nx, nu, N):
    dims, qp = mass_spring_qp(nx, nu, N)
    H_eff = qp.H + jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(qp.pad_diag)
    seq, par = _both(dims.NU, H_eff, qp.g * qp.z_mask, qp.F, qp.b)
    (ss, Ls, *_), (sp, Lp, *_) = seq, par
    np.testing.assert_allclose(np.asarray(sp.z), np.asarray(ss.z), atol=1e-8)
    np.testing.assert_allclose(np.asarray(sp.pi), np.asarray(ss.pi), atol=1e-7)
    np.testing.assert_allclose(np.asarray(Lp), np.asarray(Ls), atol=1e-8)


def test_parallel_matches_golden():
    g = load_golden("ric_ms_nx16_nu1_N30")
    cfg = g["config"]
    A, B = golden_ab(g)
    dims, qp = mass_spring_qp(cfg["nx"], cfg["nu"], cfg["N"], A=A, B=B)
    H_eff = qp.H + jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(qp.pad_diag)
    sol, *_ = jax.jit(
        lambda H, gg, F, b: riccati_par.factor_solve(H, gg, F, b, dims.NU)
    )(H_eff, qp.g * qp.z_mask, qp.F, qp.b)
    for n in range(dims.N + 1):
        ref = np.array(g["ux"][n])
        nun, nxn = dims.nu[n], dims.nx[n]
        got = np.concatenate(
            [np.asarray(sol.z[n])[:nun], np.asarray(sol.z[n])[dims.NU : dims.NU + nxn]]
        )
        np.testing.assert_allclose(got, ref, atol=1e-8, err_msg=f"stage {n}")


def test_ipm_with_parallel_backend_matches_default():
    """Full IPM with the O(log N)-depth backend (ipm.chain_backend_par) must
    reproduce the default sequential-Riccati solve on the golden config."""
    from hpmpc_tpu.models import ipm

    g = load_golden("ipm_ms_nx8_nu3_N10")
    cfg_g = g["config"]
    A, B = golden_ab(g)
    dims, qp = mass_spring_qp(
        cfg_g["nx"], cfg_g["nu"], cfg_g["N"],
        ng=cfg_g["ng"], ngN=cfg_g["ngN"], A=A, B=B,
    )
    cfg = ipm.IPMConfig(
        k_max=cfg_g["k_max"], mu0=cfg_g["mu0"],
        mu_tol=cfg_g["mu_tol"], alpha_min=cfg_g["alpha_min"],
    )
    mu_scal = 1.0 / dims.n_constr
    oh = ipm._box_onehot(qp)
    bk = ipm.chain_backend_par(dims, qp, oh, mu_scal)

    sol_par = jax.jit(lambda q: ipm.solve(dims, q, cfg, backend=bk))(qp)
    sol_seq = jax.jit(lambda q: ipm.solve(dims, q, cfg))(qp)

    assert int(sol_par.status) == 0
    assert abs(int(sol_par.kk) - int(sol_seq.kk)) <= 1
    np.testing.assert_allclose(
        np.asarray(sol_par.z), np.asarray(sol_seq.z), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(sol_par.pi), np.asarray(sol_seq.pi), atol=1e-6
    )
