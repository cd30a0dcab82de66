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
