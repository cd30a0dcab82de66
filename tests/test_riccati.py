"""Riccati recursion tests: golden parity vs the reference C solver
(test oracle in tests/golden) plus a dense-KKT numpy cross-check."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import golden_ab, load_golden
from hpmpc_tpu.models import riccati
from hpmpc_tpu.utils.mass_spring import mass_spring_ab, mass_spring_qp


def unconstrained_dense_kkt(dims, qp):
    """Dense KKT oracle: solve the full equality-constrained QP with numpy."""
    N = dims.N
    NU, NX = dims.NU, dims.NX
    # variable layout: z_0 (real coords), ..., z_N, pi_0..pi_{N-1}
    zoff, nzr = [], []
    off = 0
    for n in range(N + 1):
        zoff.append(off)
        nzr.append(dims.nu[n] + dims.nx[n])
        off += nzr[-1]
    nz_tot = off
    npi = sum(dims.nx[1:])
    K = np.zeros((nz_tot + npi, nz_tot + npi))
    rhs = np.zeros(nz_tot + npi)

    def real_idx(n):
        return list(range(dims.nu[n])) + [NU + i for i in range(dims.nx[n])]

    H = np.asarray(qp.H)
    g = np.asarray(qp.g)
    F = np.asarray(qp.F)
    b = np.asarray(qp.b)
    for n in range(N + 1):
        ri = np.array(real_idx(n), dtype=int)
        K[zoff[n] : zoff[n] + nzr[n], zoff[n] : zoff[n] + nzr[n]] = H[n][
            np.ix_(ri, ri)
        ]
        rhs[zoff[n] : zoff[n] + nzr[n]] = -g[n][ri]
    poff = nz_tot
    for n in range(N):
        ri = np.array(real_idx(n), dtype=int)
        ri1 = np.array(real_idx(n + 1), dtype=int)
        nx1 = dims.nx[n + 1]
        Fn = F[n][np.ix_(ri, np.arange(nx1))]  # (nzr, nx1)
        # dynamics: x_{n+1} - F' z_n = b  -> rows poff..
        K[poff : poff + nx1, zoff[n] : zoff[n] + nzr[n]] = -Fn.T
        # x_{n+1} inside z_{n+1} sits after nu[n+1] real coords
        K[
            poff : poff + nx1,
            zoff[n + 1] + dims.nu[n + 1] : zoff[n + 1] + nzr[n + 1],
        ] = np.eye(nx1)
        rhs[poff : poff + nx1] = b[n][:nx1]
        # gradient coupling: +F pi_n in stage n, -pi_n on x_{n+1}
        K[zoff[n] : zoff[n] + nzr[n], poff : poff + nx1] = Fn
        K[
            zoff[n + 1] + dims.nu[n + 1] : zoff[n + 1] + nzr[n + 1],
            poff : poff + nx1,
        ] = -np.eye(nx1)
        poff += nx1

    sol = np.linalg.solve(K, rhs)
    zs, pis = [], []
    for n in range(N + 1):
        zr = sol[zoff[n] : zoff[n] + nzr[n]]
        zfull = np.zeros(NU + NX)
        ri = np.array(real_idx(n), dtype=int)
        if len(ri):
            zfull[ri] = zr
        zs.append(zfull)
    poff = nz_tot
    for n in range(N):
        nx1 = dims.nx[n + 1]
        # KKT stationarity on x_{n+1}: our pi sign convention matches the
        # reference (rq_x includes -pi_{n-1} and +F pi_n)
        pi_full = np.zeros(NX)
        pi_full[:nx1] = sol[poff : poff + nx1]
        pis.append(pi_full)
        poff += nx1
    return np.stack(zs), np.stack(pis)


import functools
import jax


@functools.partial(jax.jit, static_argnums=(0,))
def _solve_ric_jit(NU, H, pad_diag, g, F, b):
    H_eff = H + jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(pad_diag)
    sol, L, eu, px, Pb = riccati.factor_solve(H_eff, g, F, b, NU)
    return sol, (L, eu, px, Pb, H_eff)


def _solve_ric(dims, qp):
    return _solve_ric_jit(dims.NU, qp.H, qp.pad_diag, qp.g, qp.F, qp.b)


@pytest.mark.parametrize("name", ["ric_ms_nx8_nu3_N10", "ric_ms_nx16_nu1_N30"])
def test_riccati_sv_matches_reference(name):
    g = load_golden(name)
    cfg = g["config"]
    A, B = golden_ab(g)
    dims, qp = mass_spring_qp(cfg["nx"], cfg["nu"], cfg["N"], A=A, B=B)

    sol, _ = _solve_ric(dims, qp)

    for n in range(dims.N + 1):
        ref = np.array(g["ux"][n])
        nun, nxn = dims.nu[n], dims.nx[n]
        got = np.concatenate(
            [np.asarray(sol.z[n])[:nun], np.asarray(sol.z[n])[dims.NU : dims.NU + nxn]]
        )
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-9, err_msg=f"stage {n}")
    for n in range(dims.N):
        ref = np.array(g["pi"][n])
        got = np.asarray(sol.pi[n])[: dims.nx[n + 1]]
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-9, err_msg=f"pi {n}")


def test_riccati_matches_dense_kkt():
    dims, qp = mass_spring_qp(8, 3, 10)
    sol, _ = _solve_ric(dims, qp)
    z_ref, pi_ref = unconstrained_dense_kkt(dims, qp)
    np.testing.assert_allclose(np.asarray(sol.z), z_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sol.pi), pi_ref, atol=1e-10)


def test_trf_trs_equals_sv():
    dims, qp = mass_spring_qp(8, 3, 10)
    sol_sv, (L, eu, px, Pb, H_eff) = _solve_ric(dims, qp)

    @functools.partial(jax.jit, static_argnums=(0,))
    def trf_trs(NU, H_eff, g, F, b):
        L2 = riccati.factor(H_eff, F, NU)
        sol_trs, Pb2 = riccati.solve(L2, g, F, b, NU)
        sol_pb, _ = riccati.solve(L2, g, F, b, NU, Pb=Pb2)
        return L2, sol_trs, sol_pb

    L2, sol_trs, sol_pb = trf_trs(dims.NU, H_eff, qp.g, qp.F, qp.b)
    np.testing.assert_allclose(np.asarray(L2), np.asarray(L), atol=1e-12)
    np.testing.assert_allclose(np.asarray(sol_trs.z), np.asarray(sol_sv.z), atol=1e-11)
    np.testing.assert_allclose(np.asarray(sol_trs.pi), np.asarray(sol_sv.pi), atol=1e-11)
    # re-solve with cached Pb (the reference's compute_Pb=0 path)
    np.testing.assert_allclose(np.asarray(sol_pb.z), np.asarray(sol_sv.z), atol=1e-11)


def test_mass_spring_ab_matches_reference_discretization():
    g = load_golden("ric_ms_nx8_nu3_N10")
    A_ref, B_ref = golden_ab(g)
    A, B = mass_spring_ab(8, 3)
    np.testing.assert_allclose(A, A_ref, atol=1e-13)
    np.testing.assert_allclose(B, B_ref, atol=1e-13)


@pytest.mark.parametrize("nx,nu,N", [(4, 2, 8), (12, 4, 12), (24, 8, 10), (48, 8, 6)])
def test_riccati_size_sweep_vs_dense_oracle(nx, nu, N):
    """Size-sweep protocol (the reference validates its Riccati across a
    size sweep, test_problems/test_d_ric_mpc.c:283): factor_solve must
    match the dense KKT oracle as dimensions grow past the small MPC
    regime (blocked-Cholesky block boundaries, padding edges)."""
    import jax

    dims, qp = mass_spring_qp(nx, nu, N)
    H_eff = qp.H + jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(qp.pad_diag)
    g_eff = qp.g * qp.z_mask
    sol, *_ = jax.jit(
        lambda: riccati.factor_solve(H_eff, g_eff, qp.F, qp.b, dims.NU)
    )()
    z_ref, pi_ref = unconstrained_dense_kkt(dims, qp)
    scale = max(1.0, float(np.max(np.abs(z_ref))))
    np.testing.assert_allclose(
        np.asarray(sol.z), z_ref, atol=1e-7 * scale,
        err_msg=f"z mismatch at nx={nx}",
    )
    np.testing.assert_allclose(
        np.asarray(sol.pi), pi_ref, atol=1e-6 * scale,
        err_msg=f"pi mismatch at nx={nx}",
    )


def test_lu_getrf_getrs():
    """ops.tri.getrf/getrs (the reference's dgetrf/dgetrs kernel-zoo
    members, kernel_dgetrf_*_lib4.c / dgetrf_pivot_lib) solve general
    non-SPD batched systems to machine precision, with partial pivoting
    handling zero leading pivots."""
    import scipy.linalg as sla

    from hpmpc_tpu.ops import tri

    rng = np.random.default_rng(7)
    A = rng.standard_normal((5, 9, 9))
    b = rng.standard_normal((5, 9))
    LU, piv = jax.jit(tri.getrf)(jnp.asarray(A))
    x = jax.jit(tri.getrs)(LU, piv, jnp.asarray(b))
    np.testing.assert_allclose(
        np.einsum("bij,bj->bi", A, np.asarray(x)), b, atol=1e-11
    )
    # factor matches LAPACK including pivot order
    lu_s, piv_s = sla.lu_factor(A[0])
    np.testing.assert_allclose(np.asarray(LU)[0], lu_s, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(piv)[0], piv_s)
    # zero leading pivot forces a swap
    A0 = np.array([[[0.0, 1.0], [2.0, 3.0]]])
    LU0, piv0 = tri.getrf(jnp.asarray(A0))
    x0 = tri.getrs(LU0, piv0, jnp.asarray([[1.0, 0.0]]))
    np.testing.assert_allclose(
        np.einsum("bij,bj->bi", A0, np.asarray(x0)), [[1.0, 0.0]], atol=1e-14
    )
