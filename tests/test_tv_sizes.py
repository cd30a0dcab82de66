"""Time-variant per-stage sizes (the reference's `_tv` capability and its
test_matrices_variable_nx fixtures): nx/nu/nb genuinely varying across the
horizon, validated against a dense KKT oracle and through the IPM."""

import jax
import jax.numpy as jnp
import numpy as np

from hpmpc_tpu.models import ipm, riccati
from hpmpc_tpu.ocp import OCPDims, pack_ocp
import sys
sys.path.insert(0, __file__.rsplit("/", 1)[0])
from test_riccati import unconstrained_dense_kkt


def _tv_problem(seed=0):
    """nx: 0,3,5,4,5,2 ; nu: 2,3,1,2,0,0 — fully ragged chain."""
    rng = np.random.default_rng(seed)
    nx_v = (0, 3, 5, 4, 5, 2)
    nu_v = (2, 3, 1, 2, 1, 0)
    N = 5
    nb_v = tuple(min(nu_v[n], 2) for n in range(N + 1))
    idxb = [np.arange(nb_v[n], dtype=np.int32) for n in range(N + 1)]
    dims = OCPDims.create(N, nx_v, nu_v, nb_v, 0, idxb=idxb)

    A_l, B_l, b_l = [], [], []
    for n in range(N):
        A_l.append(0.3 * rng.standard_normal((nx_v[n + 1], nx_v[n])))
        B_l.append(rng.standard_normal((nx_v[n + 1], nu_v[n])))
        b_l.append(0.2 * rng.standard_normal(nx_v[n + 1]))
    Q_l, S_l, R_l, q_l, r_l = [], [], [], [], []
    for n in range(N + 1):
        M = rng.standard_normal((nx_v[n], nx_v[n]))
        Q_l.append(M @ M.T + (nx_v[n] + 1) * np.eye(nx_v[n]))
        Mr = rng.standard_normal((nu_v[n], nu_v[n]))
        R_l.append(Mr @ Mr.T + (nu_v[n] + 1) * np.eye(nu_v[n]))
        S_l.append(0.1 * rng.standard_normal((nu_v[n], nx_v[n])))
        q_l.append(0.1 * rng.standard_normal(nx_v[n]))
        r_l.append(0.1 * rng.standard_normal(nu_v[n]))
    lb = [-0.7 * np.ones(nb_v[n]) for n in range(N + 1)]
    ub = [0.7 * np.ones(nb_v[n]) for n in range(N + 1)]
    qp = pack_ocp(dims, A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
                  idxb=idxb, lb=lb, ub=ub)
    return dims, qp


def test_tv_riccati_matches_dense_kkt():
    dims, qp = _tv_problem()
    H_eff = qp.H + jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(qp.pad_diag)
    sol, *_ = jax.jit(
        lambda H, g, F, b: riccati.factor_solve(H, g, F, b, dims.NU)
    )(H_eff, qp.g * qp.z_mask, qp.F, qp.b)
    z_ref, pi_ref = unconstrained_dense_kkt(dims, qp)
    np.testing.assert_allclose(np.asarray(sol.z) * np.asarray(qp.z_mask), z_ref, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(sol.pi) * np.asarray(qp.x_mask[1:]), pi_ref, atol=1e-10
    )


def test_tv_ipm_converges_and_respects_bounds():
    dims, qp = _tv_problem()
    cfg = ipm.IPMConfig(k_max=30, mu_tol=1e-9)
    sol = jax.jit(lambda q: ipm.solve(dims, q, cfg))(qp)
    assert int(sol.status) == 0
    r = np.asarray(sol.inf_norm_res)
    assert r[0] < 1e-7 and r[1] < 1e-9 and r[2] < 1e-9
    z = np.asarray(sol.z)
    for n in range(dims.N + 1):
        for j in range(dims.nb[n]):
            assert -0.7 - 1e-9 <= z[n, j] <= 0.7 + 1e-9
