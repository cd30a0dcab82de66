"""Scenario-tree Riccati + tree IPM tests.

Validation strategy (mirrors the reference's own cross-checks,
test_d_tree_ric_libstr.c / test_d_tree_ip_hard_libstr.c):
  * unconstrained tree Riccati vs a dense KKT oracle over the tree QP;
  * a degenerate tree (md=1, i.e. a chain) must reproduce the chain IPM
    exactly;
  * a branching tree IPM must converge with small KKT residuals.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpmpc_tpu.models import ipm, tree
from hpmpc_tpu.ocp import OCPDims, OCPQP
from hpmpc_tpu.utils.mass_spring import mass_spring_ab, mass_spring_qp


def _tree_qp(tdef: tree.TreeDef, nx=4, nu=2, nb=0, seed=0, dtype=np.float64):
    """Mass-spring dynamics on every edge with per-branch disturbance in b
    (the scenario axis); costs Q=I, R=2I; optional input boxes."""
    rng = np.random.default_rng(seed)
    A, B = mass_spring_ab(nx, nu)
    n = tdef.n_nodes
    dad = tdef.dad
    is_leaf = [True] * n
    for k in range(1, n):
        is_leaf[dad[k]] = False

    nx_v = [0] + [nx] * (n - 1)
    nu_v = [0 if is_leaf[k] else nu for k in range(n)]
    nb_v = [min(nb, nu_v[k]) for k in range(n)]
    ng_v = [0] * n
    idxb = [np.arange(nb_v[k], dtype=np.int32) for k in range(n)]
    dims = OCPDims.create(n - 1, nx_v, nu_v, nb_v, ng_v, idxb=idxb)
    NU, NX, NZ, NB, NG = dims.NU, dims.NX, dims.NZ, dims.NB, dims.NG

    F = np.zeros((n - 1, NZ, NX))
    b = np.zeros((n - 1, NX))
    for k in range(1, n):
        p = dad[k]
        F[k - 1, : nu_v[p], :nx] = B.T[: nu_v[p]]
        F[k - 1, NU : NU + nx_v[p], :nx] = A.T[: nx_v[p]]
        # per-branch disturbance: distinguishes sibling scenarios
        b[k - 1, :nx] = 0.05 * rng.standard_normal(nx)
        if p == 0:
            b[k - 1, :nx] += np.concatenate([[1.5, 1.0], np.zeros(nx - 2)])

    H = np.zeros((n, NZ, NZ))
    g = np.zeros((n, NZ))
    for k in range(n):
        H[k, : nu_v[k], : nu_v[k]] = 2.0 * np.eye(nu_v[k])
        H[k, NU : NU + nx_v[k], NU : NU + nx_v[k]] = np.eye(nx_v[k])
        g[k, : nu_v[k]] = 0.2
        g[k, NU : NU + nx_v[k]] = 0.1

    idxb_p = np.zeros((n, NB), dtype=np.int32)
    d_lb = np.zeros((n, NB))
    d_ub = np.zeros((n, NB))
    for k in range(n):
        for j in range(nb_v[k]):
            idxb_p[k, j] = j
            d_lb[k, j] = -0.5
            d_ub[k, j] = 0.5

    as_j = lambda x: jnp.asarray(x, dtype)
    qp = OCPQP(
        F=as_j(F),
        b=as_j(b),
        H=as_j(H),
        g=as_j(g),
        idxb=jnp.asarray(idxb_p),
        d_lb=as_j(d_lb),
        d_ub=as_j(d_ub),
        C=as_j(np.zeros((n, NG, NZ))),
        d_lg=as_j(np.zeros((n, NG))),
        d_ug=as_j(np.zeros((n, NG))),
        z_mask=as_j(dims.z_mask()),
        x_mask=as_j(dims.x_mask()),
        nb_mask=as_j(dims.nb_mask()),
        ng_mask=as_j(dims.ng_mask()),
    )
    return dims, qp


def _tree_dense_oracle(tdef, dims, qp):
    """Solve the tree equality-constrained QP densely."""
    n = tdef.n_nodes
    NU, NX = dims.NU, dims.NX
    H = np.asarray(qp.H)
    g = np.asarray(qp.g)
    F = np.asarray(qp.F)
    b = np.asarray(qp.b)
    nz_r, offs = [], []
    off = 0
    for k in range(n):
        offs.append(off)
        nz_r.append(dims.nu[k] + dims.nx[k])
        off += nz_r[-1]
    nv = off
    ne = sum(dims.nx[k] for k in range(1, n))
    eoffs, eo = [], 0
    for k in range(1, n):
        eoffs.append(eo)
        eo += dims.nx[k]

    def ri(k):
        return np.array(
            list(range(dims.nu[k])) + [NU + i for i in range(dims.nx[k])], dtype=int
        )

    K = np.zeros((nv + ne, nv + ne))
    rhs = np.zeros(nv + ne)
    for k in range(n):
        r = ri(k)
        K[offs[k] : offs[k] + nz_r[k], offs[k] : offs[k] + nz_r[k]] = H[k][
            np.ix_(r, r)
        ]
        rhs[offs[k] : offs[k] + nz_r[k]] = -g[k][r]
    for k in range(1, n):
        p = tdef.dad[k]
        e = eoffs[k - 1]
        nxk = dims.nx[k]
        rp = ri(p)
        Fk = F[k - 1][np.ix_(rp, np.arange(nxk))]
        rows = slice(nv + e, nv + e + nxk)
        K[rows, offs[p] : offs[p] + nz_r[p]] = -Fk.T
        K[rows, offs[k] + dims.nu[k] : offs[k] + nz_r[k]] = np.eye(nxk)
        rhs[nv + e : nv + e + nxk] = b[k - 1][:nxk]
        K[offs[p] : offs[p] + nz_r[p], rows] = Fk
        K[offs[k] + dims.nu[k] : offs[k] + nz_r[k], rows] = -np.eye(nxk)
    sol = np.linalg.solve(K, rhs)
    z = np.zeros((n, dims.NZ))
    for k in range(n):
        z[k][ri(k)] = sol[offs[k] : offs[k] + nz_r[k]]
    pi = np.zeros((n - 1, NX))
    for k in range(1, n):
        pi[k - 1, : dims.nx[k]] = sol[nv + eoffs[k - 1] : nv + eoffs[k - 1] + dims.nx[k]]
    return z, pi


@pytest.mark.parametrize("md,Nr,Nh", [(2, 1, 3), (2, 2, 4), (3, 1, 3)])
def test_tree_riccati_matches_dense_kkt(md, Nr, Nh):
    tdef = tree.TreeDef.from_md_nr_nh(md, Nr, Nh)
    dims, qp = _tree_qp(tdef)
    H_eff = qp.H + jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(qp.pad_diag)
    z, pi, fac = jax.jit(
        lambda H, g, b: tree.tree_factor_solve(tdef, qp, H, g, b, dims.NU)
    )(H_eff, qp.g * qp.z_mask, qp.b)
    z_ref, pi_ref = _tree_dense_oracle(tdef, dims, qp)
    np.testing.assert_allclose(np.asarray(z), z_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(pi), pi_ref, atol=1e-10)


def test_tree_ipm_chain_degenerate_matches_chain_solver():
    """A tree with md=1 is a chain: the tree IPM must match ipm.solve
    iteration for iteration (same stat trace, same solution)."""
    N = 8
    tdef = tree.TreeDef.from_md_nr_nh(1, 1, N)
    dims, qp = mass_spring_qp(8, 3, N)
    cfg = ipm.IPMConfig(k_max=30, mu_tol=1e-8)
    sol_chain = jax.jit(lambda q: ipm.solve(dims, q, cfg))(qp)
    sol_tree = jax.jit(lambda q: tree.solve_tree_ipm(tdef, dims, q, cfg))(qp)
    assert int(sol_tree.kk) == int(sol_chain.kk)
    np.testing.assert_allclose(
        np.asarray(sol_tree.stat), np.asarray(sol_chain.stat), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(sol_tree.z), np.asarray(sol_chain.z), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(sol_tree.pi), np.asarray(sol_chain.pi), atol=1e-10
    )


@pytest.mark.parametrize("md,Nr,Nh", [(2, 2, 5), (3, 1, 4)])
def test_tree_ipm_branching_converges_with_small_residuals(md, Nr, Nh):
    tdef = tree.TreeDef.from_md_nr_nh(md, Nr, Nh)
    dims, qp = _tree_qp(tdef, nb=2)
    cfg = ipm.IPMConfig(k_max=30, mu_tol=1e-9)
    sol = jax.jit(lambda q: tree.solve_tree_ipm(tdef, dims, q, cfg))(qp)
    assert int(sol.status) == 0
    r = np.asarray(sol.inf_norm_res)
    assert r[0] < 1e-6 and r[1] < 1e-8 and r[2] < 1e-8 and r[3] <= 1e-9
    # constrained inputs actually hit the box on the stressed branch
    z = np.asarray(sol.z)
    assert np.max(np.abs(z[:, :2])) <= 0.5 + 1e-9


def test_tree_node_count_formula():
    # (Nh-Nr) md^Nr + (md^{Nr+1}-1)/(md-1), test_d_tree_ric_libstr.c:61-66
    for md, Nr, Nh in [(2, 2, 5), (3, 2, 4), (2, 3, 6)]:
        tdef = tree.TreeDef.from_md_nr_nh(md, Nr, Nh)
        want = (Nh - Nr) * md**Nr + (md ** (Nr + 1) - 1) // (md - 1)
        assert tdef.n_nodes == want
