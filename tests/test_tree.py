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


def _tree_qp(tdef: tree.TreeDef, nx=4, nu=2, nb=0, ng_leaf=0, g_bound=2.0,
             seed=0, dtype=np.float64):
    """Mass-spring dynamics on every edge with per-branch disturbance in b
    (the scenario axis); costs Q=I, R=2I; optional input boxes and leaf
    general state constraints (``ng_leaf`` rows |x_i| <= g_bound)."""
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
    ng_v = [ng_leaf if is_leaf[k] else 0 for k in range(n)]
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

    C = np.zeros((n, NG, NZ))
    d_lg = np.zeros((n, NG))
    d_ug = np.zeros((n, NG))
    for k in range(n):
        for j in range(ng_v[k]):
            C[k, j, NU + j] = 1.0
            d_lg[k, j] = -g_bound
            d_ug[k, j] = g_bound

    as_j = lambda x: jnp.asarray(x, dtype)
    qp = OCPQP(
        F=as_j(F),
        b=as_j(b),
        H=as_j(H),
        g=as_j(g),
        idxb=jnp.asarray(idxb_p),
        d_lb=as_j(d_lb),
        d_ub=as_j(d_ub),
        C=as_j(C),
        d_lg=as_j(d_lg),
        d_ug=as_j(d_ug),
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


# ---------------------------------------------------------------------------
# The reference's own correctness gate for tree MPC: the tree IPM must match
# the STANDARD chain solver run on the stage-stacked block formulation of
# the same scenario tree (test_d_tree_ip_hard_libstr.c:895-1336 — nodes of
# each stage are concatenated into one chain stage with block-diagonal
# cost/constraints and a block dynamics map parent-blocks -> kid-blocks).
# ---------------------------------------------------------------------------


def _stacked_chain_data(tdef, dims, qp):
    """Assemble the per-stage fortran-order block data of the stacked chain
    QP from the tree node/edge arrays (the reference's nx2/nu2 assembly)."""
    n = tdef.n_nodes
    NU = dims.NU
    levels = tdef.levels
    Nh = len(levels) - 1
    H = np.asarray(qp.H); g = np.asarray(qp.g)
    F = np.asarray(qp.F); b = np.asarray(qp.b)
    Cn = np.asarray(qp.C)
    d_lg = np.asarray(qp.d_lg); d_ug = np.asarray(qp.d_ug)
    d_lb = np.asarray(qp.d_lb); d_ub = np.asarray(qp.d_ub)
    idxb_p = np.asarray(qp.idxb)

    # per-node offsets inside its stage block
    off_u, off_x = {}, {}
    nu2 = [0] * (Nh + 1); nx2 = [0] * (Nh + 1)
    for s, lev in enumerate(levels):
        for k in lev:
            off_u[k] = nu2[s]; off_x[k] = nx2[s]
            nu2[s] += dims.nu[k]; nx2[s] += dims.nx[k]

    A_l, B_l, b_l = [], [], []
    for s in range(Nh):
        A2 = np.zeros((nx2[s + 1], nx2[s]))
        B2 = np.zeros((nx2[s + 1], nu2[s]))
        b2 = np.zeros(nx2[s + 1])
        for c in levels[s + 1]:
            p = tdef.dad[c]
            nxc = dims.nx[c]
            r = slice(off_x[c], off_x[c] + nxc)
            # F[e] holds [B.T; A.T] of the edge into node c
            B2[r, off_u[p]:off_u[p] + dims.nu[p]] = F[c - 1, :dims.nu[p], :nxc].T
            A2[r, off_x[p]:off_x[p] + dims.nx[p]] = (
                F[c - 1, NU:NU + dims.nx[p], :nxc].T
            )
            b2[r] = b[c - 1, :nxc]
        A_l.append(A2); B_l.append(B2); b_l.append(b2)

    Q_l, S_l, R_l, q_l, r_l = [], [], [], [], []
    idxb2, lb2, ub2, C_l, D_l, lg_l, ug_l = [], [], [], [], [], [], []
    for s, lev in enumerate(levels):
        Q2 = np.zeros((nx2[s], nx2[s])); q2 = np.zeros(nx2[s])
        R2 = np.zeros((nu2[s], nu2[s])); r2 = np.zeros(nu2[s])
        S2 = np.zeros((nu2[s], nx2[s]))
        ib, lb_s, ub_s = [], [], []
        ng_s = sum(dims.ng[k] for k in lev)
        C2 = np.zeros((ng_s, nx2[s])); D2 = np.zeros((ng_s, nu2[s]))
        lg2 = np.zeros(ng_s); ug2 = np.zeros(ng_s)
        go = 0
        for k in lev:
            ru = slice(off_u[k], off_u[k] + dims.nu[k])
            rx = slice(off_x[k], off_x[k] + dims.nx[k])
            R2[ru, ru] = H[k, :dims.nu[k], :dims.nu[k]]
            Q2[rx, rx] = H[k, NU:NU + dims.nx[k], NU:NU + dims.nx[k]]
            r2[ru] = g[k, :dims.nu[k]]
            q2[rx] = g[k, NU:NU + dims.nx[k]]
            for j in range(dims.nb[k]):
                jj = int(idxb_p[k, j])
                if jj < dims.nu[k]:  # input box
                    ib.append(off_u[k] + jj)
                else:  # state box: logical index nu2[s] + state offset
                    ib.append(nu2[s] + off_x[k] + (jj - NU))
                lb_s.append(d_lb[k, j]); ub_s.append(d_ub[k, j])
            for j in range(dims.ng[k]):
                C2[go, rx] = Cn[k, j, NU:NU + dims.nx[k]]
                D2[go, ru] = Cn[k, j, :dims.nu[k]]
                lg2[go] = d_lg[k, j]; ug2[go] = d_ug[k, j]
                go += 1
        Q_l.append(Q2); q_l.append(q2)
        R_l.append(R2); r_l.append(r2); S_l.append(S2)
        order = np.argsort(ib, kind="stable") if ib else np.array([], dtype=int)
        idxb2.append(np.asarray(ib, dtype=np.int32)[order])
        lb2.append(np.asarray(lb_s)[order]); ub2.append(np.asarray(ub_s)[order])
        C_l.append(C2); D_l.append(D2); lg_l.append(lg2); ug_l.append(ug2)
    return (A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
            idxb2, lb2, ub2, C_l, D_l, lg_l, ug_l, off_u, off_x)


@pytest.mark.parametrize("md,Nr", [(2, 1), (2, 2)])
def test_tree_ipm_matches_enumerated_scenarios(md, Nr):
    """Tree IPM == standard chain IPM on the stage-stacked scenario QP,
    with input boxes AND leaf general state constraints active — the
    reference's own gate (test_d_tree_ip_hard_libstr.c:895,1336)."""
    from hpmpc_tpu import api

    Nh = Nr + 3
    tdef = tree.TreeDef.from_md_nr_nh(md, Nr, Nh)
    dims, qp = _tree_qp(tdef, nb=2, ng_leaf=1, g_bound=0.15)

    cfg = ipm.IPMConfig(k_max=40, mu_tol=1e-11)
    sol_t = jax.jit(lambda q: tree.solve_tree_ipm(tdef, dims, q, cfg))(qp)
    assert int(sol_t.status) == 0

    (A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
     idxb2, lb2, ub2, C_l, D_l, lg_l, ug_l, off_u, off_x) = (
        _stacked_chain_data(tdef, dims, qp)
    )
    res = api.solve_ocp(
        len(A_l), A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
        idxb=idxb2, lb=lb2, ub=ub2, C=C_l, D=D_l, lg=lg_l, ug=ug_l,
        k_max=40, mu_tol=1e-11,
    )
    assert res.status == 0

    # both constraint families must actually be active somewhere
    z_t = np.asarray(sol_t.z)
    assert np.max(np.abs(z_t[:, :2])) >= 0.5 - 1e-7, "input box never active"
    leaf_x0 = np.abs(
        np.asarray([z_t[k, dims.NU] for k in tdef.levels[-1]])
    )
    assert np.max(leaf_x0) >= 0.15 - 1e-7, "leaf general constraint never active"

    # node-by-node equality: tree solution == its block inside the chain
    for s, lev in enumerate(tdef.levels):
        for k in lev:
            np.testing.assert_allclose(
                z_t[k, :dims.nu[k]],
                res.u[s][off_u[k]:off_u[k] + dims.nu[k]],
                atol=1e-7, err_msg=f"u mismatch node {k}",
            )
            np.testing.assert_allclose(
                z_t[k, dims.NU:dims.NU + dims.nx[k]],
                res.x[s][off_x[k]:off_x[k] + dims.nx[k]],
                atol=1e-7, err_msg=f"x mismatch node {k}",
            )
    # edge multipliers: pi of edge into node k == its slice of chain pi
    pi_t = np.asarray(sol_t.pi)
    for s in range(len(tdef.levels) - 1):
        for c in tdef.levels[s + 1]:
            np.testing.assert_allclose(
                pi_t[c - 1, :dims.nx[c]],
                res.pi[s][off_x[c]:off_x[c] + dims.nx[c]],
                atol=1e-6, err_msg=f"pi mismatch edge into node {c}",
            )


def test_single_tree_node_axis_sharding():
    """SURVEY §2.10 tree axis: ONE large tree sharded across the 8-device
    mesh by its node axis must reproduce the unsharded solve exactly (the
    level-batched node work partitions; parent combines become
    collectives)."""
    import jax
    from jax.sharding import Mesh

    tdef = tree.TreeDef.from_md_nr_nh(2, 3, 6)  # 8 scenarios, 39 nodes
    assert tdef.n_nodes == 39
    dims, qp = _tree_qp(tdef, nb=2)
    cfg = ipm.IPMConfig(k_max=25, mu_tol=1e-9)

    sol_ref = jax.jit(
        lambda q: tree.solve_tree_ipm(tdef, dims, q, cfg)
    )(qp)
    assert int(sol_ref.status) == 0

    mesh = Mesh(np.array(jax.devices()), ("node",))
    sol_sh = tree.solve_tree_ipm_sharded(tdef, dims, qp, cfg, mesh)
    assert int(sol_sh.status) == 0
    assert int(sol_sh.kk) == int(sol_ref.kk)
    np.testing.assert_allclose(
        np.asarray(sol_sh.z), np.asarray(sol_ref.z), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(sol_sh.pi), np.asarray(sol_ref.pi), atol=1e-10
    )
