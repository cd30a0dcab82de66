"""High-level API tests: the fortran-order front door must reproduce the
golden reference solution end to end (pack -> solve -> unpack), the N2
partial-condensing path must agree, and the native C++ packing layer must
match the numpy packer bit for bit."""

import numpy as np
import pytest

from conftest import golden_ab, load_golden
from hpmpc_tpu import api
from hpmpc_tpu.utils.mass_spring import mass_spring_qp


def _mass_spring_raw(nx, nu, N, ngN=0, A=None, B=None):
    """Raw fortran-order stage data for the canonical benchmark problem."""
    from hpmpc_tpu.utils.mass_spring import mass_spring_ab

    if A is None:
        A, B = mass_spring_ab(nx, nu)
    b = 0.1 * np.ones(nx)
    x0 = np.zeros(nx)
    x0[0] = 2.5
    x0[1] = 2.5
    nb = nu + nx // 2
    A_l = [A] * N
    B_l = [B] * N
    b_l = [b] * N
    Q_l = [np.eye(nx)] * (N + 1)
    S_l = [np.zeros((nu, nx))] * N + [np.zeros((0, nx))]
    R_l = [2.0 * np.eye(nu)] * N + [np.zeros((0, 0))]
    q_l = [0.1 * np.ones(nx)] * (N + 1)
    r_l = [0.2 * np.ones(nu)] * N + [np.zeros(0)]
    idxb, lb, ub = [], [], []
    for n in range(N + 1):
        if n == 0:
            idx = list(range(nu)) + list(range(nu, nu + nx // 2))
        elif n < N:
            idx = list(range(nu + nx // 2))
        else:
            idx = list(range(nx // 2))  # terminal: state bounds (nu[N]=0)
        lo = [-0.5 if j < nu and n < N else -4.0 for j in idx]
        hi = [0.5 if j < nu and n < N else 4.0 for j in idx]
        idxb.append(np.array(idx, dtype=np.int32))
        lb.append(np.array(lo))
        ub.append(np.array(hi))
    C_l = D_l = lg_l = ug_l = None
    if ngN:
        C_l, D_l, lg_l, ug_l = [], [], [], []
        for n in range(N + 1):
            g_n = ngN if n == N else 0
            Cn = np.zeros((g_n, nx))
            for j in range(g_n):
                Cn[j, j] = 1.0
            C_l.append(Cn)
            D_l.append(np.zeros((g_n, nu if n < N else 0)))
            lg_l.append(np.zeros(g_n))
            ug_l.append(np.zeros(g_n))
    return A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l, idxb, lb, ub, C_l, D_l, lg_l, ug_l, x0


def test_solve_ocp_matches_golden():
    g = load_golden("ipm_ms_nx8_nu3_N30_ngN8")
    cfg = g["config"]
    A, B = golden_ab(g)
    (A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
     idxb, lb, ub, C_l, D_l, lg_l, ug_l, x0) = _mass_spring_raw(
        cfg["nx"], cfg["nu"], cfg["N"], ngN=cfg["ngN"], A=A, B=B
    )
    res = api.solve_ocp(
        cfg["N"], A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
        idxb=idxb, lb=lb, ub=ub, C=C_l, D=D_l, lg=lg_l, ug=ug_l, x0=x0,
        k_max=cfg["k_max"], mu0=cfg["mu0"], mu_tol=cfg["mu_tol"],
        alpha_min=cfg["alpha_min"],
    )
    assert res.status == 0
    assert res.kk == g["kk"]
    for n in range(cfg["N"] + 1):
        ref = np.array(g["ux"][n])
        nun = cfg["nu"] if n < cfg["N"] else 0
        got = np.concatenate([res.u[n], res.x[n]])
        np.testing.assert_allclose(got, ref, atol=1e-8, err_msg=f"stage {n}")
    assert res.inf_norm_res[3] <= cfg["mu_tol"]
    stat_ref = np.array(g["stat"]).reshape(-1, 5)[: g["kk"]]
    np.testing.assert_allclose(res.stat, stat_ref, rtol=1e-6, atol=1e-9)


def test_solve_ocp_partial_condensing_path():
    (A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
     idxb, lb, ub, *_rest, x0) = _mass_spring_raw(8, 3, 12)
    full = api.solve_ocp(
        12, A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
        idxb=idxb, lb=lb, ub=ub, x0=x0, mu_tol=1e-10,
    )
    part = api.solve_ocp(
        12, A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
        idxb=idxb, lb=lb, ub=ub, x0=x0, mu_tol=1e-10, N2=3,
    )
    for n in range(13):
        np.testing.assert_allclose(part.x[n], full.x[n], atol=1e-6)
        np.testing.assert_allclose(part.u[n], full.u[n], atol=1e-6)


@pytest.mark.skipif(not api.native_available(), reason="native lib not built")
def test_native_packing_matches_numpy():
    dims, qp = mass_spring_qp(8, 3, 10)
    from hpmpc_tpu.utils.mass_spring import mass_spring_ab

    A, B = mass_spring_ab(8, 3)
    b = 0.1 * np.ones(8)
    x0 = np.zeros(8)
    x0[0] = 2.5
    x0[1] = 2.5
    b0 = b + A @ x0
    A_l = [np.zeros((8, 0))] + [A] * 9
    B_l = [B] * 10
    b_l = [b0] + [b] * 9
    F_nat, b_nat = api.pack_dynamics_native(dims, A_l, B_l, b_l)
    np.testing.assert_array_equal(F_nat, np.asarray(qp.F))
    np.testing.assert_array_equal(b_nat, np.asarray(qp.b))


def test_work_space_size_query():
    n_bytes = api.work_space_size_bytes(30, 8, 3, nb=7, ng=0, k_max=30)
    assert n_bytes > 0
    # matches the numpy fallback formula exactly
    if api.native_available():
        import hpmpc_tpu.api as m

        saved = m._native
        try:
            m._native = None
            assert api.work_space_size_bytes(30, 8, 3, nb=7, ng=0, k_max=30) == n_bytes
        finally:
            m._native = saved


def test_c_order_api_matches_fortran_order():
    """Row-major twin: transposed matrix inputs must give the same solution
    (c_order_interface.c vs fortran_order_interface.c)."""
    import numpy as np

    from hpmpc_tpu import api
    from hpmpc_tpu.utils.mass_spring import mass_spring_ab

    nx, nu, N = 6, 2, 8
    A, B = mass_spring_ab(nx, nu, 0.5)
    rng = np.random.default_rng(3)
    S = 0.1 * rng.standard_normal((nu, nx))
    args = dict(
        b=[0.1 * np.ones(nx)] * N,
        q=[0.1 * np.ones(nx)] * (N + 1),
        r=[0.2 * np.ones(nu)] * (N + 1),
        idxb=[np.arange(nu + nx // 2)] * (N + 1),
        lb=[np.concatenate([-0.5 * np.ones(nu), -4.0 * np.ones(nx // 2)])] * (N + 1),
        ub=[np.concatenate([0.5 * np.ones(nu), 4.0 * np.ones(nx // 2)])] * (N + 1),
        x0=np.r_[2.5, 2.5, np.zeros(nx - 2)],
    )
    rf = api.solve_ocp(
        N, [A] * N, [B] * N, args["b"],
        [np.eye(nx)] * (N + 1), [S] * (N + 1), [2 * np.eye(nu)] * (N + 1),
        args["q"], args["r"],
        idxb=args["idxb"], lb=args["lb"], ub=args["ub"], x0=args["x0"],
    )
    rc = api.solve_ocp_c_order(
        N, [A.T] * N, [B.T] * N, args["b"],
        [np.eye(nx)] * (N + 1), [S.T] * (N + 1), [2 * np.eye(nu)] * (N + 1),
        args["q"], args["r"],
        idxb=args["idxb"], lb=args["lb"], ub=args["ub"], x0=args["x0"],
    )
    assert rc.kk == rf.kk and rc.status == rf.status == 0
    for n in range(N + 1):
        np.testing.assert_allclose(rc.x[n], rf.x[n], atol=1e-12)
        np.testing.assert_allclose(rc.u[n], rf.u[n], atol=1e-12)


def test_printing_utils(capsys):
    """Debug printers produce the logical (padding-stripped) problem view."""
    import numpy as np

    from hpmpc_tpu.models import ipm
    from hpmpc_tpu.utils import printing
    from hpmpc_tpu.utils.mass_spring import mass_spring_qp

    dims, qp = mass_spring_qp(4, 1, 3)
    printing.print_ocp_qp(dims, qp)
    out = capsys.readouterr().out
    assert "stage 0" in out and "H=[R S'; S Q]" in out and "idxb" in out
    # stage 0 has nx=0 (eliminated x0): F block printed is (nu x nx1) = 1x4
    assert "F=[B';A'] (1x4)" in out

    import jax

    sol = jax.jit(lambda q: ipm.solve(dims, q, ipm.IPMConfig(k_max=20)))(qp)
    printing.print_solution(dims, sol)
    out = capsys.readouterr().out
    assert "u[0]" in out and "pi[2]" in out and "status: 0" in out


def test_work_space_size_with_partial_condensing():
    """The N2 argument sizes the condensed problem (the reference query's
    N2 semantics, include/c_interface.h:40): fewer stages but fatter
    blocks; must be positive and differ from the full-horizon figure."""
    from hpmpc_tpu import api

    full = api.work_space_size_bytes(30, 8, 3, nb=7)
    cnd = api.work_space_size_bytes(30, 8, 3, nb=7, N2=5)
    assert full > 0 and cnd > 0 and cnd != full
    # N2 = N is the identity transform
    assert api.work_space_size_bytes(30, 8, 3, nb=7, N2=30) == full
