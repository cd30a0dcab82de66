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


# ---------------------------------------------------------------------------
# round-2 front-door surface: tv-nx packing, compiled-solver cache,
# warm start, and the OCPSession resolve family (c_interface.h:62-76)
# ---------------------------------------------------------------------------


def _tv_nx_problem():
    """Time-varying state sizes nx=[2, 4, 2, 3] (catches the B-row-count
    nx inference shift flagged by the round-1 advisor)."""
    rng = np.random.default_rng(7)
    nx = [2, 4, 2, 3]
    nu = [1, 2, 1]
    N = 3
    A_l = [rng.standard_normal((nx[n + 1], nx[n])) * 0.4 for n in range(N)]
    B_l = [rng.standard_normal((nx[n + 1], nu[n])) for n in range(N)]
    b_l = [0.05 * rng.standard_normal(nx[n + 1]) for n in range(N)]
    Q_l = [np.eye(nx[n]) for n in range(N + 1)]
    S_l = [np.zeros((nu[n], nx[n])) for n in range(N)] + [np.zeros((0, nx[N]))]
    R_l = [2.0 * np.eye(nu[n]) for n in range(N)] + [np.zeros((0, 0))]
    q_l = [0.1 * np.ones(nx[n]) for n in range(N + 1)]
    r_l = [0.2 * np.ones(nu[n]) for n in range(N)] + [np.zeros(0)]
    return N, nx, nu, A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l


def test_solve_ocp_time_varying_nx():
    """tv-nx through the front door; verify vs a dense KKT solve."""
    N, nx, nu, A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l = _tv_nx_problem()
    res = api.solve_ocp(N, A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
                        mu_tol=1e-10)
    for n in range(N + 1):
        assert res.x[n].shape == (nx[n],)
    # dense equality-constrained KKT oracle
    nz = [nu[n] + nx[n] for n in range(N)] + [nx[N]]
    off = np.cumsum([0] + nz)
    nv = off[-1]
    H = np.zeros((nv, nv)); gv = np.zeros(nv)
    for n in range(N):
        o = off[n]
        H[o:o + nu[n], o:o + nu[n]] = R_l[n]
        H[o + nu[n]:o + nz[n], o + nu[n]:o + nz[n]] = Q_l[n]
        gv[o:o + nu[n]] = r_l[n]; gv[o + nu[n]:o + nz[n]] = q_l[n]
    H[off[N]:, off[N]:] = Q_l[N]; gv[off[N]:] = q_l[N]
    ne = sum(nx[1:])
    E = np.zeros((ne, nv)); ev = np.zeros(ne)
    ro = 0
    for n in range(N):
        o = off[n]
        E[ro:ro + nx[n + 1], o:o + nu[n]] = B_l[n]
        E[ro:ro + nx[n + 1], o + nu[n]:o + nz[n]] = A_l[n]
        E[ro:ro + nx[n + 1], off[n + 1] + (nu[n + 1] if n + 1 < N else 0):
          off[n + 1] + nz[n + 1]] = -np.eye(nx[n + 1])
        ev[ro:ro + nx[n + 1]] = -b_l[n]
        ro += nx[n + 1]
    KKT = np.block([[H, E.T], [E, np.zeros((ne, ne))]])
    sol = np.linalg.solve(KKT, np.concatenate([-gv, ev]))
    for n in range(N + 1):
        got = np.concatenate([res.u[n], res.x[n]])
        np.testing.assert_allclose(got, sol[off[n]:off[n] + nz[n]],
                                   atol=1e-7, err_msg=f"stage {n}")


def test_pack_problem_rejects_inconsistent_B():
    N, nx, nu, A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l = _tv_nx_problem()
    B_bad = list(B_l)
    B_bad[1] = np.zeros((nx[1], nu[1]))  # wrong row count (nx[1] != nx[2])
    with pytest.raises(ValueError, match="rows but stage"):
        api.pack_problem(N, A_l, B_bad, b_l, Q_l, S_l, R_l, q_l, r_l)


def _small_ms(N=10):
    return _mass_spring_raw(8, 3, N)


def test_solver_cache_no_recompile():
    """Repeated solve_ocp calls at one geometry hit the jit cache."""
    (A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
     idxb, lb, ub, *_rest, x0) = _small_ms()
    kw = dict(idxb=idxb, lb=lb, ub=ub, x0=x0, mu_tol=1e-8)
    api.solve_ocp(10, A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l, **kw)
    before = api._jit_direct.cache_info()
    api.solve_ocp(10, A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l, **kw)
    after = api._jit_direct.cache_info()
    assert after.hits == before.hits + 1


def test_session_new_rhs_converged_fixed_point():
    """solve_new_rhs with unchanged vectors keeps the converged solution
    (one extra Newton step at the solution is a no-op to tolerance)."""
    (A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
     idxb, lb, ub, *_rest, x0) = _small_ms()
    res, sess = api.solve_ocp(
        10, A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
        idxb=idxb, lb=lb, ub=ub, x0=x0, mu_tol=1e-10, return_session=True,
    )
    res2 = sess.solve_new_rhs()
    for n in range(11):
        np.testing.assert_allclose(res2.x[n], res.x[n], atol=1e-7)
        np.testing.assert_allclose(res2.u[n], res.u[n], atol=1e-7)


def test_session_new_rhs_perturbed_b_matches_fresh():
    """Changed vector data through the session's retained factorization
    tracks a fresh full solve (golden-parity for the underlying model path
    is in test_ipm.py; this checks the API wiring end to end)."""
    (A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
     idxb, lb, ub, *_rest, x0) = _small_ms()
    _res, sess = api.solve_ocp(
        10, A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
        idxb=idxb, lb=lb, ub=ub, x0=x0, mu_tol=1e-10, return_session=True,
    )
    b_new = [bb + 0.003 for bb in b_l]
    quick = sess.solve_new_rhs(b=b_new)
    fresh = api.solve_ocp(
        10, A_l, B_l, b_new, Q_l, S_l, R_l, q_l, r_l,
        idxb=idxb, lb=lb, ub=ub, x0=x0, mu_tol=1e-10,
    )
    for n in range(11):
        np.testing.assert_allclose(quick.x[n], fresh.x[n], atol=2e-4)
        np.testing.assert_allclose(quick.u[n], fresh.u[n], atol=2e-4)


def test_session_single_newton_rti_loop():
    """Classic RTI: one warm Newton step per new x0 stays near the fully
    converged solution along a closed-loop-style x0 sequence."""
    (A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
     idxb, lb, ub, *_rest, x0) = _small_ms()
    _res, sess = api.solve_ocp(
        10, A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
        idxb=idxb, lb=lb, ub=ub, x0=x0, mu_tol=1e-10, return_session=True,
    )
    rng = np.random.default_rng(3)
    for _ in range(3):
        x0 = x0 + 0.01 * rng.standard_normal(8)
        rti = sess.single_newton(k=1, x0=x0)
        fresh = api.solve_ocp(
            10, A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
            idxb=idxb, lb=lb, ub=ub, x0=x0, mu_tol=1e-10,
        )
        np.testing.assert_allclose(rti.u[0], fresh.u[0], atol=5e-3)


def test_warm_start_converges_and_saves_iterations():
    (A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
     idxb, lb, ub, *_rest, x0) = _small_ms()
    cold = api.solve_ocp(
        10, A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
        idxb=idxb, lb=lb, ub=ub, x0=x0, mu_tol=1e-8,
    )
    x0b = x0 + 0.02
    warm = api.solve_ocp(
        10, A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
        idxb=idxb, lb=lb, ub=ub, x0=x0b, mu_tol=1e-8, warm_start=cold,
    )
    fresh = api.solve_ocp(
        10, A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
        idxb=idxb, lb=lb, ub=ub, x0=x0b, mu_tol=1e-8,
    )
    assert warm.status == 0
    assert warm.kk <= fresh.kk
    for n in range(11):
        np.testing.assert_allclose(warm.x[n], fresh.x[n], atol=1e-5)


def test_session_dense_tick():
    """OCPSession.dense_tick: the 5th-generation dense latency engine
    through the API front door — first call builds/caches the dense
    plan; subsequent ticks with new b agree with a fresh full solve's
    controls at the converged-mu scale (oracle path: the kernel twin is
    parity-tested in tests/test_ipm_dense.py)."""
    (A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
     idxb, lb, ub, *_rest, x0) = _small_ms()
    res, sess = api.solve_ocp(
        10, A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
        idxb=idxb, lb=lb, ub=ub, x0=x0, mu_tol=1e-5,
        return_session=True,
    )
    u0_dense, dres = sess.dense_tick(use_kernel=False)
    assert int(dres.status) == 0
    np.testing.assert_allclose(u0_dense, res.u[0], atol=2e-3)
    # a new-b tick reuses the cached plan
    b_new = [bb + 0.003 for bb in b_l]
    fresh = api.solve_ocp(
        10, A_l, B_l, b_new, Q_l, S_l, R_l, q_l, r_l,
        idxb=idxb, lb=lb, ub=ub, x0=x0, mu_tol=1e-5,
    )
    u0_dense2, dres2 = sess.dense_tick(use_kernel=False, b=b_new)
    assert int(dres2.status) == 0
    np.testing.assert_allclose(u0_dense2, fresh.u[0], atol=2e-3)
