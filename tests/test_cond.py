"""Partial-condensing tests: condensed-then-expanded solutions must match the
direct full-horizon IPM (the reference's own cross-check strategy,
test_problems/test_d_part_cond.c), for several N2 including full condensing
(N2=1 -> dense QP) and N2=N (identity transform)."""

import functools

import jax
import numpy as np
import pytest

from hpmpc_tpu.models import cond, ipm
from hpmpc_tpu.utils.mass_spring import mass_spring_qp


@functools.partial(jax.jit, static_argnums=(0, 2))
def _solve_direct(dims, qp, cfg):
    return ipm.solve(dims, qp, cfg)


def _check(nx, nu, N, N2, ng=0, ngN=0, atol=1e-6, mu_tol=1e-10):
    dims, qp = mass_spring_qp(nx, nu, N, ng=ng, ngN=ngN)
    cfg = ipm.IPMConfig(k_max=30, mu_tol=mu_tol)

    sol_d = _solve_direct(dims, qp, cfg)
    assert int(sol_d.status) == 0

    pl = cond.plan(dims, N2)
    run = jax.jit(
        lambda q: cond.solve_partial_cond(dims, q, cfg, N2),
        static_argnums=(),
    )
    sol_e, sol2 = run(qp)
    assert int(sol2.status) == 0, f"condensed IPM failed, N2={N2}"

    np.testing.assert_allclose(
        np.asarray(sol_e.z), np.asarray(sol_d.z), atol=atol,
        err_msg=f"z mismatch N2={N2}",
    )
    np.testing.assert_allclose(
        np.asarray(sol_e.pi), np.asarray(sol_d.pi), atol=10 * atol,
        err_msg=f"pi mismatch N2={N2}",
    )
    # multipliers can split non-uniquely across degenerate constraint sets;
    # the principled check is KKT residuals of the expanded solution on the
    # ORIGINAL problem (this also validates the lam/t/pi expansion)
    import jax.numpy as jnp

    oh = ipm._box_onehot(qp)
    mu_scal = jnp.asarray(1.0 / dims.n_constr, qp.dtype)
    res = ipm.compute_residuals(
        qp, oh, mu_scal, sol_e.z, sol_e.pi,
        sol_e.lam_b, sol_e.t_b, sol_e.lam_g, sol_e.t_g,
    )
    assert float(jnp.max(jnp.abs(res.rq))) < 100 * atol
    assert float(jnp.max(jnp.abs(res.rb))) < 10 * atol
    assert float(jnp.max(jnp.abs(res.rd_b))) < 10 * atol
    assert float(jnp.max(jnp.abs(res.rd_g))) < 10 * atol


@pytest.mark.parametrize("N2", [1, 2, 3, 5, 10])
def test_part_cond_matches_direct_box(N2):
    _check(8, 3, 10, N2)


@pytest.mark.parametrize("N2", [2, 5])
def test_part_cond_matches_direct_general(N2):
    # Golden IPM config (known feasible/convergent).  Active state bounds
    # condense into DENSE general rows whose barrier weights (lam/t ~ 1/mu)
    # make the condensed KKT condition ~1e10 near convergence; the
    # conditioning worsens with group length T=N/N2, so N2=5 (T=6) tracks
    # the direct solution to ~3e-6 at mu_tol=1e-9 f64 while N2=2 (T=15)
    # needs the looser 1e-7 comparison (iter_ref tightens both, see below).
    if N2 >= 5:
        _check(8, 3, 30, N2, ng=2, ngN=8, mu_tol=1e-9, atol=8e-6)
    else:
        _check(8, 3, 30, N2, ng=2, ngN=8, mu_tol=1e-7, atol=2e-5)


def test_part_cond_iter_ref_tightens_accuracy():
    """IPMConfig.iter_ref flows through the condensing pipeline (the
    reference's ITER_REF hook targets exactly this ill-conditioned
    condensed-KKT case, d_ip2_res_hard.c:48) and improves the expanded
    solution's agreement with the direct solve."""
    dims, qp = mass_spring_qp(8, 3, 30, ng=2, ngN=8)
    ref = jax.jit(
        lambda q: ipm.solve(dims, q, ipm.IPMConfig(k_max=40, mu_tol=1e-10))
    )(qp)
    errs = {}
    for ir in (0, 2):
        cfg = ipm.IPMConfig(k_max=40, mu_tol=1e-9, iter_ref=ir)
        sol, sol2 = jax.jit(
            lambda q, c=cfg: cond.solve_partial_cond(dims, q, c, 5)
        )(qp)
        assert int(sol2.status) == 0
        errs[ir] = float(np.max(np.abs(np.asarray(sol.z) - np.asarray(ref.z))))
    assert errs[2] <= errs[0]
    assert errs[2] < 2e-6


def test_cond_plan_sizes():
    """Group partitioning matches d_part_cond_compute_problem_size semantics."""
    dims, qp = mass_spring_qp(8, 3, 10)
    pl = cond.plan(dims, 3)
    assert pl.group_T == (4, 3, 3)
    assert pl.group_start == (0, 4, 7)
    d2 = pl.dims2
    # group 0: stages 0..3, nu = 4*3 = 12; nb: stage0 3 input boxes +
    # stages 1..3 each 3 input boxes = 12 box; states 4 per interior stage -> 12 gen
    assert d2.nu[0] == 12
    assert d2.nx[0] == 0
    assert d2.nb[0] == 12
    assert d2.ng[0] == 12
    assert d2.nx[1] == 8


def test_condense_rhs_matches_full_recondense():
    """The rhs-only path must equal a full re-condense when only vector data
    changed (the reference d_part_cond_rhs_libstr contract)."""
    import dataclasses as dc

    import jax.numpy as jnp

    dims, qp = mass_spring_qp(8, 3, 12, ng=2, ngN=4)
    pl = cond.plan(dims, 4)
    qp2_mat = cond.condense(qp, pl)

    # change b, g and bounds (matrices unchanged)
    qp_new = dc.replace(
        qp,
        b=qp.b * 1.1,
        g=qp.g + 0.05 * qp.z_mask,
        d_lb=qp.d_lb - 0.1 * qp.nb_mask,
        d_ug=qp.d_ug + 0.2 * qp.ng_mask,
    )
    qp2_full = cond.condense(qp_new, pl)
    qp2_rhs = jax.jit(lambda a, b_: cond.condense_rhs(a, pl, b_), static_argnums=())(
        qp_new, qp2_mat
    )
    for field in ("b", "g", "d_lb", "d_ub", "d_lg", "d_ug", "F", "H", "C"):
        np.testing.assert_allclose(
            np.asarray(getattr(qp2_rhs, field)),
            np.asarray(getattr(qp2_full, field)),
            atol=1e-12,
            err_msg=field,
        )


def test_suggest_n2_model_sanity():
    """The N2 autotuner (SURVEY §7 step-6 "autotune N2") returns valid
    horizons and shifts toward deeper condensing in the latency-bound
    regime (small batch) vs shallower in the flops-bound regime."""
    from hpmpc_tpu.ocp import OCPDims

    d = OCPDims.create(30, 8, 3, 7, 0, idxb=[list(range(7))] * 31)
    n2_lat = cond.suggest_n2(d, batch=1)
    n2_thr = cond.suggest_n2(d, batch=4096)
    assert 1 <= n2_lat <= 30 and 1 <= n2_thr <= 30
    assert n2_lat <= n2_thr
    # the suggestion must be usable end-to-end
    dims, qp = mass_spring_qp(8, 3, 30)
    cfg = ipm.IPMConfig(k_max=30, mu_tol=1e-8)
    sol, sol2 = jax.jit(
        lambda q: cond.solve_partial_cond(dims, q, cfg, n2_thr)
    )(qp)
    assert int(sol2.status) == 0


@pytest.mark.parametrize(
    "name",
    ["partcond_ms_nx8_nu3_N12_N2_4", "partcond_ms_nx8_nu3_N30_N2_5_ngN8"],
)
def test_condense_golden_matrix_parity(name):
    """MATRIX-level golden parity of the condensing transform vs the
    reference's d_part_cond (d_part_cond.c:926; fixtures from
    tools/golden_gen mode 3): condensed dynamics/cost/constraint matrices,
    bounds, box-index lists, and problem sizes must all match (the
    reference stores only the lower Hessian triangle)."""
    import json
    import pathlib

    d = json.loads(
        (pathlib.Path(__file__).parent / "golden" / f"{name}.json").read_text()
    )
    c = d["config"]
    N, N2, nx, nu = c["N"], c["N2"], c["nx"], c["nu"]
    A = np.array(d["A"]).reshape(nx, nx, order="F")
    B = np.array(d["B"]).reshape(nx, nu, order="F")
    ngN = d["ng2"][N2]
    dims, qp = mass_spring_qp(nx, nu, N, ngN=ngN, A=A, B=B)
    pl = cond.plan(dims, N2)
    qp2 = cond.condense(qp, pl)
    d2 = pl.dims2

    assert list(d2.nx) == d["nx2"] and list(d2.nu) == d["nu2"]
    assert list(d2.nb) == d["nb2"] and list(d2.ng) == d["ng2"]
    for g in range(N2 + 1):
        assert list(d2.idxb[g]) == d["idxb2"][g], f"idxb2 stage {g}"

    NU2 = d2.NU
    for g in range(N2 + 1):
        sel = list(range(d2.nu[g])) + [NU2 + i for i in range(d2.nx[g])]
        nux = len(sel)
        # dynamics [B2' ; A2' ; b2'] (stages < N2)
        if g < N2:
            cols = d["nx2"][g + 1]
            BAbt = np.array(d["BAbt2"][g]).reshape(nux + 1, cols, order="F")
            F2 = np.asarray(qp2.F[g])[np.ix_(sel, range(cols))]
            np.testing.assert_allclose(F2, BAbt[:-1], atol=1e-12, err_msg=f"F2 {g}")
            np.testing.assert_allclose(
                np.asarray(qp2.b[g])[:cols], BAbt[-1], atol=1e-12, err_msg=f"b2 {g}"
            )
        # cost [R S'; S Q] lower triangle + gradient row
        RSQ = np.array(d["RSQrq2"][g]).reshape(nux + 1, nux, order="F")
        H2 = np.asarray(qp2.H[g])[np.ix_(sel, sel)]
        lo = np.tril_indices(nux)
        np.testing.assert_allclose(H2[lo], RSQ[:-1][lo], atol=1e-12, err_msg=f"H2 {g}")
        np.testing.assert_allclose(
            np.asarray(qp2.g[g])[sel], RSQ[-1], atol=1e-12, err_msg=f"g2 {g}"
        )
        # general rows (transposed in the reference layout) + bounds
        ngg = d["ng2"][g]
        if ngg:
            DCt = np.array(d["DCt2"][g]).reshape(nux, ngg, order="F")
            C2 = np.asarray(qp2.C[g])[np.ix_(range(ngg), sel)]
            np.testing.assert_allclose(C2.T, DCt, atol=1e-12, err_msg=f"DCt {g}")
        nb2g = d["nb2"][g]
        got = np.concatenate([
            np.asarray(qp2.d_lb[g])[:nb2g], np.asarray(qp2.d_ub[g])[:nb2g],
            np.asarray(qp2.d_lg[g])[:ngg], np.asarray(qp2.d_ug[g])[:ngg],
        ])
        np.testing.assert_allclose(
            got, np.array(d["d2"][g]), atol=1e-12, err_msg=f"d2 {g}"
        )


@pytest.mark.parametrize(
    "name", ["condlqcp_nx6_nu2_N8", "condlqcp_nx8_nu3_N12"]
)
def test_full_condensing_golden_lqcp(name):
    """FULL-condensing (N->1) golden parity vs the reference's dedicated
    d_cond_lqcp driver (d_cond.c:3617) at N2=1, which eliminates the
    initial state (nx2[0]=0, d_cond.c:3733) and keeps the terminal state:
    R2/B2/b2 must match alg=0 (N^3 nx^2) and r2 must match alg=2
    (N^2 nx^3).

    TWO REFERENCE BUGS are documented by this test (each confirmed
    against an independent dense numpy condensing oracle, which agrees
    with the trusted reference values to 1e-14):
      * alg=1 (d_cond_R_N2_nx2, d_cond.c:239) computes the LAST block
        row of R2 wrong (boundary bug in the N^2-flops recursion);
      * the alg=0/1 driver path omits the S @ Gamma_b gradient term from
        r2 (the coupling of the affine state response into the input
        gradient; invisible when S=0, which is all the reference's own
        tests use).  alg=2's inline path includes it.
    Our condensing includes the S term and matches the correct values."""
    import json
    import pathlib

    from hpmpc_tpu.ocp import OCPDims, pack_ocp

    d = json.loads(
        (pathlib.Path(__file__).parent / "golden" / f"{name}.json").read_text()
    )
    c = d["config"]
    nx, nu, N = c["nx"], c["nu"], c["N"]
    Nnu = N * nu
    A = np.array(d["A_colmajor"]).reshape(nx, nx, order="F")
    B = np.array(d["B_colmajor"]).reshape(nx, nu, order="F")
    Q = np.array(d["Q_colmajor"]).reshape(nx, nx, order="F")
    R = np.array(d["R_colmajor"]).reshape(nu, nu, order="F")
    S = np.array(d["S_colmajor"]).reshape(nu, nx, order="F")
    q, r = np.array(d["q"]), np.array(d["r"])
    b, b0 = np.array(d["b"]), np.array(d["b0"])

    # x0-eliminated chain exactly like the oracle driver (hb[0] = b0)
    dims = OCPDims.create(
        N, nx=(0,) + (nx,) * N, nu=(nu,) * N + (0,), nb=0, ng=0,
        idxb=[[] for _ in range(N + 1)],
    )
    qp = pack_ocp(
        dims,
        A=[np.zeros((nx, 0))] + [A] * (N - 1),
        B=[B] * N,
        b=[b0] + [b] * (N - 1),
        Q=[np.zeros((0, 0))] + [Q] * N,
        S=[np.zeros((nu, 0))] + [S] * (N - 1) + [np.zeros((0, nx))],
        R=[R] * N + [np.zeros((0, 0))],
        q=[np.zeros(0)] + [q] * N,
        r=[r] * N + [np.zeros(0)],
    )
    pl = cond.plan(dims, 1)
    qp2 = cond.condense(qp, pl)
    d2 = pl.dims2
    assert d2.nu[0] == Nnu and d2.nx[0] == 0 and d2.nx[1] == nx

    # reference values: lower triangle only is valid (panel storage)
    R2_ref = np.array(d["R2_colmajor_alg0"]).reshape(Nnu, Nnu, order="F")
    R2_ref = np.tril(R2_ref) + np.tril(R2_ref, -1).T
    B2_ref = np.array(d["B2_colmajor_alg0"]).reshape(nx, Nnu, order="F")
    b2_ref = np.array(d["b2_alg0"])
    r2_ref = np.array(d["r2_alg2"])  # alg0/1 omit the S term (see above)

    # ORDERING: our condensed group stacks inputs stage-REVERSED
    # (u_{T-1} first) — the convention of the SHIPPING d_part_cond (which
    # the matrix-level partial-condensing golden validates directly, and
    # which makes the condensed Hessian factorizable stage-wise,
    # d_cond_fact_R_N2_nx2_permute, d_cond.c:918).  d_cond_lqcp uses
    # natural order (u_0 first, via Gamma_u, d_cond.c:2950); P converts.
    P = np.zeros((Nnu, Nnu))
    for i in range(N):
        P[i * nu : (i + 1) * nu, (N - 1 - i) * nu : (N - i) * nu] = np.eye(nu)

    R2 = P @ np.asarray(qp2.H[0])[:Nnu, :Nnu] @ P.T
    np.testing.assert_allclose(R2, R2_ref, atol=1e-10)
    np.testing.assert_allclose(
        P @ np.asarray(qp2.F[0])[:Nnu, :nx], B2_ref.T, atol=1e-10
    )
    np.testing.assert_allclose(np.asarray(qp2.b[0])[:nx], b2_ref, atol=1e-10)
    np.testing.assert_allclose(
        P @ np.asarray(qp2.g[0])[:Nnu], r2_ref, atol=1e-10
    )

    # the documented reference bugs really are present in the fixture
    R2_alg1 = np.array(d["R2_colmajor_alg1"]).reshape(Nnu, Nnu, order="F")
    R2_alg1 = np.tril(R2_alg1) + np.tril(R2_alg1, -1).T
    last = slice((N - 1) * nu, Nnu)
    assert np.abs((R2_alg1 - R2_ref)[last, :]).max() > 1e-3
    assert np.abs(R2_alg1[: (N - 1) * nu, : (N - 1) * nu]
                  - R2_ref[: (N - 1) * nu, : (N - 1) * nu]).max() < 1e-10
    r2_alg0 = np.array(d["r2_alg0"])
    # r2_alg0 = r2_correct - S @ Gamma_b (recompute the omitted term)
    cvec = np.zeros(nx)
    omitted = np.zeros(Nnu)
    for k in range(N):
        cvec = A @ cvec + (b0 if k == 0 else b)
        if k + 1 < N:
            omitted[(k + 1) * nu : (k + 2) * nu] = S @ cvec
    np.testing.assert_allclose(r2_alg0, r2_ref - omitted, atol=1e-10)
