"""MHE information-filter and forward-Schur tests against dense KKT oracles
(the same validation idea as the reference's REF_BLAS deltas,
test_d_ric_mhe.c:837-840 / test_d_forward_schur.c:729)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpmpc_tpu.models import mhe, schur
from hpmpc_tpu.utils.mass_spring import mass_spring_ab


def _mhe_data(nx=8, nw=3, ny=4, N=12, ndN=0, seed=0, dtype=np.float64):
    """Mass-spring MHE fixture in the spirit of test_d_ric_mhe.c:380-520:
    C selects the first ny states, Q = C'C (unit measurement weight),
    R = I, random measurement gradients."""
    rng = np.random.default_rng(seed)
    A, G = mass_spring_ab(nx, nw)
    C = np.zeros((ny, nx))
    C[:, :ny] = np.eye(ny)
    Q = C.T @ C
    data = mhe.MHEData(
        A=jnp.asarray(np.broadcast_to(A, (N, nx, nx)), dtype),
        G=jnp.asarray(np.broadcast_to(G, (N, nx, nw)), dtype),
        f=jnp.asarray(0.1 * rng.standard_normal((N, nx)), dtype),
        Q=jnp.asarray(np.broadcast_to(Q, (N + 1, nx, nx)), dtype),
        q=jnp.asarray(rng.standard_normal((N + 1, nx)) @ C.T @ C, dtype),
        R=jnp.asarray(np.broadcast_to(np.eye(nw), (N, nw, nw)), dtype),
        r=jnp.asarray(0.3 * rng.standard_normal((N, nw)), dtype),
        Up0=jnp.asarray(np.eye(nx), dtype),  # prior information = I
        xp0=jnp.asarray(rng.standard_normal(nx), dtype),
        D=jnp.asarray(np.eye(nx)[:ndN], dtype),
        dN=jnp.asarray(np.zeros(ndN), dtype),
    )
    return data


def _mhe_dense_oracle(data: mhe.MHEData):
    """Solve the MHE QP exactly: variables [x_0..x_N, w_0..w_{N-1}],
    equality constraints x_{n+1} = A x_n + G w_n + f (+ D x_N = dN)."""
    A = np.asarray(data.A)
    G = np.asarray(data.G)
    f = np.asarray(data.f)
    Q = np.asarray(data.Q)
    q = np.asarray(data.q)
    R = np.asarray(data.R)
    r = np.asarray(data.r)
    Up0 = np.asarray(data.Up0)
    xp0 = np.asarray(data.xp0)
    D = np.asarray(data.D)
    dN = np.asarray(data.dN)
    N, nx, nw = A.shape[0], A.shape[-1], G.shape[-1]
    ndN = D.shape[0]

    nv = (N + 1) * nx + N * nw
    ne = N * nx + ndN
    H = np.zeros((nv, nv))
    g = np.zeros(nv)
    P0 = Up0 @ Up0.T
    for n in range(N + 1):
        H[n * nx : (n + 1) * nx, n * nx : (n + 1) * nx] += Q[n]
        g[n * nx : (n + 1) * nx] += q[n]
    H[:nx, :nx] += P0
    g[:nx] += -P0 @ xp0
    woff = (N + 1) * nx
    for n in range(N):
        H[woff + n * nw : woff + (n + 1) * nw, woff + n * nw : woff + (n + 1) * nw] = R[n]
        g[woff + n * nw : woff + (n + 1) * nw] = r[n]

    Aeq = np.zeros((ne, nv))
    beq = np.zeros(ne)
    for n in range(N):
        rows = slice(n * nx, (n + 1) * nx)
        Aeq[rows, (n + 1) * nx : (n + 2) * nx] = np.eye(nx)
        Aeq[rows, n * nx : (n + 1) * nx] = -A[n]
        Aeq[rows, woff + n * nw : woff + (n + 1) * nw] = -G[n]
        beq[rows] = f[n]
    if ndN:
        Aeq[N * nx :, N * nx : (N + 1) * nx] = D
        beq[N * nx :] = dN

    K = np.block([[H, Aeq.T], [Aeq, np.zeros((ne, ne))]])
    rhs = np.concatenate([-g, beq])
    sol = np.linalg.solve(K, rhs)
    x = sol[: (N + 1) * nx].reshape(N + 1, nx)
    w = sol[woff : woff + N * nw].reshape(N, nw)
    mult = sol[nv:]
    lam = mult[: N * nx].reshape(N, nx)
    lamN = mult[N * nx :]
    return x, w, lam, lamN


@pytest.mark.parametrize("ndN", [0, 4])
def test_mhe_if_matches_dense_kkt(ndN):
    data = _mhe_data(ndN=ndN)
    sol, fac = jax.jit(mhe.factor_solve)(data)
    x_ref, w_ref, lam_ref, lamN_ref = _mhe_dense_oracle(data)
    np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sol.w), w_ref, atol=1e-9)
    # costate sign convention: our lam_n = Up_{n+1}Up_{n+1}'(xp-x) equals the
    # dense KKT multiplier of the dynamics row (check up to sign)
    scale = np.sign(np.sum(np.asarray(sol.lam) * lam_ref)) or 1.0
    np.testing.assert_allclose(np.asarray(sol.lam) * scale, lam_ref, atol=1e-8)
    if ndN:
        scaleN = np.sign(np.sum(np.asarray(sol.lamN) * lamN_ref)) or 1.0
        np.testing.assert_allclose(np.asarray(sol.lamN) * scaleN, lamN_ref, atol=1e-8)


def test_mhe_prediction_consistency():
    """With zero measurement INFORMATION (Q=0, q=0) and zero noise gradient,
    the smoother has nothing to correct: x equals the noise-free rollout of
    the prior mean and the noise estimate is zero."""
    data = _mhe_data()
    data = data._replace(
        Q=jnp.zeros_like(data.Q),
        q=jnp.zeros_like(data.q),
        r=jnp.zeros_like(data.r),
    )
    sol, fac = jax.jit(mhe.factor_solve)(data)
    x = np.asarray(sol.x)
    A = np.asarray(data.A)
    f = np.asarray(data.f)
    roll = [np.asarray(data.xp0)]
    for n in range(A.shape[0]):
        roll.append(A[n] @ roll[-1] + f[n])
    np.testing.assert_allclose(x, np.stack(roll), atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol.w), 0.0, atol=1e-8)


def _schur_chain(N=8, nv=7, ne=4, seed=0, ragged=False, dtype=np.float64):
    rng = np.random.default_rng(seed)
    NV, NE = nv, ne
    nvs = [nv] * (N + 1)
    nes = [ne] * N
    if ragged:
        nvs = [nv - (i % 3) for i in range(N + 1)]
        nes = [min(ne - (i % 2), nvs[i + 1]) for i in range(N)]
    Q = np.zeros((N + 1, NV, NV))
    qv = np.zeros((N + 1, NV))
    Am = np.zeros((N, NE, NV))
    bm = np.zeros((N, NE))
    v_mask = np.zeros((N + 1, NV))
    e_mask = np.zeros((N, NE))
    for n in range(N + 1):
        k = nvs[n]
        M = rng.standard_normal((k, k))
        Q[n, :k, :k] = M @ M.T + k * np.eye(k)
        Q[n] += np.diag(1.0 - (np.arange(NV) < k))
        qv[n, :k] = rng.standard_normal(k)
        v_mask[n, :k] = 1.0
    for n in range(N):
        k = nes[n]
        Am[n, :k, : nvs[n]] = rng.standard_normal((k, nvs[n]))
        bm[n, :k] = rng.standard_normal(k)
        e_mask[n, :k] = 1.0
    chain = schur.SchurChain(
        Q=jnp.asarray(Q, dtype),
        q=jnp.asarray(qv, dtype),
        A=jnp.asarray(Am, dtype),
        b=jnp.asarray(bm, dtype),
        v_mask=jnp.asarray(v_mask, dtype),
        e_mask=jnp.asarray(e_mask, dtype),
    )
    return chain, nvs, nes


def _schur_dense_oracle(chain, nvs, nes):
    Q = np.asarray(chain.Q)
    qv = np.asarray(chain.q)
    Am = np.asarray(chain.A)
    bm = np.asarray(chain.b)
    N = Am.shape[0]
    NV = Q.shape[-1]
    NE = Am.shape[-2]
    offs = np.cumsum([0] + [nvs[n] for n in range(N + 1)])
    nv_tot = offs[-1]
    eoffs = np.cumsum([0] + [nes[n] for n in range(N)])
    ne_tot = eoffs[-1]
    H = np.zeros((nv_tot, nv_tot))
    g = np.zeros(nv_tot)
    for n in range(N + 1):
        k = nvs[n]
        H[offs[n] : offs[n] + k, offs[n] : offs[n] + k] = Q[n, :k, :k]
        g[offs[n] : offs[n] + k] = qv[n, :k]
    Aeq = np.zeros((ne_tot, nv_tot))
    beq = np.zeros(ne_tot)
    for n in range(N):
        k = nes[n]
        rows = slice(eoffs[n], eoffs[n] + k)
        Aeq[rows, offs[n] : offs[n] + nvs[n]] = Am[n, :k, : nvs[n]]
        Aeq[rows, offs[n + 1] : offs[n + 1] + k] = -np.eye(k)
        beq[rows] = bm[n, :k]
    # A v - v_next[:ne] + b = 0  ->  Aeq z = -b
    K = np.block([[H, Aeq.T], [Aeq, np.zeros((ne_tot, ne_tot))]])
    rhs = np.concatenate([-g, -beq])
    sol = np.linalg.solve(K, rhs)
    v = np.zeros((N + 1, NV))
    for n in range(N + 1):
        v[n, : nvs[n]] = sol[offs[n] : offs[n] + nvs[n]]
    pi = np.zeros((N, NE))
    for n in range(N):
        pi[n, : nes[n]] = sol[nv_tot + eoffs[n] : nv_tot + eoffs[n] + nes[n]]
    return v, pi


@pytest.mark.parametrize("ragged", [False, True])
def test_forward_schur_matches_dense_kkt(ragged):
    chain, nvs, nes = _schur_chain(ragged=ragged)
    (v, pi), fac = jax.jit(schur.factor_solve)(chain)
    v_ref, pi_ref = _schur_dense_oracle(chain, nvs, nes)
    np.testing.assert_allclose(np.asarray(v), v_ref, atol=1e-9)
    np.testing.assert_allclose(np.asarray(pi), pi_ref, atol=1e-9)
    rv, re = schur.residuals(chain, jnp.asarray(v), jnp.asarray(pi))
    assert float(jnp.max(jnp.abs(rv))) < 1e-9
    assert float(jnp.max(jnp.abs(re))) < 1e-9


def _mhe_cov_data(nx=8, nw=3, ny=4, N=12, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    A, G = mass_spring_ab(nx, nw)
    C = np.zeros((ny, nx))
    C[:, :ny] = np.eye(ny)
    return mhe.MHECovData(
        A=jnp.asarray(np.broadcast_to(A, (N, nx, nx)), dtype),
        G=jnp.asarray(np.broadcast_to(G, (N, nx, nw)), dtype),
        f=jnp.asarray(0.1 * rng.standard_normal((N, nx)), dtype),
        C=jnp.asarray(np.broadcast_to(C, (N + 1, ny, nx)), dtype),
        y=jnp.asarray(rng.standard_normal((N + 1, ny)), dtype),
        W=jnp.asarray(np.broadcast_to(2.0 * np.eye(ny), (N + 1, ny, ny)), dtype),
        R=jnp.asarray(np.broadcast_to(np.eye(nw), (N, nw, nw)), dtype),
        r=jnp.asarray(0.3 * rng.standard_normal((N, nw)), dtype),
        Lp0=jnp.asarray(np.eye(nx), dtype),
        xp0=jnp.asarray(rng.standard_normal(nx), dtype),
    )


def test_mhe_covariance_form_matches_information_form():
    """The square-root covariance smoother solves the same QP as the
    information filter (the reference's trf/trs_mhe vs trf/trs_mhe_if
    cross-check, test_d_ric_mhe.c:990-1002)."""
    data_c = _mhe_cov_data()
    sol_c = jax.jit(lambda d: mhe.solve_cov(d, smooth=True))(data_c)
    data_i = data_c.as_information()
    sol_i, _ = jax.jit(mhe.factor_solve)(data_i)
    np.testing.assert_allclose(np.asarray(sol_c.x), np.asarray(sol_i.x), atol=1e-9)
    np.testing.assert_allclose(np.asarray(sol_c.w), np.asarray(sol_i.w), atol=1e-9)
    np.testing.assert_allclose(np.asarray(sol_c.xp), np.asarray(sol_i.xp), atol=1e-9)


def test_mhe_covariance_filtered_only():
    """smooth=False (the reference's _end path): returns the filtered
    trajectory; the terminal filtered estimate equals the smoothed one."""
    data_c = _mhe_cov_data()
    sol_f = jax.jit(lambda d: mhe.solve_cov(d, smooth=False), static_argnums=())(data_c)
    sol_s = jax.jit(lambda d: mhe.solve_cov(d, smooth=True), static_argnums=())(data_c)
    np.testing.assert_allclose(
        np.asarray(sol_f.x[-1]), np.asarray(sol_s.x[-1]), atol=1e-10
    )
    # filtered estimates match the smoother's xe
    np.testing.assert_allclose(
        np.asarray(sol_f.xe), np.asarray(sol_s.xe), atol=1e-12
    )


def test_mhe_measure_dat_fixture():
    """The reference's MHE measurement file drives an information-form solve
    (test_d_ric_mhe.c:299 protocol: C selects the first ny states, unit
    weights, horizon from the file)."""
    import pathlib

    from hpmpc_tpu.utils.mhe_data import load_mhe_measure

    path = pathlib.Path(__file__).parent / "golden" / "mhe_measure.dat"
    nx, nw, ny, Ns, y = load_mhe_measure(str(path))
    assert (nx, nw, ny, Ns) == (12, 5, 3, 101)
    assert y.shape == (101, 3)

    # horizon N=15 like the reference test default (test_d_ric_mhe.c:316)
    N = 15
    A, G = mass_spring_ab(nx, nw)
    C = np.zeros((ny, nx))
    C[:, :ny] = np.eye(ny)
    data = mhe.MHECovData(
        A=jnp.asarray(np.broadcast_to(A, (N, nx, nx))),
        G=jnp.asarray(np.broadcast_to(G, (N, nx, nw))),
        f=jnp.zeros((N, nx)),
        C=jnp.asarray(np.broadcast_to(C, (N + 1, ny, nx))),
        y=jnp.asarray(y[: N + 1]),
        W=jnp.asarray(np.broadcast_to(np.eye(ny), (N + 1, ny, ny))),
        R=jnp.asarray(np.broadcast_to(np.eye(nw), (N, nw, nw))),
        r=jnp.zeros((N, nw)),
        Lp0=jnp.asarray(np.eye(nx)),
        xp0=jnp.zeros(nx),
    )
    sol_c = jax.jit(lambda d: mhe.solve_cov(d, smooth=True))(data)
    sol_i, _ = jax.jit(mhe.factor_solve)(data.as_information())
    np.testing.assert_allclose(np.asarray(sol_c.x), np.asarray(sol_i.x), atol=1e-9)
    # the smoother tracks the measured components
    err = np.asarray(sol_c.x)[:, :ny] - y[: N + 1]
    assert np.abs(err).mean() < np.abs(y[: N + 1]).mean()


def test_riccati_kkt_residuals():
    from hpmpc_tpu.models import riccati
    from hpmpc_tpu.utils.mass_spring import mass_spring_qp

    dims, qp = mass_spring_qp(8, 3, 10)
    H_eff = qp.H + jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(qp.pad_diag)
    g_eff = qp.g * qp.z_mask
    sol, *_ = jax.jit(
        lambda H, g, F, b: riccati.factor_solve(H, g, F, b, dims.NU)
    )(H_eff, g_eff, qp.F, qp.b)
    rq, rb = riccati.kkt_residuals(
        H_eff, g_eff, qp.F, qp.b, sol.z, sol.pi, dims.NU
    )
    assert float(jnp.max(jnp.abs(rq * qp.z_mask))) < 1e-10
    assert float(jnp.max(jnp.abs(rb * qp.x_mask[1:]))) < 1e-10


@pytest.mark.parametrize(
    "name", ["schur_N6_nv5_ne3", "schur_N10_nv7_ne4_reg"]
)
def test_schur_golden_parity_vs_panel_reference(name):
    """Golden parity vs the reference's own panel forward-Schur solver
    (d_forward_schur_trf_tv / d_forward_schur_trs_tv,
    lqcp_solvers/d_for_schur_rec.c:45,476; fixtures from
    tools/golden_gen/schur_main.c)."""
    import json
    import pathlib

    p = pathlib.Path(__file__).parent / "golden" / f"{name}.json"
    d = json.loads(p.read_text())
    N, nv, ne = d["N"], d["nv"], d["ne"]
    Q = np.stack([np.array(d["Q"][n]).reshape(nv, nv, order="F") for n in range(N + 1)])
    A = np.stack([np.array(d["A"][n]).reshape(ne, nv, order="F") for n in range(N)])
    q = np.stack([np.array(x) for x in d["q"]])
    b = np.stack([np.array(x) for x in d["b"]])
    chain = schur.SchurChain(
        Q=jnp.asarray(Q), q=jnp.asarray(q), A=jnp.asarray(A), b=jnp.asarray(b),
        v_mask=jnp.ones((N + 1, nv)), e_mask=jnp.ones((N, ne)),
    )
    (v, pi), _ = jax.jit(
        lambda c: schur.factor_solve(c, reg=d["reg"]), static_argnums=()
    )(chain)
    v_ref = np.stack([np.array(x) for x in d["v"]])
    pi_ref = np.stack([np.array(x) for x in d["pi"]])
    np.testing.assert_allclose(np.asarray(v), v_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(pi), pi_ref, atol=1e-10)


# ---------------------------------------------------------------------------
# Golden parity vs the reference's own MHE-if oracle.
#
# Finding (documented in tools/golden_gen/mhe_blas_main.c): the reference's
# PANEL solvers d_ric_trf/trs_mhe_if (d_ric_sv.c:1298,1629) are unbuildable
# in every shipped configuration — d_ric_sv.o is absent from
# lqcp_solvers/Makefile and the functions call panel-BLAS routines declared
# in blas_d.h but defined nowhere in the tree.  The oracle here is the
# reference's own LAPACK twin pair d_ric_trf/trs_mhe_if_blas
# (reference_code/d_ric_sv_blas.c:47,175 — what test_d_ric_mhe.c:837-840
# cross-checks the panel path against), un-gated and compiled by
# tools/golden_gen/build_ref.sh.  The N=15 fixture runs the driver's own
# mhe_measure.dat record (test_d_ric_mhe.c:299-320).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    ["mhe_if_nx12_nw5_ny3_N15", "mhe_if_nx8_nw3_ny4_ndN2_N10"],
)
def test_mhe_if_golden_parity_vs_reference(name):
    from conftest import load_golden

    g = load_golden(name)
    cfg = g["config"]
    nx, nw, ny, ndN, N = (
        cfg["nx"], cfg["nw"], cfg["ny"], cfg["ndN"], cfg["N"]
    )
    A = np.array(g["A_colmajor"]).reshape(nx, nx, order="F")
    G = np.array(g["G_colmajor"]).reshape(nx, nw, order="F")
    R = np.array(g["R_colmajor"]).reshape(nw, nw, order="F")
    C = np.array(g["C_colmajor"]).reshape(ny, nx, order="F")
    Qy = np.array(g["Qy_colmajor"]).reshape(ny, ny, order="F")
    Qx = C.T @ Qy @ C
    qq = np.array(g["qq"])  # (N+1, nx) = -C' Qy y (generator convention)
    r = np.array(g["r"])
    f = np.array(g["f"])
    if ndN > 0:
        D = np.array(g["D_colmajor"]).reshape(ndN, nx, order="F")
        dN = np.array(g["d"])
    else:
        D = np.zeros((0, nx))
        dN = np.zeros((0,))

    data = mhe.MHEData(
        A=jnp.asarray(np.broadcast_to(A, (N, nx, nx))),
        G=jnp.asarray(np.broadcast_to(G, (N, nx, nw))),
        f=jnp.asarray(np.broadcast_to(f, (N, nx))),
        Q=jnp.asarray(np.broadcast_to(Qx, (N + 1, nx, nx))),
        q=jnp.asarray(qq),
        R=jnp.asarray(np.broadcast_to(R, (N, nw, nw))),
        r=jnp.asarray(np.broadcast_to(r, (N, nw))),
        Up0=jnp.eye(nx),  # generator prior: Up0 = I
        xp0=jnp.zeros(nx),
        D=jnp.asarray(D),
        dN=jnp.asarray(dN),
    )
    sol, _ = mhe.factor_solve(data)

    np.testing.assert_allclose(
        np.asarray(sol.x), np.array(g["xe"]), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(sol.xp), np.array(g["xp"]), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(sol.w), np.array(g["w"]), rtol=1e-9, atol=1e-9
    )
    lam_ref = np.array(g["lam"])  # (N+1, nx); rows 0..N-1 = costates
    np.testing.assert_allclose(
        np.asarray(sol.lam), lam_ref[:N], rtol=1e-9, atol=1e-9
    )
    if ndN > 0:
        np.testing.assert_allclose(
            np.asarray(sol.lamN), lam_ref[N][:ndN], rtol=1e-9, atol=1e-9
        )
