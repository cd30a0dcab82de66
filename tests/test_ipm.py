"""Hard-constraint IPM tests: iteration-for-iteration golden parity against
the reference C solver (d_ip2_res_mpc_hard_tv) on the mass-spring fixtures,
including the per-iteration stat trace {sigma, alpha_aff, mu_aff, alpha, mu}."""

import functools

import jax
import numpy as np
import pytest

from conftest import golden_ab, load_golden
from hpmpc_tpu.models import ipm
from hpmpc_tpu.utils.mass_spring import mass_spring_qp


@functools.partial(jax.jit, static_argnums=(0, 2))
def _solve_jit(dims, qp, cfg):
    return ipm.solve(dims, qp, cfg)


def _run_golden(name):
    g = load_golden(name)
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
    sol = _solve_jit(dims, qp, cfg)
    return g, dims, qp, sol


FIXTURES = [
    "ipm_ms_nx8_nu3_N10",
    "ipm_ms_nx16_nu1_N30",
    "ipm_ms_nx8_nu3_N30_ngN8",
    "ipm_ms_nx8_nu3_N30_ng2_ngN8",
]


@pytest.mark.parametrize("name", FIXTURES)
def test_ipm_iteration_count_and_stat_trace(name):
    g, dims, qp, sol = _run_golden(name)
    assert int(sol.kk) == g["kk"], f"iterations: got {int(sol.kk)} want {g['kk']}"
    stat_ref = np.array(g["stat"]).reshape(-1, 5)[: g["kk"]]
    stat_got = np.asarray(sol.stat)[: g["kk"]]
    # sigma, alpha_aff, mu_aff, alpha, mu per iteration
    np.testing.assert_allclose(stat_got, stat_ref, rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("name", FIXTURES)
def test_ipm_solution_parity(name):
    g, dims, qp, sol = _run_golden(name)
    NU = dims.NU
    for n in range(dims.N + 1):
        ref = np.array(g["ux"][n])
        nun, nxn = dims.nu[n], dims.nx[n]
        got = np.concatenate(
            [np.asarray(sol.z[n])[:nun], np.asarray(sol.z[n])[NU : NU + nxn]]
        )
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-8, err_msg=f"ux stage {n}")
    for n in range(dims.N):
        ref = np.array(g["pi"][n])
        got = np.asarray(sol.pi[n])[: dims.nx[n + 1]]
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-7, err_msg=f"pi {n}")
    # lam/t in golden logical order: lb(nb), ub(nb), lg(ng), ug(ng)
    for n in range(dims.N + 1):
        nbn, ngn = dims.nb[n], dims.ng[n]
        lam_ref = np.array(g["lam"][n]) if (nbn + ngn) else np.zeros(0)
        t_ref = np.array(g["t"][n]) if (nbn + ngn) else np.zeros(0)
        lam_got = np.concatenate(
            [
                np.asarray(sol.lam_b[n, 0, :nbn]),
                np.asarray(sol.lam_b[n, 1, :nbn]),
                np.asarray(sol.lam_g[n, 0, :ngn]),
                np.asarray(sol.lam_g[n, 1, :ngn]),
            ]
        )
        t_got = np.concatenate(
            [
                np.asarray(sol.t_b[n, 0, :nbn]),
                np.asarray(sol.t_b[n, 1, :nbn]),
                np.asarray(sol.t_g[n, 0, :ngn]),
                np.asarray(sol.t_g[n, 1, :ngn]),
            ]
        )
        np.testing.assert_allclose(lam_got, lam_ref, rtol=1e-6, atol=1e-8, err_msg=f"lam {n}")
        np.testing.assert_allclose(t_got, t_ref, rtol=1e-6, atol=1e-8, err_msg=f"t {n}")


def test_ipm_converged_status_and_residuals():
    g, dims, qp, sol = _run_golden("ipm_ms_nx8_nu3_N30_ngN8")
    assert int(sol.status) == 0
    r = np.asarray(sol.inf_norm_res)
    assert r[3] <= g["config"]["mu_tol"]
    assert r[0] < 1e-5 and r[1] < 1e-8 and r[2] < 1e-8


def test_ipm_vmap_batch_matches_single():
    """Batched solve (vmap over instances with different b) freezes converged
    instances and matches per-instance solves bitwise-ish."""
    import jax.numpy as jnp

    g = load_golden("ipm_ms_nx8_nu3_N10")
    A, B = golden_ab(g)
    dims, qp = mass_spring_qp(8, 3, 10, A=A, B=B)
    cfg = ipm.IPMConfig(k_max=30, mu_tol=1e-8)

    # batch of 4 instances with scaled b (different convergence speeds)
    scales = jnp.array([1.0, 0.5, 0.25, 1.2], dtype=qp.b.dtype)
    qps = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (4,) + x.shape), qp
    )
    import dataclasses as dc
    qps = dc.replace(qps, b=qp.b[None] * scales[:, None, None])

    batched = jax.jit(
        jax.vmap(lambda q: ipm.solve(dims, q, cfg)), static_argnums=()
    )(qps)

    for i, s in enumerate(np.asarray(scales)):
        qp_i = dc.replace(qp, b=qp.b * float(s))
        sol_i = _solve_jit(dims, qp_i, cfg)
        # batched vs single execution differ only by FP reduction order,
        # which may flip a near-tolerance convergence check by one iteration
        assert abs(int(batched.kk[i]) - int(sol_i.kk)) <= 1
        assert int(batched.status[i]) == int(sol_i.status) == 0
        np.testing.assert_allclose(
            np.asarray(batched.z[i]), np.asarray(sol_i.z), atol=1e-7
        )


@pytest.mark.parametrize(
    "name", ["ipm_newrhs_ms_nx8_nu3_N30_ngN8", "ipm_newrhs_ms_nx16_nu1_N30"]
)
def test_kkt_solve_new_rhs_matches_reference(name):
    """RTI-style warm re-solve with retained factorization: golden parity vs
    d_kkt_solve_new_rhs_res_mpc_hard_tv (mode-2 fixture: full IPM solve on
    the original b0, then one new-rhs resolve with b0 from x0*1.1)."""
    import dataclasses as dc
    import jax.numpy as jnp

    g = load_golden(name)
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

    solve_c = jax.jit(
        lambda q: ipm.solve(dims, q, cfg, return_carry=True),
    )
    sol0, carry = solve_c(qp)
    assert int(sol0.kk) == g["kk"]

    b_new = qp.b.at[0, : cfg_g["nx"]].set(jnp.asarray(g["b0_new"], qp.b.dtype))
    qp_new = dc.replace(qp, b=b_new)
    sol = jax.jit(lambda q, c: ipm.kkt_solve_new_rhs(dims, q, c))(qp_new, carry)

    # tolerance note: the resolve backsolves with the final IPM iteration's
    # barrier-weighted factor (condition ~ 1/mu ~ 1e9), which amplifies
    # f64 factorization-ordering noise to ~1e-6 in single solution entries
    NU = dims.NU
    for n in range(dims.N + 1):
        ref = np.array(g["ux"][n])
        nun, nxn = dims.nu[n], dims.nx[n]
        got = np.concatenate(
            [np.asarray(sol.z[n])[:nun], np.asarray(sol.z[n])[NU : NU + nxn]]
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5, err_msg=f"ux {n}")
    for n in range(dims.N):
        got = np.asarray(sol.pi[n])[: dims.nx[n + 1]]
        np.testing.assert_allclose(got, np.array(g["pi"][n]), rtol=1e-5, atol=1e-5)
    for n in range(dims.N + 1):
        nbn, ngn = dims.nb[n], dims.ng[n]
        if nbn + ngn == 0:
            continue
        lam_got = np.concatenate(
            [
                np.asarray(sol.lam_b[n, 0, :nbn]),
                np.asarray(sol.lam_b[n, 1, :nbn]),
                np.asarray(sol.lam_g[n, 0, :ngn]),
                np.asarray(sol.lam_g[n, 1, :ngn]),
            ]
        )
        t_got = np.concatenate(
            [
                np.asarray(sol.t_b[n, 0, :nbn]),
                np.asarray(sol.t_b[n, 1, :nbn]),
                np.asarray(sol.t_g[n, 0, :ngn]),
                np.asarray(sol.t_g[n, 1, :ngn]),
            ]
        )
        np.testing.assert_allclose(
            lam_got, np.array(g["lam"][n]), rtol=1e-5, atol=1e-7, err_msg=f"lam {n}"
        )
        np.testing.assert_allclose(
            t_got, np.array(g["t"][n]), rtol=1e-5, atol=1e-7, err_msg=f"t {n}"
        )


def test_single_newton_step_rti():
    """RTI mode (d_ip2_res_mpc_hard_tv_single_newton_step): from the
    previous solution, ONE warm Newton iteration tracks a shifted problem."""
    import dataclasses as dc
    import jax.numpy as jnp

    dims, qp = mass_spring_qp(8, 3, 10)
    # warm point with some centrality (mu ~ 1e-4): an exactly-converged
    # iterate has boundary slacks and the fraction-to-boundary blocks any
    # warm step (true of the reference too)
    cfg = ipm.IPMConfig(k_max=30, mu_tol=1e-4)
    sol0 = _solve_jit(dims, qp, cfg)
    assert int(sol0.status) == 0

    # shift the initial state slightly (new b0) and take one warm step
    b_new = qp.b.at[0].mul(1.02)
    qp_new = dc.replace(qp, b=b_new)
    cfg1 = ipm.IPMConfig(k_max=1, mu_tol=1e-10)
    sol1 = jax.jit(
        lambda q, z, p, lb, tb, lg, tg: ipm.solve_single_newton(
            dims, q, cfg1, z, p, lb, tb, lg, tg
        )
    )(qp_new, sol0.z, sol0.pi, sol0.lam_b, sol0.t_b, sol0.lam_g, sol0.t_g)
    assert int(sol1.kk) == 1

    # the warm step must reduce the KKT error on the new problem vs the
    # stale iterate (classic RTI contract); note a converged warm point has
    # boundary slacks, so one damped step contracts but cannot fully re-solve
    oh = ipm._box_onehot(qp_new)
    mu_scal = jnp.asarray(1.0 / dims.n_constr, qp.dtype)

    def kkt_err(s):
        r = ipm.compute_residuals(
            qp_new, oh, mu_scal, s.z, s.pi, s.lam_b, s.t_b, s.lam_g, s.t_g
        )
        return float(jnp.max(jnp.abs(r.rb)))

    assert kkt_err(sol1) < 0.05 * kkt_err(sol0)



@pytest.mark.parametrize("mu_switch", [0.0, 1e30])
def test_legacy_and_pure_residual_modes(mu_switch):
    """mu_switch=0 reproduces the legacy no-residual solver
    (d_ip2_mpc_hard_tv); mu_switch=inf runs residual iterations from the
    start.  Both must converge to the same optimum as the default."""
    dims, qp = mass_spring_qp(8, 3, 10)
    base = _solve_jit(dims, qp, ipm.IPMConfig(k_max=30, mu_tol=1e-9))
    cfg = ipm.IPMConfig(k_max=30, mu_tol=1e-9, mu_switch=mu_switch)
    sol = jax.jit(lambda q: ipm.solve(dims, q, cfg))(qp)
    assert int(sol.status) == 0
    np.testing.assert_allclose(
        np.asarray(sol.z), np.asarray(base.z), atol=1e-6
    )


def test_iter_ref_newton_accuracy():
    """Iterative refinement (reference ITER_REF, d_ip2_res_hard.c:48): on an
    ill-conditioned barrier Hessian in f32, the refined KKT solve must cut
    the Newton-system residual by orders of magnitude."""
    import jax.numpy as jnp

    from hpmpc_tpu.models import riccati

    dims, qp64 = mass_spring_qp(8, 3, 8, dtype=jnp.float32)
    qp = qp64
    mu_scal = 1.0 / dims.n_constr
    oh = ipm._box_onehot(qp)

    # barrier weights spanning 8 orders of magnitude (late-IPM conditioning)
    NB = dims.NB
    ramp = jnp.linspace(0.0, 8.0, (dims.N + 1) * NB, dtype=jnp.float32)
    Qx_b = (10.0 ** ramp).reshape(dims.N + 1, NB) * qp.nb_mask
    Qx_g = jnp.zeros((dims.N + 1, dims.NG), jnp.float32)
    g_eff = qp.g * qp.z_mask

    def residual_norm(iter_ref):
        bk = ipm.chain_backend(dims, qp, oh, mu_scal, iter_ref=iter_ref)
        z, pi, _ = bk.factor_solve(Qx_b, Qx_g, g_eff, qp.b)
        H_eff = ipm._build_Heff(qp, oh, Qx_b, Qx_g)
        rq, rb = riccati.kkt_residuals(H_eff, g_eff, qp.F, qp.b, z, pi, dims.NU)
        return float(
            jnp.max(jnp.abs(rq * qp.z_mask)) + jnp.max(jnp.abs(rb * qp.x_mask[1:]))
        )

    r0 = residual_norm(0)
    r2 = residual_norm(2)
    assert r2 < r0 * 1e-2, f"refinement did not help: {r0=} {r2=}"


def test_iter_ref_preserves_golden_convergence():
    """iter_ref=1 at f64 must not disturb convergence on the golden config
    (corrections are ~1e-13; solution and status unchanged at 1e-6)."""
    g = load_golden("ipm_ms_nx8_nu3_N10")
    cfg_g = g["config"]
    A, B = golden_ab(g)
    dims, qp = mass_spring_qp(
        cfg_g["nx"], cfg_g["nu"], cfg_g["N"],
        ng=cfg_g["ng"], ngN=cfg_g["ngN"], A=A, B=B,
    )
    cfg = ipm.IPMConfig(
        k_max=cfg_g["k_max"], mu0=cfg_g["mu0"],
        mu_tol=cfg_g["mu_tol"], alpha_min=cfg_g["alpha_min"], iter_ref=1,
    )
    sol = _solve_jit(dims, qp, cfg)
    assert int(sol.status) == 0
    NU = dims.NU
    for n in range(dims.N + 1):
        ref = np.array(g["ux"][n])
        nun, nxn = dims.nu[n], dims.nx[n]
        got = np.concatenate(
            [np.asarray(sol.z[n])[:nun], np.asarray(sol.z[n])[NU : NU + nxn]]
        )
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_warm_start_from_solution_converges_immediately():
    """cfg.warm_start with the cold solution's iterate (the reference's
    warm_start argument, d_ip2_res_hard.c:116) must converge in fewer
    iterations than the cold solve."""
    dims, qp = mass_spring_qp(8, 3, 10)
    cfg = ipm.IPMConfig(k_max=30, mu_tol=1e-8)
    cold = _solve_jit(dims, qp, cfg)
    wcfg = ipm.IPMConfig(k_max=30, mu_tol=1e-8, warm_start=True)
    warm = jax.jit(
        lambda q, z, pi: ipm.solve(dims, q, wcfg, z0=z, pi0=pi),
        static_argnums=(),
    )(qp, cold.z, cold.pi)
    assert int(warm.status) == 0
    assert int(warm.kk) < int(cold.kk)


def test_step_ok_divergence_guard():
    import jax.numpy as jnp

    """step_ok (shared breakdown guard): rejects non-finite mu always, and
    f32 endgame divergence (mu >10x or max-dual >30x growth from below 1e-3 — the
    (16, 3) dual-blowup mode, tools/diag_eng_resid.py); f64 and healthy
    f32 steps pass."""
    f32 = jnp.float32
    ok = ipm.step_ok
    assert not bool(ok(jnp.asarray(jnp.nan, f32), jnp.asarray(1.0, f32)))
    # the measured blowup: 1.1e-5 -> 3.0e-4 (27x)
    assert not bool(ok(jnp.asarray(3.0e-4, f32), jnp.asarray(1.1e-5, f32)))
    # healthy decrease
    assert bool(ok(jnp.asarray(1e-6, f32), jnp.asarray(1e-5, f32)))
    # early-phase increases (mu >= 1e-3) are legitimate (centering)
    assert bool(ok(jnp.asarray(1.0, f32), jnp.asarray(0.05, f32)))
    # mild late increase (< 10x) tolerated
    assert bool(ok(jnp.asarray(5e-5, f32), jnp.asarray(1e-5, f32)))
    # f64 exempt from the divergence rule
    f64 = jnp.float64
    assert bool(ok(jnp.asarray(3.0e-4, f64), jnp.asarray(1.1e-5, f64)))
    assert not bool(ok(jnp.asarray(jnp.inf, f64), jnp.asarray(1.0, f64)))


@pytest.mark.parametrize("phase", ["low", "high"])
def test_corrector_toggles_predictor_only(phase):
    """CORRECTOR_LOW/HIGH=0 (reference d_ip2_res_hard.c:51-52): the
    predictor-only variants still converge, just in more iterations,
    and their stat rows leave alpha_aff/mu_aff slots empty."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    dims, qp = mass_spring_qp(8, 3, 10)
    cfg_full = ipm.IPMConfig(k_max=40, mu_tol=1e-9)
    kw = {f"corrector_{phase}": False}
    cfg_pred = dataclasses.replace(cfg_full, **kw)

    sol_full = jax.jit(lambda q: ipm.solve(dims, q, cfg_full))(qp)
    sol_pred = jax.jit(lambda q: ipm.solve(dims, q, cfg_pred))(qp)
    assert int(sol_full.status) == 0
    assert int(sol_pred.status) == 0
    # same solution, predictor-only takes at least as many iterations
    np.testing.assert_allclose(
        np.asarray(sol_pred.z), np.asarray(sol_full.z), atol=1e-6
    )
    assert int(sol_pred.kk) >= int(sol_full.kk)
    # the skipped phase's rows have empty alpha_aff/mu_aff slots
    stat = np.asarray(sol_pred.stat)[: int(sol_pred.kk)]
    assert (stat[:, 1] == 0).any()


def test_step_ok_cumulative_anchor():
    """Round-5 anchored cumulative dual-growth guard: gradual multi-step
    climbs (~5x/step) walk through the per-step 30x gate but not the
    anchored one (VERDICT r04 Weak #3; (16,3) rel_rq blowups)."""
    import jax.numpy as jnp

    from hpmpc_tpu.models.ipm import anchor_lam_ref, step_ok

    f32 = jnp.float32
    mu_hi = jnp.asarray(1e-2, f32)
    mu_lo = jnp.asarray(5e-4, f32)
    inf = jnp.asarray(jnp.inf, f32)

    # anchor forms on the step that first lands below the floor
    ref = anchor_lam_ref(inf, mu_hi, mu_lo, jnp.asarray(2.0, f32))
    assert float(ref) == 2.0
    # and never moves afterwards
    ref2 = anchor_lam_ref(ref, mu_lo, mu_lo / 2, jnp.asarray(9.0, f32))
    assert float(ref2) == 2.0

    # gradual climb: 5x per step from 2.0 -> passes the per-step gate...
    lam = 2.0
    oks_step, oks_anchored = [], []
    mu = mu_lo
    for _ in range(4):
        lam_new = lam * 5.0
        oks_step.append(bool(step_ok(
            mu / 2, mu, jnp.asarray(lam_new, f32),
            jnp.asarray(lam, f32))))
        oks_anchored.append(bool(step_ok(
            mu / 2, mu, jnp.asarray(lam_new, f32),
            jnp.asarray(lam, f32), lam_ref=ref)))
        lam = lam_new
        mu = mu / 2
    assert all(oks_step), "per-step gate should pass gradual climbs"
    # ...but the anchored gate freezes once the total exceeds 30x
    assert oks_anchored[0] and oks_anchored[1]  # 10x, 50x? 5x,25x ok
    assert not oks_anchored[2], "125x total must trip the anchored gate"

    # healthy: duals stable near the anchor never trip; f64 exempt
    assert bool(step_ok(mu_lo, mu_lo * 2, jnp.asarray(3.0, f32),
                        jnp.asarray(2.5, f32), lam_ref=ref))
    f64 = jnp.float64
    assert bool(step_ok(jnp.asarray(1e-4, f64), jnp.asarray(1e-3, f64),
                        jnp.asarray(1e9, f64), jnp.asarray(1.0, f64),
                        lam_ref=jnp.asarray(2.0, f64)))
