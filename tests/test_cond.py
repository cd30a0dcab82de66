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
