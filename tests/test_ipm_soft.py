"""Soft-constraint IPM tests vs d_ip2_mpc_soft_tv golden fixtures.

Parity scope note: the reference's soft corrector writes its gradient
correction through a stale pointer (d_aux_ip_soft_lib4.c:557/:601), which
both drops the correction AND corrupts a neighboring workspace array
(the qx[N] overflow lands on stage-1's Zl inside the same iteration's
corrector — verified by matching the write offsets against the workspace
layout in d_ip2_soft.c:243-256), i.e. undefined behavior whose effect
depends on padding alignments.  Its exact iteration path is therefore not
reproducible by a correct implementation.  We assert instead:
  * the iteration-0 AFFINE trace (sigma, alpha_aff, mu_aff) matches
    exactly — validating init, the soft Schur elimination fold, Riccati,
    fraction-to-boundary and mu machinery end to end (the corrector
    entries are the ones polluted by the reference's UB);
  * the final solution matches the reference's converged optimum;
  * our (correct) Mehrotra correction converges in FEWER iterations.
"""

import jax
import numpy as np
import pytest

from conftest import golden_ab, load_golden
from hpmpc_tpu.models import ipm, ipm_soft
from hpmpc_tpu.utils.mass_spring import mass_spring_soft_qp


def _setup(name):
    g = load_golden(name)
    cfg_g = g["config"]
    A, B = golden_ab(g)
    dims, qp, soft = mass_spring_soft_qp(
        cfg_g["nx"], cfg_g["nu"], cfg_g["N"],
        Z=cfg_g["Z"], z_lin=cfg_g["zlin"], A=A, B=B,
    )
    cfg = ipm.IPMConfig(
        k_max=cfg_g["k_max"], mu0=cfg_g["mu0"],
        mu_tol=cfg_g["mu_tol"], alpha_min=cfg_g["alpha_min"],
    )
    return g, dims, qp, soft, cfg


FIXTURES = ["ipm_soft_ms_nx8_nu3_N30_Z0", "ipm_soft_ms_nx8_nu3_N30_Z10"]


@pytest.mark.parametrize("name", FIXTURES)
def test_soft_ipm_first_iteration_affine_trace_matches(name):
    g, dims, qp, soft, cfg = _setup(name)
    sol = jax.jit(lambda q, s: ipm_soft.solve(dims, q, s, cfg))(qp, soft)
    stat_ref = np.array(g["stat"]).reshape(-1, 5)[0][:3]
    stat_got = np.asarray(sol.stat)[0][:3]
    np.testing.assert_allclose(stat_got, stat_ref, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("name", FIXTURES)
def test_soft_ipm_solution_parity_and_fewer_iterations(name):
    g, dims, qp, soft, cfg = _setup(name)
    sol = jax.jit(lambda q, s: ipm_soft.solve(dims, q, s, cfg))(qp, soft)
    assert int(sol.status) == 0
    assert int(sol.kk) <= g["kk"]

    NU = dims.NU
    for n in range(dims.N + 1):
        ref = np.array(g["ux"][n])
        nun, nxn = dims.nu[n], dims.nx[n]
        got = np.concatenate(
            [np.asarray(sol.z[n])[:nun], np.asarray(sol.z[n])[NU : NU + nxn]]
        )
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=5e-5, err_msg=f"ux {n}")
    for n in range(dims.N):
        got = np.asarray(sol.pi[n])[: dims.nx[n + 1]]
        np.testing.assert_allclose(
            got, np.array(g["pi"][n]), rtol=1e-3, atol=1e-4, err_msg=f"pi {n}"
        )
    # multipliers split non-uniquely at soft-constraint kinks
    # (lam_bound + lam_pos = z_lin has a one-parameter family when the
    # slack sits exactly at a breakpoint), so instead of elementwise dual
    # parity we verify the soft KKT conditions of OUR solution:
    # slack stationarity Z*s + z_lin - lam_bound - lam_pos = 0 and
    # complementarity lam*t <= ~mu_tol on every valid slot.
    ms = np.asarray(soft.ns_mask)
    Zq = np.asarray(soft.Z)
    zq = np.asarray(soft.z_lin)
    lam_s = np.asarray(sol.lam_s)
    t_s = np.asarray(sol.t_s)
    s_lo = t_s[:, 2]  # slack variable values
    s_up = t_s[:, 3]
    stat_lo = (Zq[:, 0] * s_lo + zq[:, 0] - lam_s[:, 0] - lam_s[:, 2]) * ms
    stat_up = (Zq[:, 1] * s_up + zq[:, 1] - lam_s[:, 1] - lam_s[:, 3]) * ms
    np.testing.assert_allclose(stat_lo, 0.0, atol=1e-5)
    np.testing.assert_allclose(stat_up, 0.0, atol=1e-5)
    comp = np.abs(lam_s * t_s * ms[:, None, :])
    assert comp.max() < 1e-5


def test_soft_ipm_exact_mehrotra_converges_strictly_faster():
    g, dims, qp, soft, cfg = _setup("ipm_soft_ms_nx8_nu3_N30_Z0")
    sol = jax.jit(lambda q, s: ipm_soft.solve(dims, q, s, cfg))(qp, soft)
    assert int(sol.status) == 0
    assert int(sol.kk) < g["kk"]  # 13 vs the reference's 18


def test_soft_ipm_slack_semantics():
    """Soft bounds are violated only where the hard problem would be
    infeasible, and the slack values (t_s slots 2,3) absorb the violation."""
    g, dims, qp, soft, cfg = _setup("ipm_soft_ms_nx8_nu3_N30_Z0")
    sol = jax.jit(lambda q, s: ipm_soft.solve(dims, q, s, cfg))(qp, soft)
    z = np.asarray(sol.z)
    NU = dims.NU
    # x0 = (3.5, 3.5, ...) starts outside the soft band [-1, 1]: stage-1
    # states must still violate it (|x| > 1 somewhere), paid via slack
    x1 = z[1, NU : NU + 8]
    assert np.max(np.abs(x1)) > 1.0
    s_lo = np.asarray(sol.t_s[1, 2])  # s_lo >= 0 slack values
    s_up = np.asarray(sol.t_s[1, 3])
    viol_up = np.maximum(x1 - 1.0, 0.0)
    viol_lo = np.maximum(-1.0 - x1, 0.0)
    np.testing.assert_allclose(s_up[:8], viol_up, atol=1e-5)
    np.testing.assert_allclose(s_lo[:8], viol_lo, atol=1e-5)
