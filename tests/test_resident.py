"""Solver-resident (giga) engine parity (interpret mode on CPU): the
whole-IPM-in-one-pallas_call engine must reproduce the lanes engine run
in its phase-1-only configuration (mu_switch pinned to mu_tol — the
reference's legacy d_ip2_hard semantics) iterate-for-iterate."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from hpmpc_tpu.models import ipm, ipm_lanes, ipm_resident
from hpmpc_tpu.parallel import batch as pbatch
from hpmpc_tpu.utils.mass_spring import mass_spring_qp


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    yield


def _batch_qp(N=4, B=1024, dtype=jnp.float32):
    dims, qp = mass_spring_qp(8, 3, N, dtype=dtype)
    qpb = pbatch.broadcast_qp(qp, B)
    rng = np.random.default_rng(0)
    qpb = dataclasses.replace(
        qpb,
        b=qpb.b * jnp.asarray(
            1 + 0.02 * rng.standard_normal(B), dtype
        )[:, None, None],
    )
    return dims, qpb


def _lanes_phase1_only(dims, qpb, cfg):
    """Lanes engine pinned to the same legacy semantics: phase 1 to
    mu_tol (mu_switch == mu_tol -> phase 2 predicate is false)."""
    cfg1 = dataclasses.replace(cfg, mu_switch=cfg.mu_tol)
    return jax.jit(
        lambda q: ipm_lanes.solve_batched_lanes(dims, q, cfg1)
    )(qpb)


def test_resident_matches_lanes_phase1(interpret_pallas, monkeypatch):
    monkeypatch.setenv("HPMPC_MEGA_SWEEPS", "0")
    dims, qpb = _batch_qp()
    cfg = dataclasses.replace(
        ipm.IPMConfig(k_max=3, mu_tol=1e-4), use_pallas=True
    )
    sol_r = jax.jit(
        lambda q: ipm_resident.solve_batched_resident(dims, q, cfg)
    )(qpb)
    sol_l = _lanes_phase1_only(dims, qpb, cfg)

    np.testing.assert_array_equal(np.asarray(sol_r.kk),
                                  np.asarray(sol_l.kk))
    np.testing.assert_allclose(
        np.asarray(sol_r.z), np.asarray(sol_l.z), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(sol_r.pi), np.asarray(sol_l.pi), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(sol_r.lam_b), np.asarray(sol_l.lam_b),
        rtol=5e-3, atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(sol_r.t_b), np.asarray(sol_l.t_b),
        rtol=5e-3, atol=5e-3,
    )
    # per-iteration stat rows (sigma, alphas, mus) — all lanes live at
    # k_max=3, so iteration-indexed rows == kk-indexed rows
    np.testing.assert_allclose(
        np.asarray(sol_r.stat), np.asarray(sol_l.stat),
        rtol=2e-2, atol=2e-4,
    )
    # residual norms from the same kernel on near-identical iterates
    np.testing.assert_allclose(
        np.asarray(sol_r.inf_norm_res), np.asarray(sol_l.inf_norm_res),
        rtol=5e-2, atol=5e-3,
    )


def test_resident_early_stop_freeze(interpret_pallas, monkeypatch):
    """With a loose mu_tol some instances converge before k_max: the
    resident engine's per-lane update gating must reproduce the lanes
    engine's while-loop exit (same kk, same frozen iterate)."""
    monkeypatch.setenv("HPMPC_MEGA_SWEEPS", "0")
    dims, qpb = _batch_qp(N=3)
    cfg = dataclasses.replace(
        ipm.IPMConfig(k_max=8, mu_tol=5e-3), use_pallas=True
    )
    sol_r = jax.jit(
        lambda q: ipm_resident.solve_batched_resident(dims, q, cfg)
    )(qpb)
    sol_l = _lanes_phase1_only(dims, qpb, cfg)
    kk_r, kk_l = np.asarray(sol_r.kk), np.asarray(sol_l.kk)
    assert np.mean(kk_r == kk_l) > 0.99, (kk_r[:8], kk_l[:8])
    assert kk_r.max() < 8, "expected early convergence in this test"
    same = kk_r == kk_l
    np.testing.assert_allclose(
        np.asarray(sol_r.z)[same], np.asarray(sol_l.z)[same], atol=2e-3
    )
    # converged instances report status 0
    assert np.all(np.asarray(sol_r.status)[same]
                  == np.asarray(sol_l.status)[same])


def test_resident_stage1_two_stage_parity(interpret_pallas, monkeypatch):
    """bench.py's parity line under HPMPC_RESIDENT=1: the resident engine
    runs stage 1 (phase-1 to mu <= iter_ref_mu_thr), hands its full
    primal-dual state to the flat engine, which finishes with mu-gated
    ITER_REF — final controls must hold <=1e-6 f64 parity, iteration
    budget respected across the handoff (dispatch: parallel/batch.py)."""
    monkeypatch.setenv("HPMPC_RESIDENT", "1")
    K = 6
    dims, qpb = _batch_qp()
    qpb64 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float64)
        if x.dtype == jnp.float32 else x, qpb
    )
    sol64 = jax.jit(lambda q: pbatch.solve_batched(
        dims, q, ipm.IPMConfig(k_max=K, mu_tol=0.0)))(qpb64)
    cfg = ipm.IPMConfig(k_max=K, mu_tol=0.0, iter_ref=1,
                        iter_ref_mu_thr=1e-3, use_pallas=True)
    sol = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg))(qpb)
    assert int(np.max(np.asarray(sol.kk))) <= K
    u_cols = slice(0, dims.NU)
    err = np.max(np.abs(
        np.asarray(sol.z, np.float64)[:, :, u_cols]
        - np.asarray(sol64.z, np.float64)[:, :, u_cols]))
    assert err <= 1e-6, f"resident-stage1 control error {err:.2e}"


def test_resident_matches_lanes_phase1_ng(interpret_pallas, monkeypatch):
    """General constraints through the resident kernel (in-kernel C-row
    barrier fold / corrector / alpha contributions on the static active
    stages) vs the lanes engine in the same phase-1-only config."""
    monkeypatch.setenv("HPMPC_MEGA_SWEEPS", "0")
    dims, qp = mass_spring_qp(8, 3, 4, ngN=4, dtype=jnp.float32)
    qpb = pbatch.broadcast_qp(qp, 1024)
    rng = np.random.default_rng(0)
    qpb = dataclasses.replace(
        qpb,
        b=qpb.b * jnp.asarray(
            1 + 0.02 * rng.standard_normal(1024), jnp.float32
        )[:, None, None],
    )
    cfg = dataclasses.replace(
        ipm.IPMConfig(k_max=3, mu_tol=1e-4), use_pallas=True
    )
    sol_r = jax.jit(
        lambda q: ipm_resident.solve_batched_resident(dims, q, cfg)
    )(qpb)
    sol_l = _lanes_phase1_only(dims, qpb, cfg)
    np.testing.assert_array_equal(np.asarray(sol_r.kk),
                                  np.asarray(sol_l.kk))
    np.testing.assert_allclose(
        np.asarray(sol_r.z), np.asarray(sol_l.z), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(sol_r.lam_g), np.asarray(sol_l.lam_g),
        rtol=5e-3, atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(sol_r.stat), np.asarray(sol_l.stat),
        rtol=2e-2, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(sol_r.inf_norm_res), np.asarray(sol_l.inf_norm_res),
        rtol=5e-2, atol=5e-3,
    )
