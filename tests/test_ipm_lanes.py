"""Lanes-resident engine parity (interpret mode): ipm_lanes must drive the
IPM to the same iterates as the flat engine / structured solver."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from hpmpc_tpu.models import ipm
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


def _batch_qp(N=4, B=1024, ngN=0, ng=0, dtype=jnp.float32):
    dims, qp = mass_spring_qp(8, 3, N, ng=ng, ngN=ngN, dtype=dtype)
    qpb = pbatch.broadcast_qp(qp, B)
    rng = np.random.default_rng(0)
    qpb = dataclasses.replace(
        qpb,
        b=qpb.b * jnp.asarray(
            1 + 0.02 * rng.standard_normal(B), dtype
        )[:, None, None],
    )
    return dims, qpb


def _solve_lanes(dims, qpb, cfg):
    from hpmpc_tpu.models import ipm_lanes

    return jax.jit(
        lambda q: ipm_lanes.solve_batched_lanes(dims, q, cfg)
    )(qpb)


@pytest.mark.parametrize("ngN", [0, 4])
def test_lanes_engine_matches_flat_engine(interpret_pallas, monkeypatch, ngN):
    """f32, box (+ general) constraints: iterate-for-iterate agreement with
    the flat engine (same kernels under the sweeps; the step primitives
    move from XLA to Pallas — fp-order differs, so tolerances are fp32
    round-off scale, not exact).  Pinned to the 6-kernel lanes loop
    (MEGA=0) so the fallback path keeps end-to-end coverage now that
    mega is the default."""
    from hpmpc_tpu.models import ipm_fast

    monkeypatch.setenv("HPMPC_MEGA_SWEEPS", "0")
    dims, qpb = _batch_qp(ngN=ngN)
    cfg = dataclasses.replace(
        ipm.IPMConfig(k_max=3, mu_tol=1e-4), use_pallas=True
    )
    sol_f = jax.jit(
        lambda q: ipm_fast.solve_batched_flat(dims, q, cfg)
    )(qpb)
    sol_l = _solve_lanes(dims, qpb, cfg)
    assert np.mean(np.asarray(sol_f.kk) == np.asarray(sol_l.kk)) > 0.99
    same = np.asarray(sol_f.kk) == np.asarray(sol_l.kk)
    np.testing.assert_allclose(
        np.asarray(sol_l.z)[same], np.asarray(sol_f.z)[same],
        atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(sol_l.stat)[same], np.asarray(sol_f.stat)[same],
        rtol=2e-2, atol=2e-4,
    )


def test_lanes_engine_f64_matches_structured(interpret_pallas, monkeypatch):
    """f64 end-to-end (interpret mode): the lanes engine must reproduce the
    structured golden-parity solver tightly, including multipliers,
    residual norms and the status/iteration bookkeeping.  Box-only: the
    small-N mass-spring general-constraint configs are infeasible QPs
    (unreachable terminal equality — documented in tests/test_ipm.py) and
    diverge in every solver; ng coverage is the shallow test below.
    Pinned to MEGA=0 (deep f64 coverage of the 6-kernel fallback; the
    mega twin is test_lanes_engine_mega_f64_matches_structured)."""
    monkeypatch.setenv("HPMPC_MEGA_SWEEPS", "0")
    dims, qpb = _batch_qp(N=5, ngN=0, dtype=jnp.float64)
    cfg = ipm.IPMConfig(k_max=12, mu_tol=1e-10)
    sol_x = jax.jit(
        lambda q: jax.vmap(lambda qq: ipm.solve(dims, qq, cfg))(q)
    )(qpb)
    cfg_l = dataclasses.replace(cfg, use_pallas=True)
    sol_l = _solve_lanes(dims, qpb, cfg_l)
    assert bool(jnp.all(sol_x.kk == sol_l.kk))
    assert bool(jnp.all(sol_x.status == sol_l.status))
    np.testing.assert_allclose(
        np.asarray(sol_l.z), np.asarray(sol_x.z), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(sol_l.pi), np.asarray(sol_x.pi), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(sol_l.lam_b), np.asarray(sol_x.lam_b), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(sol_l.t_b), np.asarray(sol_x.t_b), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(sol_l.inf_norm_res), np.asarray(sol_x.inf_norm_res),
        rtol=1e-3, atol=1e-9,
    )


def test_lanes_engine_f64_ng_shallow(interpret_pallas):
    """f64 with active general constraints, shallow iteration budget (the
    deep run is infeasible by construction): iterate-for-iterate stat
    parity against the structured solver."""
    dims, qpb = _batch_qp(N=3, ngN=4, dtype=jnp.float64)
    cfg = ipm.IPMConfig(k_max=4, mu_tol=1e-10)
    sol_x = jax.jit(
        lambda q: jax.vmap(lambda qq: ipm.solve(dims, qq, cfg))(q)
    )(qpb)
    cfg_l = dataclasses.replace(cfg, use_pallas=True)
    sol_l = _solve_lanes(dims, qpb, cfg_l)
    assert bool(jnp.all(sol_x.kk == sol_l.kk))
    np.testing.assert_allclose(
        np.asarray(sol_l.stat), np.asarray(sol_x.stat),
        rtol=1e-6, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(sol_l.z), np.asarray(sol_x.z), atol=1e-7
    )


def test_lanes_engine_tv_sizes(interpret_pallas):
    """Ragged per-stage nx/nu/nb (masked padding, stages with zero box
    constraints): the SMEM index table and mask streams must reproduce
    the structured solver exactly at f64."""
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_tv_sizes import _tv_problem

    dims, qp = _tv_problem()
    qpb = pbatch.broadcast_qp(qp, 1024)
    rng = np.random.default_rng(0)
    qpb = dataclasses.replace(
        qpb,
        b=qpb.b * jnp.asarray(
            1 + 0.02 * rng.standard_normal(1024), qpb.b.dtype
        )[:, None, None],
    )
    cfg = ipm.IPMConfig(k_max=12, mu_tol=1e-10)
    sol_x = jax.jit(
        lambda q: jax.vmap(lambda qq: ipm.solve(dims, qq, cfg))(q)
    )(qpb)
    cfg_l = dataclasses.replace(cfg, use_pallas=True)
    sol_l = _solve_lanes(dims, qpb, cfg_l)
    assert bool(jnp.all(sol_x.kk == sol_l.kk))
    zm = np.asarray(qpb.z_mask)
    np.testing.assert_allclose(
        np.asarray(sol_l.z) * zm, np.asarray(sol_x.z) * zm, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(sol_l.stat), np.asarray(sol_x.stat),
        rtol=1e-6, atol=1e-12,
    )


def test_lanes_engine_dispatch_knob(interpret_pallas, monkeypatch):
    """HPMPC_LANES_LOOP=1 routes solve_batched to the lanes engine."""
    import hpmpc_tpu.models.ipm_lanes as ipm_lanes

    called = {}
    orig = ipm_lanes.solve_batched_lanes

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(ipm_lanes, "solve_batched_lanes", spy)
    monkeypatch.setenv("HPMPC_LANES_LOOP", "1")
    dims, qpb = _batch_qp(N=3)
    cfg = dataclasses.replace(
        ipm.IPMConfig(k_max=2, mu_tol=1e-4), use_pallas=True
    )
    sol = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg))(qpb)
    assert called.get("yes")
    assert np.isfinite(np.asarray(sol.z)).all()


@pytest.mark.parametrize("ngN", [0, 4])
def test_lanes_engine_mega_sweeps_flag(interpret_pallas, monkeypatch, ngN):
    """HPMPC_MEGA_SWEEPS=1 routes each half-iteration through one
    mega-sweep pallas_call; iterates must match the 6-kernel lanes path
    (sol_ref pinned to MEGA=0 — mega is the default, so an unpinned
    reference would compare mega against itself)."""
    dims, qpb = _batch_qp(N=4, ngN=ngN)
    cfg = dataclasses.replace(
        ipm.IPMConfig(k_max=3, mu_tol=1e-4), use_pallas=True
    )
    monkeypatch.setenv("HPMPC_MEGA_SWEEPS", "0")
    sol_ref = _solve_lanes(dims, qpb, cfg)
    monkeypatch.setenv("HPMPC_MEGA_SWEEPS", "1")
    import hpmpc_tpu.ops.mega_kernel as mk

    called = {}
    orig = mk.factor_solve_mega

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(mk, "factor_solve_mega", spy)
    sol_m = _solve_lanes(dims, qpb, cfg)
    assert called.get("yes"), "mega path did not run"
    assert np.mean(np.asarray(sol_ref.kk) == np.asarray(sol_m.kk)) > 0.99
    same = np.asarray(sol_ref.kk) == np.asarray(sol_m.kk)
    np.testing.assert_allclose(
        np.asarray(sol_m.z)[same], np.asarray(sol_ref.z)[same],
        rtol=1e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(sol_m.stat)[same], np.asarray(sol_ref.stat)[same],
        rtol=2e-2, atol=2e-4,
    )


def test_lanes_engine_mega_f64_matches_structured(interpret_pallas,
                                                  monkeypatch):
    """Mega path at f64 must still reproduce the structured solver
    (kk, status, solution) on the converging box problem."""
    monkeypatch.setenv("HPMPC_MEGA_SWEEPS", "1")
    dims, qpb = _batch_qp(N=5, ngN=0, dtype=jnp.float64)
    cfg = ipm.IPMConfig(k_max=12, mu_tol=1e-10)
    sol_x = jax.jit(
        lambda q: jax.vmap(lambda qq: ipm.solve(dims, qq, cfg))(q)
    )(qpb)
    cfg_l = dataclasses.replace(cfg, use_pallas=True)
    sol_l = _solve_lanes(dims, qpb, cfg_l)
    assert bool(jnp.all(sol_x.kk == sol_l.kk))
    assert bool(jnp.all(sol_x.status == sol_l.status))
    np.testing.assert_allclose(
        np.asarray(sol_l.z), np.asarray(sol_x.z), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(sol_l.pi), np.asarray(sol_x.pi), atol=1e-7
    )


def test_lanes_engine_mega_phase2_ng(interpret_pallas, monkeypatch):
    """Phase 2 with active general constraints through the mega path
    (mu_switch=1e9 skips phase 1 entirely), vs the 6-kernel lanes path
    (sol_ref pinned to MEGA=0)."""
    dims, qpb = _batch_qp(N=4, ngN=4)
    cfg = dataclasses.replace(
        ipm.IPMConfig(k_max=3, mu_tol=1e-4, mu_switch=1e9),
        use_pallas=True,
    )
    monkeypatch.setenv("HPMPC_MEGA_SWEEPS", "0")
    sol_ref = _solve_lanes(dims, qpb, cfg)
    monkeypatch.setenv("HPMPC_MEGA_SWEEPS", "1")
    sol_m = _solve_lanes(dims, qpb, cfg)
    assert np.mean(np.asarray(sol_ref.kk) == np.asarray(sol_m.kk)) > 0.99
    same = np.asarray(sol_ref.kk) == np.asarray(sol_m.kk)
    np.testing.assert_allclose(
        np.asarray(sol_m.z)[same], np.asarray(sol_ref.z)[same],
        rtol=1e-3, atol=2e-3,
    )


def test_solve_single_latency_path(interpret_pallas, monkeypatch):
    """parallel/batch.solve_single pads one instance into a 1024-lane
    block, rides the mega engine, and returns lane 0 — must agree with
    the structured single-instance solve (the deployment latency path,
    tools/bench_latency.py 'mega_block')."""
    import hpmpc_tpu.models.ipm_lanes as ipm_lanes

    called = {}
    orig = ipm_lanes.solve_batched_lanes

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(ipm_lanes, "solve_batched_lanes", spy)
    dims, qp = mass_spring_qp(8, 3, 4, dtype=jnp.float32)
    cfg = ipm.IPMConfig(k_max=3, mu_tol=1e-4)
    cfg_p = dataclasses.replace(cfg, use_pallas=True)
    sol_1 = jax.jit(lambda q: pbatch.solve_single(dims, q, cfg_p))(qp)
    assert called.get("yes"), "latency path did not take the fast engine"
    sol_s = jax.jit(lambda q: ipm.solve(dims, q, cfg))(qp)
    assert int(sol_1.kk) == int(sol_s.kk)
    np.testing.assert_allclose(
        np.asarray(sol_1.z), np.asarray(sol_s.z), atol=2e-3
    )


@pytest.mark.parametrize("ngN", [0, 4])
def test_lanes_iter_ref_matches_flat_iter_ref(interpret_pallas,
                                              monkeypatch, ngN):
    """cfg.iter_ref through the lanes engine (round-5 stage-2 path:
    ONE fused pallas_call per refinement pass, incl. its in-kernel
    C-row barrier fold when general constraints are active) == the flat
    engine's proven newton_refine, iterate for iterate.  6-kernel lanes
    loop (refinement forces non-mega halves)."""
    from hpmpc_tpu.models import ipm_fast

    dims, qpb = _batch_qp(ngN=ngN)
    cfg = dataclasses.replace(
        ipm.IPMConfig(k_max=3, mu_tol=1e-4, iter_ref=2), use_pallas=True
    )
    sol_f = jax.jit(
        lambda q: ipm_fast.solve_batched_flat(dims, q, cfg)
    )(qpb)
    sol_l = _solve_lanes(dims, qpb, cfg)
    assert np.mean(np.asarray(sol_f.kk) == np.asarray(sol_l.kk)) > 0.99
    same = np.asarray(sol_f.kk) == np.asarray(sol_l.kk)
    np.testing.assert_allclose(
        np.asarray(sol_l.z)[same], np.asarray(sol_f.z)[same], atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(sol_l.stat)[same], np.asarray(sol_f.stat)[same],
        rtol=2e-2, atol=2e-4,
    )


def test_lanes_state0_stage2_matches_flat_stage2(interpret_pallas,
                                                 monkeypatch):
    """The two-stage handoff with the lanes engine as stage 2
    (HPMPC_STAGE2_LANES default): same stage-1 state fed to both stage-2
    engines must yield the same final iterates, kk continuation and
    mu-gated refinement behavior."""
    from hpmpc_tpu.models import ipm_fast, ipm_lanes

    dims, qpb = _batch_qp(ngN=4)
    K = 6
    cfg = dataclasses.replace(
        ipm.IPMConfig(k_max=K, mu_tol=0.0, iter_ref=2,
                      iter_ref_mu_thr=1e-2),
        use_pallas=True,
    )
    cfg1 = dataclasses.replace(cfg, iter_ref=0, mu_tol=1e-2)
    sol1 = _solve_lanes(dims, qpb, cfg1)
    sol_f = jax.jit(
        lambda q: ipm_fast.solve_batched_flat(dims, q, cfg, state0=sol1)
    )(qpb)
    sol_l = jax.jit(
        lambda q: ipm_lanes.solve_batched_lanes(dims, q, cfg,
                                                state0=sol1)
    )(qpb)
    assert int(np.max(np.asarray(sol_l.kk))) <= K
    assert np.mean(np.asarray(sol_f.kk) == np.asarray(sol_l.kk)) > 0.99
    same = np.asarray(sol_f.kk) == np.asarray(sol_l.kk)
    np.testing.assert_allclose(
        np.asarray(sol_l.z)[same], np.asarray(sol_f.z)[same], atol=2e-3
    )
    # the carried stat rows (stage-1 iterations) must be identical
    k1 = int(np.min(np.asarray(sol1.kk)))
    np.testing.assert_allclose(
        np.asarray(sol_l.stat)[:, :k1], np.asarray(sol1.stat)[:, :k1],
        atol=1e-6,
    )
