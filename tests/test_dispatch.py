"""Unit tests of the hard-path engine dispatch rule
(parallel.batch.select_engine) — the single source of truth bench.py
stamps into its JSON lines.  Pure rule tests: no kernels execute."""

import dataclasses

import jax.numpy as jnp
import pytest

from hpmpc_tpu.models import ipm
from hpmpc_tpu.parallel import batch as pbatch
from hpmpc_tpu.utils.mass_spring import mass_spring_qp


@pytest.fixture
def dims():
    d, _ = mass_spring_qp(8, 3, 30, ngN=8, dtype=jnp.float32)
    return d


@pytest.fixture(autouse=True)
def _default_env(monkeypatch):
    """The dispatch defaults under test are the SHIPPED defaults."""
    for k in ("HPMPC_RESIDENT", "HPMPC_LANES_LOOP", "HPMPC_MEGA_SWEEPS"):
        monkeypatch.delenv(k, raising=False)


def _cfg(**kw):
    base = dict(k_max=8, mu_tol=0.0, alpha_min=1e-8, use_pallas=True)
    base.update(kw)
    return ipm.IPMConfig(**base)


def test_default_full_accuracy_config_rides_lanes(dims):
    # mu_tol=0 < mu_switch: phase 2 may engage -> resident's legacy
    # semantics do NOT coincide; the lanes/mega engine is the default
    assert pbatch.select_engine(dims, _cfg(), 1024, jnp.float32) == "lanes"


def test_legacy_semantics_ride_resident(dims):
    # mu_switch <= mu_tol: the 2-phase solver provably never leaves
    # phase 1 -> the resident engine is the default (bench.py headline)
    assert pbatch.select_engine(
        dims, _cfg(mu_switch=0.0), 1024, jnp.float32) == "resident"
    assert pbatch.select_engine(
        dims, _cfg(mu_tol=1e-4), 1024, jnp.float32) == "resident"


def test_env_knobs_override(dims, monkeypatch):
    monkeypatch.setenv("HPMPC_RESIDENT", "0")
    assert pbatch.select_engine(
        dims, _cfg(mu_switch=0.0), 1024, jnp.float32) == "lanes"
    monkeypatch.setenv("HPMPC_LANES_LOOP", "0")
    assert pbatch.select_engine(
        dims, _cfg(mu_switch=0.0), 1024, jnp.float32) == "flat"


def test_two_stage_parity_route(dims):
    cfg = _cfg(iter_ref=2, iter_ref_mu_thr=1e-2)
    # stage-1 target (1e-2) is above mu_switch -> resident serves stage 1
    assert pbatch.select_engine(
        dims, cfg, 4096, jnp.float32) == "two_stage_resident"


def test_two_stage_lanes_when_resident_off(dims, monkeypatch):
    monkeypatch.setenv("HPMPC_RESIDENT", "0")
    cfg = _cfg(iter_ref=2, iter_ref_mu_thr=1e-2)
    assert pbatch.select_engine(
        dims, cfg, 4096, jnp.float32) == "two_stage_lanes"


def test_iter_ref_without_threshold_rides_flat(dims):
    cfg = _cfg(iter_ref=2)
    assert pbatch.select_engine(dims, cfg, 1024, jnp.float32) == "flat"


def test_off_multiple_and_f64_fall_to_structured(dims):
    assert pbatch.select_engine(dims, _cfg(), 1000, jnp.float32) == \
        "structured"
    # f64 batches: mixed-precision mode stays on the flat engine
    assert pbatch.select_engine(dims, _cfg(), 1024, jnp.float64) == "flat"


def test_large_sizes_fall_to_structured():
    d, _ = mass_spring_qp(64, 8, 30, dtype=jnp.float32)
    assert pbatch.select_engine(d, _cfg(), 1024, jnp.float32) == \
        "structured"


def test_chunking_rule():
    assert pbatch._pick_chunk(4096) is None
    assert pbatch._pick_chunk(8192) == 4096
    assert pbatch._pick_chunk(6144) == 2048
    assert pbatch._pick_chunk(5120) == 1024
    assert pbatch._pick_chunk(1024) is None


def test_chunked_solve_matches_unchunked(monkeypatch):
    """B > CHUNK_B sweeps through the engines via lax.map in chunks;
    results must equal the single-pass engine solve bit-for-bit
    (interpret mode; CHUNK_B shrunk so the test stays small)."""
    import dataclasses as dc

    import jax
    import numpy as np
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setenv("HPMPC_LANES_LOOP", "0")
    monkeypatch.setenv("HPMPC_MEGA_SWEEPS", "0")

    dims, qp = mass_spring_qp(8, 3, 4, dtype=jnp.float32)
    B = 2048
    qpb = pbatch.broadcast_qp(qp, B)
    rng = __import__("numpy").random.default_rng(11)
    qpb = dc.replace(
        qpb,
        b=qpb.b * jnp.asarray(
            1 + 0.02 * rng.standard_normal(B), jnp.float32)[:, None, None],
    )
    cfg = _cfg(k_max=2)
    sol_one = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg))(qpb)

    monkeypatch.setattr(pbatch, "CHUNK_B", 1024)
    assert pbatch._pick_chunk(B) == 1024
    sol_ch = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg))(qpb)

    np.testing.assert_array_equal(np.asarray(sol_ch.z),
                                  np.asarray(sol_one.z))
    np.testing.assert_array_equal(np.asarray(sol_ch.kk),
                                  np.asarray(sol_one.kk))


def test_nz_crossover_fence_band(monkeypatch):
    """Measured v5e crossover BAND (round 5): the lanes/mega route loses
    to flat at NZ=19 (-22%, nx=16 nu=3) and NZ=22 (-12%, nx=18 nu=4) but
    wins at NZ=17 and NZ=24 — the default dispatch rides flat on 19..22,
    and an explicit HPMPC_MEGA_SWEEPS=1 A/B still overrides."""
    cfg = _cfg()
    for nx, nu, nz, want in ((16, 3, 19, "flat"), (18, 4, 22, "flat"),
                             (16, 1, 17, "lanes"), (20, 4, 24, "lanes")):
        d, _ = mass_spring_qp(nx, nu, 30, dtype=jnp.float32)
        assert d.NZ == nz
        assert pbatch.select_engine(d, cfg, 1024, jnp.float32) == want, nz
    d19, _ = mass_spring_qp(16, 3, 30, dtype=jnp.float32)
    monkeypatch.setenv("HPMPC_MEGA_SWEEPS", "1")
    assert pbatch.select_engine(d19, cfg, 1024, jnp.float32) == "lanes"


def test_escalate_stalled_structured_path():
    """IPMConfig.escalate_stalled: stalled f32 instances are re-solved in
    mixed/f64 precision and merged per-instance; f32-converged instances
    pass through bit-unchanged.  Structured (vmap) path — the engine
    twin runs in tests/test_ipm_lanes.py's interpret suite."""
    import jax
    import numpy as np

    d, qp = mass_spring_qp(16, 1, 10, dtype=jnp.float32)
    qpb = pbatch.broadcast_qp(qp, 64)
    rng = np.random.default_rng(0)
    qpb = dataclasses.replace(
        qpb,
        b=qpb.b * jnp.asarray(
            1 + 0.02 * rng.standard_normal(64), jnp.float32
        )[:, None, None],
    )
    cfg = ipm.IPMConfig(k_max=30, mu_tol=1e-3, alpha_min=1e-8)
    sol = jax.jit(lambda q: pbatch.solve_batched(d, q, cfg))(qpb)
    cfg_e = dataclasses.replace(cfg, escalate_stalled=True)
    sol_e = jax.jit(lambda q: pbatch.solve_batched(d, q, cfg_e))(qpb)
    st = np.asarray(sol.status)
    st_e = np.asarray(sol_e.status)
    # escalation can only improve convergence
    assert (st_e == 0).sum() >= (st == 0).sum()
    # f32-converged instances are untouched
    ok = st == 0
    np.testing.assert_array_equal(
        np.asarray(sol_e.z)[ok], np.asarray(sol.z)[ok])
    # f64 anchor: escalated conv must match full-f64 conv on this batch
    qp64 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float64)
        if x.dtype == jnp.float32 else x, qpb)
    sol64 = jax.jit(lambda q: pbatch.solve_batched(d, q, cfg))(qp64)
    st64 = np.asarray(sol64.status)
    assert (st_e == 0).sum() >= (st64 == 0).sum() - 1  # near-exact match
