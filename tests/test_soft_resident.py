"""Soft solver-resident engine parity (interpret mode on CPU): the
whole-soft-IPM-in-one-pallas_call engine must reproduce the soft lanes
engine iterate-for-iterate.  No semantics pinning is needed — the soft
solver is single-phase, so the resident contract IS the engine ladder's."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from hpmpc_tpu.models import ipm
from hpmpc_tpu.utils.mass_spring import mass_spring_soft_qp


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    yield


def _soft_batch(B=1024, seed=5):
    dims, qp, soft = mass_spring_soft_qp(8, 3, 5, Z=10.0,
                                         dtype=jnp.float32)
    qps = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), qp
    )
    softs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), soft
    )
    rng = np.random.default_rng(seed)
    qps = dataclasses.replace(
        qps,
        g=qps.g * jnp.asarray(
            1 + 0.02 * rng.standard_normal(B), jnp.float32
        )[:, None, None],
    )
    return dims, qps, softs, np.asarray(soft.idxbs)


@pytest.mark.parametrize("exact", [True, False])
def test_soft_resident_matches_soft_lanes(interpret_pallas, monkeypatch,
                                          exact):
    from hpmpc_tpu.models import ipm_soft_lanes, ipm_soft_resident

    monkeypatch.setenv("HPMPC_MEGA_SWEEPS", "0")
    dims, qps, softs, idxbs = _soft_batch()
    idxbs_t = tuple(tuple(int(i) for i in row) for row in idxbs)
    cfg = ipm.IPMConfig(k_max=3, mu0=100.0, mu_tol=1e-5)
    sol_l = jax.jit(
        lambda q, s: ipm_soft_lanes.solve_batched_soft_lanes(
            dims, q, s, cfg, idxbs_t, exact_mehrotra_soft=exact
        )
    )(qps, softs)
    sol_r = jax.jit(
        lambda q, s: ipm_soft_resident.solve_batched_soft_resident(
            dims, q, s, cfg, idxbs_t, exact_mehrotra_soft=exact
        )
    )(qps, softs)

    assert np.mean(np.asarray(sol_r.kk) == np.asarray(sol_l.kk)) > 0.99
    same = np.asarray(sol_r.kk) == np.asarray(sol_l.kk)
    np.testing.assert_allclose(
        np.asarray(sol_r.z)[same], np.asarray(sol_l.z)[same],
        rtol=1e-4, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(sol_r.lam_s)[same], np.asarray(sol_l.lam_s)[same],
        rtol=1e-3, atol=5e-3,
    )
    # per-iteration stat rows (sigma, alphas, mus) agree
    np.testing.assert_allclose(
        np.asarray(sol_r.stat)[same], np.asarray(sol_l.stat)[same],
        rtol=2e-3, atol=2e-4,
    )


def test_soft_resident_converges(interpret_pallas, monkeypatch):
    """Run closer to convergence: statuses 0, small duality measures."""
    from hpmpc_tpu.models import ipm_soft_resident

    dims, qps, softs, idxbs = _soft_batch(seed=9)
    idxbs_t = tuple(tuple(int(i) for i in row) for row in idxbs)
    cfg = ipm.IPMConfig(k_max=12, mu0=100.0, mu_tol=1e-4)
    sol = jax.jit(
        lambda q, s: ipm_soft_resident.solve_batched_soft_resident(
            dims, q, s, cfg, idxbs_t
        )
    )(qps, softs)
    # ~1.7% of instances legitimately freeze at the f32 floor (mu ~1e-4
    # with a >10x jump next step) — IDENTICAL between soft lanes and
    # resident (debug run 2026-08-20: lanes 1005/1024 vs resident
    # 1007/1024 converged, matching worst-instance traces)
    assert float(np.mean(np.asarray(sol.status) == 0)) > 0.97
