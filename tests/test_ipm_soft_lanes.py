"""Soft lanes-resident engine parity (interpret mode) vs the flat soft
engine and the structured soft solver."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from hpmpc_tpu.models import ipm, ipm_soft
from hpmpc_tpu.parallel import batch as pbatch
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
    dims, qp, soft = mass_spring_soft_qp(8, 3, 5, Z=10.0, dtype=jnp.float32)
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


@pytest.mark.parametrize("mega", ["0", "1"])
@pytest.mark.parametrize("exact", [True, False])
def test_soft_lanes_matches_flat_engine(
    interpret_pallas, monkeypatch, exact, mega
):
    """Both soft lanes generations (6-kernel and mega-sweep) vs the flat
    soft engine."""
    from hpmpc_tpu.models import ipm_soft_fast, ipm_soft_lanes

    monkeypatch.setenv("HPMPC_MEGA_SWEEPS", mega)
    dims, qps, softs, idxbs = _soft_batch()
    idxbs_t = tuple(tuple(int(i) for i in row) for row in idxbs)
    cfg = ipm.IPMConfig(k_max=4, mu0=100.0, mu_tol=1e-5)
    sol_f = jax.jit(
        lambda q, s: ipm_soft_fast.solve_batched_flat(
            dims, q, s, cfg, idxbs_t, exact_mehrotra_soft=exact
        )
    )(qps, softs)
    sol_l = jax.jit(
        lambda q, s: ipm_soft_lanes.solve_batched_soft_lanes(
            dims, q, s, cfg, idxbs_t, exact_mehrotra_soft=exact
        )
    )(qps, softs)
    assert np.mean(np.asarray(sol_f.kk) == np.asarray(sol_l.kk)) > 0.99
    same = np.asarray(sol_f.kk) == np.asarray(sol_l.kk)
    np.testing.assert_allclose(
        np.asarray(sol_l.z)[same], np.asarray(sol_f.z)[same],
        rtol=1e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(sol_l.lam_s)[same], np.asarray(sol_f.lam_s)[same],
        rtol=1e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(sol_l.stat)[same], np.asarray(sol_f.stat)[same],
        rtol=2e-2, atol=2e-4,
    )


def test_soft_lanes_matches_structured(interpret_pallas):
    """Iterate-for-iterate agreement with the structured vmapped soft IPM
    (the golden-parity implementation)."""
    from hpmpc_tpu.models import ipm_soft_lanes

    dims, qps, softs, idxbs = _soft_batch(seed=6)
    idxbs_t = tuple(tuple(int(i) for i in row) for row in idxbs)
    cfg = ipm.IPMConfig(k_max=4, mu0=100.0, mu_tol=1e-5)
    sol_x = jax.jit(
        jax.vmap(lambda q, s: ipm_soft.solve(dims, q, s, cfg))
    )(qps, softs)
    sol_l = jax.jit(
        lambda q, s: ipm_soft_lanes.solve_batched_soft_lanes(
            dims, q, s, cfg, idxbs_t
        )
    )(qps, softs)
    assert np.mean(np.asarray(sol_x.kk) == np.asarray(sol_l.kk)) > 0.99
    same = np.asarray(sol_x.kk) == np.asarray(sol_l.kk)
    np.testing.assert_allclose(
        np.asarray(sol_l.z)[same], np.asarray(sol_x.z)[same],
        rtol=1e-3, atol=2e-3,
    )


def test_soft_lanes_dispatch_knob(interpret_pallas, monkeypatch):
    import hpmpc_tpu.models.ipm_soft_lanes as isl

    called = {}
    orig = isl.solve_batched_soft_lanes

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(isl, "solve_batched_soft_lanes", spy)
    monkeypatch.setenv("HPMPC_LANES_LOOP", "1")
    dims, qps, softs, idxbs = _soft_batch()
    cfg = dataclasses.replace(
        ipm.IPMConfig(k_max=2, mu0=100.0, mu_tol=1e-5), use_pallas=True
    )
    sol = jax.jit(
        lambda q, s: pbatch.solve_batched_soft(dims, q, s, cfg, idxbs=idxbs)
    )(qps, softs)
    assert called.get("yes")
    assert np.isfinite(np.asarray(sol.z)).all()


@pytest.mark.parametrize("mega", ["0", "1"])
def test_soft_lanes_with_general_constraints(
    interpret_pallas, monkeypatch, mega
):
    """Soft lanes engine with ng rows active (the shared make_ng_lanes
    machinery driving the soft loop; both generations) vs the flat soft
    engine."""
    from hpmpc_tpu.models import ipm_soft_fast, ipm_soft_lanes
    from hpmpc_tpu.ocp import OCPDims

    monkeypatch.setenv("HPMPC_MEGA_SWEEPS", mega)

    B = 1024
    dims0, qp, soft = mass_spring_soft_qp(8, 3, 5, Z=10.0, dtype=jnp.float32)
    N, NZ, NU = dims0.N, dims0.NZ, dims0.NU
    ng = [0] * (N + 1)
    ng[2] = ng[N] = 1
    dims = OCPDims.create(N, dims0.nx, dims0.nu, dims0.nb, ng,
                          idxb=dims0.idxb)
    NG = dims.NG
    C = np.zeros((N + 1, NG, NZ), np.float32)
    d_lg = np.zeros((N + 1, NG), np.float32)
    d_ug = np.zeros((N + 1, NG), np.float32)
    for n in (2, N):
        C[n, 0, NU : NU + dims0.nx[n]] = 0.25
        d_lg[n, 0] = -1.0
        d_ug[n, 0] = 1.0
    qp = dataclasses.replace(
        qp, C=jnp.asarray(C), d_lg=jnp.asarray(d_lg),
        d_ug=jnp.asarray(d_ug),
        ng_mask=jnp.asarray(dims.ng_mask(), jnp.float32),
    )
    qps = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), qp
    )
    softs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), soft
    )
    rng = np.random.default_rng(7)
    qps = dataclasses.replace(
        qps,
        g=qps.g * jnp.asarray(
            1 + 0.02 * rng.standard_normal(B), jnp.float32
        )[:, None, None],
    )
    idxbs_t = tuple(tuple(int(i) for i in row) for row in
                    np.asarray(soft.idxbs))
    cfg = ipm.IPMConfig(k_max=4, mu0=100.0, mu_tol=1e-5)
    sol_f = jax.jit(
        lambda q, s: ipm_soft_fast.solve_batched_flat(
            dims, q, s, cfg, idxbs_t
        )
    )(qps, softs)
    sol_l = jax.jit(
        lambda q, s: ipm_soft_lanes.solve_batched_soft_lanes(
            dims, q, s, cfg, idxbs_t
        )
    )(qps, softs)
    assert np.mean(np.asarray(sol_f.kk) == np.asarray(sol_l.kk)) > 0.99
    same = np.asarray(sol_f.kk) == np.asarray(sol_l.kk)
    np.testing.assert_allclose(
        np.asarray(sol_l.z)[same], np.asarray(sol_f.z)[same],
        rtol=1e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(sol_l.lam_g)[same], np.asarray(sol_f.lam_g)[same],
        rtol=1e-3, atol=2e-3,
    )
