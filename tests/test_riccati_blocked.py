"""Blocked batched Riccati (models/riccati_blocked) parity vs the vmapped
structured solver, plus the custom_vmap dispatch that routes oversized
problems (past ``stage_kernel.engine_fits``) onto it.

Interpret mode on CPU; hardware validation via tools/bench_size_sweep.py
and tools/probe_large_nx.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from hpmpc_tpu.models import ipm, riccati, riccati_blocked
from hpmpc_tpu.ops import stage_kernel


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    yield


def _chain_data(rng, B, N, NX, NU, dtype=jnp.float64):
    NZ = NX + NU
    A = rng.standard_normal((B, N + 1, NZ, NZ))
    H = A @ A.transpose(0, 1, 3, 2) + NZ * np.eye(NZ)
    g = rng.standard_normal((B, N + 1, NZ))
    F = 0.3 * rng.standard_normal((B, N, NZ, NX))
    b = rng.standard_normal((B, N, NX))
    return tuple(jnp.asarray(x, dtype) for x in (H, g, F, b))


@pytest.mark.parametrize("NX,NU", [(4, 2), (7, 3)])
def test_factor_solve_matches_vmapped(interpret_pallas, NX, NU):
    rng = np.random.default_rng(0)
    B, N = 8, 5
    H, g, F, b = _chain_data(rng, B, N, NX, NU)

    sol, L, eu, px, Pb = riccati_blocked.factor_solve(H, g, F, b, NU)
    sol_r, L_r, eu_r, px_r, Pb_r = jax.vmap(
        lambda *a: riccati.factor_solve(*a, NU)
    )(H, g, F, b)

    np.testing.assert_allclose(np.asarray(sol.z), np.asarray(sol_r.z),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sol.pi), np.asarray(sol_r.pi),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_r),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Pb), np.asarray(Pb_r),
                               rtol=1e-9, atol=1e-9)


def test_folded_assembly_matches_explicit(interpret_pallas):
    """factor_solve_folded (in-scan H_eff assembly) == factor_solve on
    the pre-assembled stack, exactly."""
    rng = np.random.default_rng(7)
    B, N, NX, NU, NG = 8, 4, 5, 2, 3
    NZ = NX + NU
    H, g, F, b = _chain_data(rng, B, N, NX, NU)
    dvec = jnp.asarray(np.abs(rng.standard_normal((B, N + 1, NZ))) + 0.1,
                       jnp.float64)
    C = jnp.asarray(rng.standard_normal((B, N + 1, NG, NZ)), jnp.float64)
    Qxg = jnp.asarray(np.abs(rng.standard_normal((B, N + 1, NG))),
                      jnp.float64)
    # mask two stages inactive, as the dispatch's ng_mask would
    Qxg = Qxg.at[:, 1].set(0.0).at[:, 3].set(0.0)

    H_eff = (H + jnp.eye(NZ, dtype=H.dtype) * dvec[..., None, :]
             + jnp.einsum("bngz,bng,bngw->bnzw", C, Qxg, C))
    sol_a, L_a, eu_a, px_a, Pb_a = riccati_blocked.factor_solve(
        H_eff, g, F, b, NU)
    sol_f, L_f, eu_f, px_f, Pb_f = riccati_blocked.factor_solve_folded(
        H, dvec, C, Qxg, g, F, b, NU)
    np.testing.assert_allclose(np.asarray(sol_f.z), np.asarray(sol_a.z),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(L_f), np.asarray(L_a),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Pb_f), np.asarray(Pb_a),
                               rtol=1e-12, atol=1e-12)


def test_solve_retained_factor_matches_vmapped(interpret_pallas):
    rng = np.random.default_rng(1)
    B, N, NX, NU = 8, 4, 5, 2
    H, g, F, b = _chain_data(rng, B, N, NX, NU)
    _, L, _, _, Pb = riccati_blocked.factor_solve(H, g, F, b, NU)

    g2 = jnp.asarray(rng.standard_normal(g.shape), g.dtype)
    sol, _ = riccati_blocked.solve(L, g2, F, b, NU, Pb=Pb)
    sol_r, _ = jax.vmap(
        lambda l, gg, f, bb, pb: riccati.solve(l, gg, f, bb, NU, Pb=pb)
    )(L, g2, F, b, Pb)
    np.testing.assert_allclose(np.asarray(sol.z), np.asarray(sol_r.z),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sol.pi), np.asarray(sol_r.pi),
                               rtol=1e-9, atol=1e-9)

    # no Pb: recomputed from the retained factor
    sol2, _ = riccati_blocked.solve(L, g2, F, b, NU)
    np.testing.assert_allclose(np.asarray(sol2.z), np.asarray(sol.z),
                               rtol=1e-9, atol=1e-9)


def test_custom_vmap_dispatches_oversized_to_blocked(
    interpret_pallas, monkeypatch
):
    """A BI-multiple batch at a size past engine_fits must route to the
    blocked Riccati (NOT the per-scalar kernels) and match the vmapped
    un-batched rule exactly in math."""
    monkeypatch.setattr(stage_kernel, "engine_fits",
                        lambda *a, **k: False)
    rng = np.random.default_rng(2)
    B, N, NX, NU = stage_kernel.BI, 3, 3, 2
    NZ = NX + NU
    H1, g, F, b = _chain_data(rng, B, N, NX, NU)
    dvec = jnp.asarray(np.abs(rng.standard_normal((B, N + 1, NZ))) + 0.1,
                       jnp.float64)
    ng_stages = (1,)
    NG = 2
    C = jnp.asarray(rng.standard_normal((B, N + 1, NG, NZ)), jnp.float64)
    Qxg = jnp.asarray(np.abs(rng.standard_normal((B, N + 1, NG))),
                      jnp.float64)

    _fs, _trs = ipm.make_pallas_chain_kkt(ng_stages, NU)
    z, pi, L, Pb = jax.vmap(_fs)(dvec, Qxg, g, H1, C, F, b)
    z_r, pi_r, L_r, Pb_r = jax.vmap(lambda *a: _fs.fun(*a))(
        dvec, Qxg, g, H1, C, F, b)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_r),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(pi), np.asarray(pi_r),
                               rtol=1e-9, atol=1e-9)

    g2 = jnp.asarray(rng.standard_normal(g.shape), g.dtype)
    z2, pi2 = jax.vmap(_trs)(L, g2, F, b, Pb)
    z2_r, pi2_r = jax.vmap(lambda *a: _trs.fun(*a))(L_r, g2, F, b, Pb_r)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z2_r),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(pi2), np.asarray(pi2_r),
                               rtol=1e-9, atol=1e-9)


def test_factor_solve_large_nx_inverse_x0(interpret_pallas):
    """NX >= 96 takes the inverse-multiply x0 recovery (the batched
    lapack triangular solve is latency-bound on TPU at large NX —
    measured +11-25% blocked-row throughput); parity with the vmapped
    structured solver must hold through that branch too."""
    rng = np.random.default_rng(1)
    B, N, NX, NU = 2, 3, 96, 4
    H, g, F, b = _chain_data(rng, B, N, NX, NU)

    sol, L, eu, px, Pb = riccati_blocked.factor_solve(H, g, F, b, NU)
    sol_r, L_r, eu_r, px_r, Pb_r = jax.vmap(
        lambda *a: riccati.factor_solve(*a, NU)
    )(H, g, F, b)
    # the x0 recovery path differs in rounding (inverse+matvec vs two
    # substitutions) — f64 agreement to ~1e-10 instead of exact
    np.testing.assert_allclose(np.asarray(sol.z), np.asarray(sol_r.z),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol.pi), np.asarray(sol_r.pi),
                               rtol=1e-8, atol=1e-8)
