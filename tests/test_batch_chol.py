"""Batched Pallas Cholesky (ops/batch_chol) parity vs the D&C reference
(ops/tri.cholesky), interpret mode on CPU.

The kernel backs the structured route's KKT factorization in the
medium/large-NZ band (beyond the per-scalar engines' VMEM envelope);
tools/bench_size_sweep.py validates it on hardware.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from hpmpc_tpu.ops import batch_chol, tri


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    yield


def _spd(rng, B, n, dtype):
    A = rng.standard_normal((B, n, n))
    M = A @ A.transpose(0, 2, 1) + n * np.eye(n)
    return jnp.asarray(M, dtype)


@pytest.mark.parametrize("n", [3, 8, 11, 24, 37])
def test_matches_dc_cholesky(interpret_pallas, n):
    rng = np.random.default_rng(0)
    B = 24
    M = _spd(rng, B, n, jnp.float64)
    L = batch_chol.cholesky(M, tb=8)
    L_ref = tri.cholesky(M)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref),
                               rtol=1e-12, atol=1e-12)
    # strictly lower-triangular output
    assert np.allclose(np.triu(np.asarray(L), 1), 0.0)


def test_batch_padding_and_leading_dims(interpret_pallas):
    rng = np.random.default_rng(1)
    M = _spd(rng, 6, 5, jnp.float64).reshape(2, 3, 5, 5)  # B=6 not %8
    L = batch_chol.cholesky(M)
    L_ref = tri.cholesky(M)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n", [8, 12, 24, 40])
def test_blocked_matches_dc_cholesky(interpret_pallas, n):
    rng = np.random.default_rng(3)
    B = 16
    M = _spd(rng, B, n, jnp.float64)
    L = batch_chol.cholesky_blocked(M)
    L_ref = tri.cholesky(M)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref),
                               rtol=1e-11, atol=1e-11)
    assert np.allclose(np.triu(np.asarray(L), 1), 0.0)


def test_blocked_f32_accuracy(interpret_pallas):
    rng = np.random.default_rng(4)
    M64 = _spd(rng, 8, 36, jnp.float64)
    L64 = np.asarray(tri.cholesky(M64))
    L32 = np.asarray(batch_chol.cholesky_blocked(
        M64.astype(jnp.float32)), np.float64)
    rel = np.max(np.abs(L32 - L64)) / np.max(np.abs(L64))
    assert rel < 5e-6


def test_f32_accuracy(interpret_pallas):
    rng = np.random.default_rng(2)
    M64 = _spd(rng, 16, 20, jnp.float64)
    L64 = np.asarray(tri.cholesky(M64))
    L32 = np.asarray(batch_chol.cholesky(M64.astype(jnp.float32)),
                     np.float64)
    rel = np.max(np.abs(L32 - L64)) / np.max(np.abs(L64))
    assert rel < 5e-6
