"""Small triangular-solve / Cholesky primitives.

These are the TPU-side stand-ins for the reference's panel micro-kernel layer
(``kernel/*/kernel_dpotrf_*``, ``kernel_dtrsv_*`` — see SURVEY.md §2.3): on
TPU the per-ISA register-tile zoo collapses into XLA/Pallas-compiled batched
ops on padded tiles.

Two execution strategies are provided for triangular solves:

  * ``solve_tril`` / ``solve_triu`` — LAPACK-style substitution via
    ``jax.scipy.linalg.solve_triangular``.  Most accurate; sequential in the
    triangle dimension.
  * ``tril_inverse`` — explicit triangular inverse by block divide & conquer
    (log2(n) batched matmul levels).  Turns every subsequent solve into a
    matmul, which is how the hot path should run on the MXU.  For the
    MPC-sized tiles here (NZ <= ~64) this is accurate to ~1e-6 relative even
    in float32 and is the building block of the fused Pallas kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def solve_tril(L, x):
    """Solve L y = x with L lower-triangular (unit batch or single)."""
    return solve_triangular(L, x, lower=True)


def solve_triu(U, x):
    """Solve U y = x with U upper-triangular."""
    return solve_triangular(U, x, lower=False)


def tril_inverse(L):
    """Explicit inverse of a lower-triangular matrix by block D&C.

    inv([[A, 0], [C, B]]) = [[A^-1, 0], [-B^-1 C A^-1, B^-1]] applied
    recursively; log2(n) levels, each a pair of batched matmuls (MXU-friendly,
    unlike sequential substitution).  Supports leading batch dims.
    """
    n = L.shape[-1]
    if n == 1:
        return 1.0 / L
    k = n // 2
    A = L[..., :k, :k]
    C = L[..., k:, :k]
    B = L[..., k:, k:]
    Ai = tril_inverse(A)
    Bi = tril_inverse(B)
    Ci = -jnp.matmul(Bi, jnp.matmul(C, Ai))
    top = jnp.concatenate([Ai, jnp.zeros_like(L[..., :k, k:])], axis=-1)
    bot = jnp.concatenate([Ci, Bi], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def chol_masked(M, pad_diag):
    """Cholesky of a padded stage tile: adds identity on padded coordinates
    (pad_diag = 1 there) so the factor exists and padding stays decoupled."""
    return jnp.linalg.cholesky(M + jnp.diag(pad_diag))
