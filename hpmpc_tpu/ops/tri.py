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
    hi = jax.lax.Precision.HIGHEST
    Ci = -jnp.matmul(Bi, jnp.matmul(C, Ai, precision=hi), precision=hi)
    top = jnp.concatenate([Ai, jnp.zeros_like(L[..., :k, k:])], axis=-1)
    bot = jnp.concatenate([Ci, Bi], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def chol_masked(M, pad_diag):
    """Cholesky of a padded stage tile: adds identity on padded coordinates
    (pad_diag = 1 there) so the factor exists and padding stays decoupled."""
    return cholesky(M + jnp.diag(pad_diag))


_HI = jax.lax.Precision.HIGHEST


def cholesky(M):
    """Blocked lower-Cholesky with full-precision matmuls.

    XLA:TPU's ``jnp.linalg.cholesky`` lowering runs its internal dots in
    default (bf16-multiply) precision and does not honor the
    ``default_matmul_precision`` context — at f32 the factor carries ~5e-3
    relative error, which destroys IPM convergence.  This recursion pins
    every dot to ``Precision.HIGHEST`` so f32 stays f32 on the MXU.

      M = [[A, B'], [B, C]]:  L11 = chol(A); L21 = B L11^-T;
                              L22 = chol(C - L21 L21')

    Supports leading batch dims; O(log n) recursion levels of batched
    matmuls (MXU-friendly).  This is the XLA-path twin of the Pallas fused
    syrk+potrf kernel (reference ``kernel/avx/kernel_dpotrf_avx_lib4.c:402``).
    """
    n = M.shape[-1]
    # Clamp pivot arguments away from zero: in f32 a barrier-weighted stage
    # Hessian can lose PD-ness to roundoff; a clamped (huge-but-finite)
    # factor makes the IPM take a bad step and retreat via the alpha line
    # search / alpha_min exit instead of poisoning everything with NaN.
    tiny = jnp.asarray(1e-30 if M.dtype == jnp.float64 else 1e-20, M.dtype)
    if n == 1:
        return jnp.sqrt(jnp.maximum(M, tiny))
    if n <= 2:
        # direct 2x2: [[sqrt(a), 0], [b/sqrt(a), sqrt(c - b^2/a)]]
        a = M[..., 0:1, 0:1]
        b = M[..., 1:2, 0:1]
        c = M[..., 1:2, 1:2]
        la = jnp.sqrt(jnp.maximum(a, tiny))
        lb = b / la
        lc = jnp.sqrt(jnp.maximum(c - lb * lb, tiny))
        z = jnp.zeros_like(lb)
        top = jnp.concatenate([la, z], axis=-1)
        bot = jnp.concatenate([lb, lc], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)
    k = n // 2
    A = M[..., :k, :k]
    B = M[..., k:, :k]
    C = M[..., k:, k:]
    L11 = cholesky(A)
    L11_inv = tril_inverse(L11)
    L21 = jnp.matmul(B, jnp.swapaxes(L11_inv, -1, -2), precision=_HI)
    S = C - jnp.matmul(L21, jnp.swapaxes(L21, -1, -2), precision=_HI)
    L22 = cholesky(S)
    z = jnp.zeros(M.shape[:-2] + (k, n - k), M.dtype)
    top = jnp.concatenate([L11, z], axis=-1)
    bot = jnp.concatenate([L21, L22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def getrf(A):
    """LU factorization with partial pivoting, precision-pinned.

    The kernel-zoo member the reference dedicates ``dgetrf`` kernels to
    (``kernel/avx/kernel_dgetrf_avx_lib4.c``, driver ``dgetrf_pivot_lib``,
    ``blas/blas_d_lib4.c``); in the reference it backs the un-pivoted
    condensing-factorization experiments — here it completes the
    factorization surface for general (non-SPD) stage systems.

    Returns ``(LU, piv)`` with unit-lower L and U packed in one matrix
    and ``piv[k]`` the row swapped into position k at step k (LAPACK
    ipiv convention, 0-based).  Batched over leading dims.  Right-looking
    elimination with vectorized pivot selection; the row swap is a pair
    of masked row updates (no data-dependent control flow — TPU-safe).
    """
    from jax import lax

    n = A.shape[-1]
    dt = A.dtype
    batch = A.shape[:-2]
    iota = jnp.arange(n)
    rowax = A.ndim - 2

    def body(k, carry):
        LU, piv = carry
        col = jnp.abs(lax.dynamic_index_in_dim(LU, k, LU.ndim - 1, False))
        col = jnp.where(iota >= k, col, -jnp.inf)
        p = jnp.argmax(col, axis=-1)
        piv = piv.at[..., k].set(p.astype(jnp.int32))
        # swap rows k <-> p (masked row updates)
        row_k = lax.dynamic_index_in_dim(LU, k, rowax, keepdims=True)
        row_p = jnp.take_along_axis(LU, p[..., None, None], axis=-2)
        is_k = iota[:, None] == k
        is_p = iota[:, None] == p[..., None, None]
        LU = jnp.where(is_k, row_p, jnp.where(is_p, row_k, LU))
        # eliminate below the pivot
        pr = lax.dynamic_index_in_dim(LU, k, rowax, keepdims=True)
        pivval = lax.dynamic_index_in_dim(pr, k, pr.ndim - 1, keepdims=True)
        safe = jnp.where(jnp.abs(pivval) > 0, pivval, 1.0)
        colk = lax.dynamic_index_in_dim(LU, k, LU.ndim - 1, keepdims=True)
        mult = jnp.where(iota[:, None] > k, colk / safe, jnp.zeros((), dt))
        # trailing-submatrix update only (columns > k): the stored L
        # multipliers in earlier columns ride along with row swaps and
        # must not be touched by the rank-1 update
        LU = LU - mult * pr * (iota[None, :] > k)
        LU = jnp.where((iota[:, None] > k) & (iota[None, :] == k), mult, LU)
        return LU, piv

    piv0 = jnp.zeros(batch + (n,), jnp.int32)
    LU, piv = lax.fori_loop(0, n, body, (A, piv0))
    return LU, piv


def getrs(LU, piv, b):
    """Solve ``A x = b`` with a :func:`getrf` factorization (the
    reference's LU solve path).  Applies the recorded row swaps to ``b``,
    then unit-lower/upper triangular solves."""
    from jax import lax

    n = LU.shape[-1]
    iota = jnp.arange(n)

    def swap(k, bb):
        p = piv[..., k]
        bk = lax.dynamic_index_in_dim(bb, k, bb.ndim - 1, keepdims=True)
        bp = jnp.take_along_axis(bb, p[..., None], axis=-1)
        is_k = iota == k
        is_p = iota == p[..., None]
        return jnp.where(is_k, bp, jnp.where(is_p, bk, bb))

    b = lax.fori_loop(0, n, swap, b)
    L = jnp.tril(LU, -1) + jnp.eye(n, dtype=LU.dtype)
    y = solve_tril(L, b)
    return solve_triu(jnp.triu(LU), y)
