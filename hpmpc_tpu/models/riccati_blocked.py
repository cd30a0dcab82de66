"""Batched backward Riccati for the MEDIUM/LARGE stage-size band.

The hand-batched twin of :mod:`.riccati` (reference ``sv``,
``lqcp_solvers/d_back_ric_rec.c:112``): every per-stage op carries an
explicit leading batch axis, so the stage Cholesky — the measured
bottleneck of the vmapped structured route at large NZ (2.7 ms of a
~6 ms stage on v5e at (1024, 72, 72), see ``ops/batch_chol``) — can run
as the Pallas batched right-looking kernel instead of the
divide-&-conquer recursion.  Everything else (trmm/syrk stage coupling,
gradient recursion, forward substitution) is ordinary batched matmuls
that XLA tiles onto the MXU at these sizes.

Mathematically identical to ``riccati.factor_solve`` under ``vmap``
(same op order, same HIGHEST-precision pins); only the Cholesky
algorithm differs (right-looking vs D&C — both full-precision FMA).
Dispatched by ``models/ipm.make_pallas_chain_kkt`` for batches beyond
the per-scalar-tile engines' VMEM envelope (``stage_kernel.engine_fits``);
interpret-mode parity in tests/test_riccati_blocked.py, hardware
validation via tools/bench_size_sweep.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.batch_chol import cholesky as bchol
from .riccati import RiccatiSolution

_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def _tril_solve_vec(L, x):
    """L y = x with batched L (B, n, n), x (B, n)."""
    from ..ops.tri import solve_tril

    return solve_tril(L, x[..., None])[..., 0]


def _triu_solve_vec(U, x):
    from ..ops.tri import solve_triu

    return solve_triu(U, x[..., None])[..., 0]


def factor_solve(H_eff, g_eff, F, b, NU, with_pi=True):
    """Batched factorize-and-solve.

    H_eff (B, N+1, NZ, NZ), g_eff (B, N+1, NZ), F (B, N, NZ, NX),
    b (B, N, NX).  Returns ``(RiccatiSolution, L, eu, px, Pb)`` with the
    batch leading on every leaf — the layout ``make_pallas_chain_kkt``'s
    vmap rule hands back.
    """
    def assemble(n):
        return lax.dynamic_index_in_dim(H_eff, n, 1, keepdims=False)

    return _factor_solve(assemble, g_eff, F, b, NU, with_pi)


def factor_solve_folded(H, dvec, C, Qx_g, g_eff, F, b, NU, with_pi=True):
    """Folded-assembly variant: the effective stage Hessian
    ``H_n + diag(dvec_n) + C_n' diag(Qx_g_n) C_n`` is built INSIDE the
    stage scan, so the (B, N+1, NZ, NZ) H_eff stack never exists in HBM
    (the blocked twin of ``stage_kernel.factor_solve_folded``'s in-VMEM
    assembly; at nx=64, B=1024 the stack is 2.6 GB per iteration).
    ``Qx_g`` must already be ng-masked (zero rows at non-ng stages make
    the rank-NG einsum a no-op there)."""
    NZ = H.shape[-1]
    eye = jnp.eye(NZ, dtype=H.dtype)

    def assemble(n):
        H_n = lax.dynamic_index_in_dim(H, n, 1, keepdims=False)
        dv = lax.dynamic_index_in_dim(dvec, n, 1, keepdims=False)
        C_n = lax.dynamic_index_in_dim(C, n, 1, keepdims=False)
        q_n = lax.dynamic_index_in_dim(Qx_g, n, 1, keepdims=False)
        return (H_n + eye * dv[..., None, :]
                + jnp.einsum("bgz,bg,bgw->bzw", C_n, q_n, C_n,
                             precision=_HI))

    return _factor_solve(assemble, g_eff, F, b, NU, with_pi)


def _factor_solve(assemble, g_eff, F, b, NU, with_pi=True):
    N = F.shape[1]

    L_N = bchol(assemble(N))
    eu_N = _tril_solve_vec(L_N[:, :NU, :NU], g_eff[:, N, :NU])
    px_N = g_eff[:, N, NU:] - _mm(L_N[:, NU:, :NU], eu_N[..., None])[..., 0]

    def bwd(carry, n):
        Lxx_next, px_next = carry
        g_n = lax.dynamic_index_in_dim(g_eff, n, 1, keepdims=False)
        F_n = lax.dynamic_index_in_dim(F, n, 1, keepdims=False)
        b_n = lax.dynamic_index_in_dim(b, n, 1, keepdims=False)
        W = _mm(F_n, Lxx_next)  # (B, NZ, NX)
        Pb_n = _mm(Lxx_next, _mm(jnp.swapaxes(Lxx_next, -1, -2),
                                 b_n[..., None]))[..., 0]
        m = g_n + _mm(F_n, (Pb_n + px_next)[..., None])[..., 0]
        M = assemble(n) + _mm(W, jnp.swapaxes(W, -1, -2))
        L_n = bchol(M)
        eu_n = _tril_solve_vec(L_n[:, :NU, :NU], m[:, :NU])
        px_n = m[:, NU:] - _mm(L_n[:, NU:, :NU], eu_n[..., None])[..., 0]
        return (L_n[:, NU:, NU:], px_n), (L_n, eu_n, px_n, Pb_n)

    (_, _), (L_s, eu_s, px_s, Pb_s) = lax.scan(
        bwd, (L_N[:, NU:, NU:], px_N), jnp.arange(N), reverse=True
    )
    # scan stacks stage-leading; consumers want batch-leading
    L = jnp.concatenate([jnp.moveaxis(L_s, 0, 1), L_N[:, None]], axis=1)
    eu = jnp.concatenate([jnp.moveaxis(eu_s, 0, 1), eu_N[:, None]], axis=1)
    px = jnp.concatenate([jnp.moveaxis(px_s, 0, 1), px_N[:, None]], axis=1)
    Pb = jnp.moveaxis(Pb_s, 0, 1)

    sol = _forward(L, eu, px, F, b, NU, with_pi)
    return sol, L, eu, px, Pb


def solve(L, g_eff, F, b, NU, Pb=None, with_pi=True):
    """Batched solve with a retained factor for a new rhs (reference trs,
    ``d_back_ric_rec.c:564``); the hand-batched twin of
    :func:`riccati.solve`.  ``Pb`` (B, N, NX) from a prior
    :func:`factor_solve` skips the two trmv's per stage (the reference's
    ``compute_Pb=0`` fast path).  Returns ``(RiccatiSolution, Pb)``."""
    N = F.shape[1]
    eu_N = _tril_solve_vec(L[:, N, :NU, :NU], g_eff[:, N, :NU])
    px_N = g_eff[:, N, NU:] - _mm(L[:, N, NU:, :NU], eu_N[..., None])[..., 0]

    def bwd(px_next, n):
        L_n = lax.dynamic_index_in_dim(L, n, 1, keepdims=False)
        g_n = lax.dynamic_index_in_dim(g_eff, n, 1, keepdims=False)
        F_n = lax.dynamic_index_in_dim(F, n, 1, keepdims=False)
        if Pb is None:
            L_next = lax.dynamic_index_in_dim(L, n + 1, 1, keepdims=False)
            b_n = lax.dynamic_index_in_dim(b, n, 1, keepdims=False)
            Lxx = L_next[:, NU:, NU:]
            Pb_n = _mm(Lxx, _mm(jnp.swapaxes(Lxx, -1, -2),
                                b_n[..., None]))[..., 0]
        else:
            Pb_n = lax.dynamic_index_in_dim(Pb, n, 1, keepdims=False)
        m = g_n + _mm(F_n, (Pb_n + px_next)[..., None])[..., 0]
        eu_n = _tril_solve_vec(L_n[:, :NU, :NU], m[:, :NU])
        px_n = m[:, NU:] - _mm(L_n[:, NU:, :NU], eu_n[..., None])[..., 0]
        return px_n, (eu_n, px_n, Pb_n)

    _, (eu_s, px_s, Pb_s) = lax.scan(bwd, px_N, jnp.arange(N), reverse=True)
    eu = jnp.concatenate([jnp.moveaxis(eu_s, 0, 1), eu_N[:, None]], axis=1)
    px = jnp.concatenate([jnp.moveaxis(px_s, 0, 1), px_N[:, None]], axis=1)
    sol = _forward(L, eu, px, F, b, NU, with_pi)
    return sol, jnp.moveaxis(Pb_s, 0, 1)


def _forward(L, eu, px, F, b, NU, with_pi=True):
    """Batched forward substitution (reference
    ``d_back_ric_rec.c:339-401``); L (B, N+1, NZ, NZ) etc."""
    from ..ops.tri import tril_inverse

    N = F.shape[1]

    # x0 = -(Lxx0 Lxx0')^{-1} px0.  At large NX the batched lapack
    # triangular solve is latency-bound regardless of rhs width
    # (measured 5.5-8.4 ms/call at (256, 216..288) vs ~0 for matvecs and
    # 1.8-2.5 ms for a one-time triangular inverse), so the inverse +
    # two matvecs wins: blocked rows moved 128: 740->826, 192: 524->658,
    # 256: 337->373 solves/s (v5e 2026-08-20).  At NX=64 the same swap
    # measured 16% SLOWER (the inverse outweighs the cheap small
    # solves), hence the size gate.
    Lxx0 = L[:, 0, NU:, NU:]
    if Lxx0.shape[-1] >= 96:
        Li0 = tril_inverse(Lxx0)
        x0 = -_mm(jnp.swapaxes(Li0, -1, -2),
                  _mm(Li0, px[:, 0][..., None]))[..., 0]
    else:
        x0 = -_triu_solve_vec(jnp.swapaxes(Lxx0, -1, -2),
                              _tril_solve_vec(Lxx0, px[:, 0]))

    def fwd(x_n, n):
        L_n = lax.dynamic_index_in_dim(L, n, 1, keepdims=False)
        L_next = lax.dynamic_index_in_dim(L, n + 1, 1, keepdims=False)
        eu_n = lax.dynamic_index_in_dim(eu, n, 1, keepdims=False)
        px_next = lax.dynamic_index_in_dim(px, n + 1, 1, keepdims=False)
        F_n = lax.dynamic_index_in_dim(F, n, 1, keepdims=False)
        b_n = lax.dynamic_index_in_dim(b, n, 1, keepdims=False)
        Luu = L_n[:, :NU, :NU]
        Lxu = L_n[:, NU:, :NU]
        u_n = -_triu_solve_vec(
            jnp.swapaxes(Luu, -1, -2),
            eu_n + _mm(jnp.swapaxes(Lxu, -1, -2), x_n[..., None])[..., 0],
        )
        z_n = jnp.concatenate([u_n, x_n], axis=-1)
        x_next = b_n + _mm(jnp.swapaxes(F_n, -1, -2), z_n[..., None])[..., 0]
        if with_pi:
            Lxx_next = L_next[:, NU:, NU:]
            pi_n = _mm(Lxx_next, _mm(jnp.swapaxes(Lxx_next, -1, -2),
                                     x_next[..., None]))[..., 0] + px_next
        else:
            pi_n = jnp.zeros_like(x_next)
        return x_next, (z_n, pi_n)

    x_N, (z_s, pi_s) = lax.scan(fwd, x0, jnp.arange(N))
    LuuN = L[:, N, :NU, :NU]
    LxuN = L[:, N, NU:, :NU]
    u_N = -_triu_solve_vec(
        jnp.swapaxes(LuuN, -1, -2),
        eu[:, N] + _mm(jnp.swapaxes(LxuN, -1, -2), x_N[..., None])[..., 0],
    )
    z_N = jnp.concatenate([u_N, x_N], axis=-1)
    z = jnp.concatenate([jnp.moveaxis(z_s, 0, 1), z_N[:, None]], axis=1)
    pi = jnp.moveaxis(pi_s, 0, 1)
    return RiccatiSolution(z=z, pi=pi)
