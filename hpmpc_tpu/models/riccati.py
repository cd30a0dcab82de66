"""Backward Riccati recursion for the LQCP — `lax.scan` formulation.

TPU-native re-design of the reference recursion
(``lqcp_solvers/d_back_ric_rec.c:112-399``): the per-stage chain

    trmm  W = F_n · Lxx_{n+1}
    fused syrk+potrf   L_n = chol(H_n + W W')
    forward substitution for u, x, pi

becomes one `lax.scan` over stacked stage tensors.  All stage tiles are
padded to static (NZ, NZ) with identity on padded coordinates (see
``ocp.OCPQP`` invariants), so ragged per-stage sizes cost nothing.

The reference carries the cost gradient as an extra homogeneous row of each
stage matrix and factors it together with the Hessian (``doc/guide.tex:63-70``).
Here the gradient recursion is explicit (m, eu, px below), which is the same
arithmetic without the (nz+1)-row tile:

    m_n  = g_n + F_n (P_{n+1} b_n + p_{n+1})
    eu_n = Luu_n^{-1} m_n[:NU]           (pre-solved u gradient)
    px_n = m_n[NU:] - Lxu_n eu_n         (= p_n, the value-function gradient)

Factorize-only (`factor`) and solve-with-retained-factor (`solve`) mirror the
reference's trf/trs split (``d_back_ric_rec.c:403,:564``); `factor_solve`
mirrors sv.  `Pb` (= P_{n+1} b_n) is returned so re-solves with the same
(factor, b) skip recomputing it (reference ``compute_Pb`` flag).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.tri import cholesky, solve_tril, solve_triu

# scan unroll factor for the stage recursions: >1 lets XLA fuse across
# stages (helps when the per-stage tiles are tiny and dispatch-bound);
# settable via hpmpc_tpu.models.riccati.set_unroll()
_UNROLL = 1


def set_unroll(n: int):
    global _UNROLL
    _UNROLL = int(n)


class RiccatiFactor(NamedTuple):
    """Cholesky factors of the stage KKT tiles.

    L: (N+1, NZ, NZ) lower-triangular; blocks (NU boundary):
       Luu = L[:, :NU, :NU], Lxu = L[:, NU:, :NU], Lxx = L[:, NU:, NU:].
    Lxx_{n} is the Cholesky factor of the cost-to-go Hessian P_n.
    """

    L: jax.Array

    @property
    def NU(self) -> int:
        # NZ = NU + NX is static; stored via shapes: we keep NU in aux below.
        raise AttributeError


class RiccatiSolution(NamedTuple):
    z: jax.Array  # (N+1, NZ) primal [u; x] per stage
    pi: jax.Array  # (N, NX) equality multipliers (pi_n for constraint n->n+1)


def _split(L, NU):
    return L[..., :NU, :NU], L[..., NU:, :NU], L[..., NU:, NU:]


def factor_solve(H_eff, g_eff, F, b, NU, with_pi=True):
    """Factorize and solve (reference sv, ``d_back_ric_rec.c:112``).

    H_eff: (N+1, NZ, NZ) stage Hessians *including* identity padding and any
           constraint diagonal updates; g_eff: (N+1, NZ) gradients.
    Returns (solution, factor L, eu, px, Pb).
    """
    N = F.shape[0]
    NZ = H_eff.shape[-1]
    NX = NZ - NU

    # final stage
    L_N = cholesky(H_eff[N])
    eu_N = solve_tril(L_N[:NU, :NU], g_eff[N][:NU])
    px_N = g_eff[N][NU:] - L_N[NU:, :NU] @ eu_N

    def bwd(carry, inp):
        Lxx_next, px_next = carry
        H_n, g_n, F_n, b_n = inp
        W = F_n @ Lxx_next  # (NZ, NX) "trmm" stage coupling
        Pb_n = Lxx_next @ (Lxx_next.T @ b_n)
        m = g_n + F_n @ (Pb_n + px_next)
        M = H_n + W @ W.T  # fused syrk+potrf in the reference
        L_n = cholesky(M)
        eu_n = solve_tril(L_n[:NU, :NU], m[:NU])
        px_n = m[NU:] - L_n[NU:, :NU] @ eu_n
        return (L_n[NU:, NU:], px_n), (L_n, eu_n, px_n, Pb_n)

    (_, _), (L_s, eu_s, px_s, Pb) = lax.scan(
        bwd,
        (L_N[NU:, NU:], px_N),
        (H_eff[:N], g_eff[:N], F, b),
        reverse=True,
        unroll=_UNROLL,
    )
    L = jnp.concatenate([L_s, L_N[None]], axis=0)
    eu = jnp.concatenate([eu_s, eu_N[None]], axis=0)
    px = jnp.concatenate([px_s, px_N[None]], axis=0)

    sol = _forward(L, eu, px, F, b, NU, with_pi)
    return sol, L, eu, px, Pb


def factor(H_eff, F, NU):
    """Factorize only (reference trf, ``d_back_ric_rec.c:403``)."""
    N = F.shape[0]
    L_N = cholesky(H_eff[N])

    def bwd(Lxx_next, inp):
        H_n, F_n = inp
        W = F_n @ Lxx_next
        L_n = cholesky(H_n + W @ W.T)
        return L_n[NU:, NU:], L_n

    _, L_s = lax.scan(
        bwd, L_N[NU:, NU:], (H_eff[:N], F), reverse=True, unroll=_UNROLL
    )
    return jnp.concatenate([L_s, L_N[None]], axis=0)


def solve(L, g_eff, F, b, NU, Pb=None, with_pi=True):
    """Solve with a retained factor for a new rhs (reference trs,
    ``d_back_ric_rec.c:564``).  If ``Pb`` (= P_{n+1} b_n, from a prior
    factor_solve with the same b) is given, the two trmv's per stage are
    skipped — the reference's ``compute_Pb=0`` fast path.
    Returns (solution, Pb).
    """
    N = F.shape[0]
    eu_N = solve_tril(L[N][:NU, :NU], g_eff[N][:NU])
    px_N = g_eff[N][NU:] - L[N][NU:, :NU] @ eu_N

    def bwd(px_next, inp):
        L_n, L_next, g_n, F_n, b_n, Pb_n = inp
        if Pb_n is None:
            Lxx_next = L_next[NU:, NU:]
            Pb_n = Lxx_next @ (Lxx_next.T @ b_n)
        m = g_n + F_n @ (Pb_n + px_next)
        eu_n = solve_tril(L_n[:NU, :NU], m[:NU])
        px_n = m[NU:] - L_n[NU:, :NU] @ eu_n
        return px_n, (eu_n, px_n, Pb_n)

    if Pb is None:
        def bwd_nopb(px_next, inp):
            L_n, L_next, g_n, F_n, b_n = inp
            return bwd(px_next, (L_n, L_next, g_n, F_n, b_n, None))
        _, (eu_s, px_s, Pb) = lax.scan(
            bwd_nopb, px_N, (L[:N], L[1:], g_eff[:N], F, b), reverse=True,
            unroll=_UNROLL,
        )
    else:
        def bwd_pb(px_next, inp):
            L_n, g_n, F_n, b_n, Pb_n = inp
            return bwd(px_next, (L_n, None, g_n, F_n, b_n, Pb_n))
        _, (eu_s, px_s, Pb) = lax.scan(
            bwd_pb, px_N, (L[:N], g_eff[:N], F, b, Pb), reverse=True,
            unroll=_UNROLL,
        )

    eu = jnp.concatenate([eu_s, eu_N[None]], axis=0)
    px = jnp.concatenate([px_s, px_N[None]], axis=0)
    sol = _forward(L, eu, px, F, b, NU, with_pi)
    return sol, Pb


def _forward(L, eu, px, F, b, NU, with_pi=True):
    """Forward substitution: u_n = -Luu^{-T}(eu_n + Lxu' x_n),
    x_{n+1} = b_n + F_n' z_n, pi_n = P_{n+1} x_{n+1} + p_{n+1}
    (reference ``d_back_ric_rec.c:339-401``)."""
    N = F.shape[0]
    NZ = L.shape[-1]
    NX = NZ - NU

    # free initial state: x_0 = -P_0^{-1} p_0 (trivial when nx[0]=0: padded
    # identity and zero gradient give x_0 = 0)
    Lxx0 = L[0][NU:, NU:]
    x0 = -solve_triu(Lxx0.T, solve_tril(Lxx0, px[0]))

    def fwd(x_n, inp):
        L_n, eu_n, F_n, b_n, L_next, px_next = inp
        Luu, Lxu, _ = _split(L_n, NU)
        u_n = -solve_triu(Luu.T, eu_n + Lxu.T @ x_n)
        z_n = jnp.concatenate([u_n, x_n])
        x_next = b_n + F_n.T @ z_n
        if with_pi:
            Lxx_next = L_next[NU:, NU:]
            pi_n = Lxx_next @ (Lxx_next.T @ x_next) + px_next
        else:
            pi_n = jnp.zeros_like(x_next)
        return x_next, (z_n, pi_n)

    x_N, (z_s, pi) = lax.scan(
        fwd, x0, (L[:N], eu[:N], F, b, L[1:], px[1:]), unroll=_UNROLL
    )
    # final stage: no inputs (padded u solves to zero)
    LuuN, LxuN, _ = _split(L[N], NU)
    u_N = -solve_triu(LuuN.T, eu[N] + LxuN.T @ x_N)
    z_N = jnp.concatenate([u_N, x_N])
    z = jnp.concatenate([z_s, z_N[None]], axis=0)
    return RiccatiSolution(z=z, pi=pi)


def kkt_residuals(H_eff, g_eff, F, b, z, pi, NU):
    """Unconstrained LQCP KKT residuals (the reference's
    ``d_back_ric_res_tv``, ``lqcp_solvers/d_res.c:38``):

        rq_n = g_n + H_n z_n + [0; -pi_{n-1}] + F_n pi_n
        rb_n = b_n + F_n' z_n - x_{n+1}
    """
    N = F.shape[0]
    NX = F.shape[-1]
    rq = g_eff + jnp.einsum("nzw,nw->nz", H_eff, z)
    pi_pad = jnp.concatenate([jnp.zeros_like(pi[:1]), pi], axis=0)
    rq = rq.at[:, NU:].add(-pi_pad)
    rq = rq.at[:N].add(jnp.einsum("nzx,nx->nz", F, pi))
    rb = b + jnp.einsum("nzx,nz->nx", F, z[:N]) - z[1:, NU:]
    return rq, rb
