"""Parallel-in-time (associative-scan) Riccati solver.

The genuinely new capability SURVEY.md §5 calls for: the reference's
backward Riccati recursion is strictly sequential in the horizon N
(``d_back_ric_rec.c:249``); its only lever is partial condensing.  Here the
whole factorize+solve runs in O(log N) sequential depth via
``jax.lax.associative_scan`` — the control-theoretic analogue of
blockwise/ring-attention scaling, useful when single-instance latency (not
batch throughput) matters.

Math (derived in the spirit of temporal-parallelization results for
LQT/Kalman smoothers): the conditional cost over a stage segment [i, j)

    V(x_i, x_j) = 1/2 (x_j - A x_i - b)' C^+ (x_j - A x_i - b)
                  + 1/2 x_i' J x_i - eta' x_i  (+ const)

is closed under composition (partial minimization over the shared middle
state), with the associative combine (e1 earlier, e2 later; all blocks
nx x nx):

    D   = (I + C1 J2)^{-1}
    A   = A2 D A1
    b   = A2 D (b1 + C1 eta2) + b2
    C   = A2 D C1 A2' + C2
    eta = A1' (I + J2 C1)^{-1} (eta2 - J2 b1) + eta1
    J   = A1' (I + J2 C1)^{-1} J2 A1 + J1

Per-stage elements come from eliminating u (R-block solve):

    A = Ad - B R^{-1} S,  b = bd - B R^{-1} r,  C = B R^{-1} B'
    J = Q - S' R^{-1} S,  eta = -(q - S' R^{-1} r)

and the terminal stage contributes (0, 0, 0, -q_N, Q_N).  A reverse
associative scan yields every cost-to-go (P_n = J, p_n = -eta); the stage
factorizations then batch into ONE Cholesky, and the forward rollout is a
second (affine-map) associative scan.

Same solution as :mod:`.riccati` to solver precision; numerically the
combine inverts (I + C J), so extremely stiff horizons may prefer the
sequential path.

f32 CAVEAT (measured, round 5): with barrier-stiff stages the combine
breaks down in f32 in a way iterative refinement CANNOT repair.  On the
headline problem (mass-spring nx=8 nu=3 N=30) at f32, box-only barriers
(ngN=0) track the sequential solver to 1e-6 and converge identically —
but with the terminal general-constraint block (ngN=8, full-rank
C'diag(Qxg)C with entries ~1/mu), the IPM stalls at mu ~1.2e-3 with a
collapsed step (alpha ~8e-7): the scan's cost-to-go P carries a
relative error ~cond((I + C1 J2)) * eps_f32 ~ O(1) once |J| ~ 1e6, so
the direction is garbage, and re-solving the residual through the same
scan inherits the same O(1) relative error (verified: +1/+2 refinement
passes do not move the stall).  f64 converges identically to the
sequential path on the same problem.  A square-root (Cholesky-factor)
combine would halve the condition exponent and is the known fix in the
parallel-smoother literature; until then, f32 single-instance latency
at reference tolerance stays on the sequential engines.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.tri import cholesky, solve_tril, solve_triu, tril_inverse
from .riccati import RiccatiSolution

_HI = jax.lax.Precision.HIGHEST


def _spd_solve(M, B):
    """M^{-1} B for SPD M via our precision-pinned Cholesky."""
    L = cholesky(M)
    return solve_triu(jnp.swapaxes(L, -1, -2), solve_tril(L, B))


def _combine(e1, e2):
    """Associative combine; e1 covers the earlier segment."""
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    nx = A1.shape[-1]
    I = jnp.eye(nx, dtype=A1.dtype)
    D = jnp.linalg.solve(I + jnp.matmul(C1, J2, precision=_HI), I)
    Dt = jnp.swapaxes(D, -1, -2)  # = (I + J2 C1)^{-1}
    A = jnp.matmul(A2, jnp.matmul(D, A1, precision=_HI), precision=_HI)
    b = (
        jnp.einsum("...ij,...j->...i", A2,
                   jnp.einsum("...ij,...j->...i", D,
                              b1 + jnp.einsum("...ij,...j->...i", C1, eta2)))
        + b2
    )
    C = (
        jnp.matmul(
            A2,
            jnp.matmul(jnp.matmul(D, C1, precision=_HI),
                       jnp.swapaxes(A2, -1, -2), precision=_HI),
            precision=_HI,
        )
        + C2
    )
    tmp = jnp.einsum("...ij,...j->...i", Dt, eta2 - jnp.einsum("...ij,...j->...i", J2, b1))
    eta = jnp.einsum("...ji,...j->...i", A1, tmp) + eta1
    J = (
        jnp.matmul(
            jnp.swapaxes(A1, -1, -2),
            jnp.matmul(jnp.matmul(Dt, J2, precision=_HI), A1, precision=_HI),
            precision=_HI,
        )
        + J1
    )
    # symmetrize against drift
    J = 0.5 * (J + jnp.swapaxes(J, -1, -2))
    C = 0.5 * (C + jnp.swapaxes(C, -1, -2))
    return (A, b, C, eta, J)


def factor_solve(H_eff, g_eff, F, b, NU, with_pi=True):
    """Parallel-in-time equivalent of :func:`riccati.factor_solve`.

    Same signature/returns (solution, L, eu, px, Pb); O(log N) depth.
    """
    N = F.shape[0]
    NZ = H_eff.shape[-1]
    NX = F.shape[-1]
    dt = H_eff.dtype

    R = H_eff[:N, :NU, :NU]
    S_xu = H_eff[:N, NU:, :NU]  # (N, NX, NU) = S'
    Q = H_eff[:N, NU:, NU:]
    r = g_eff[:N, :NU]
    q = g_eff[:N, NU:]
    Bm = jnp.swapaxes(F[:, :NU, :], -1, -2)  # (N, NX, NU)
    Am = jnp.swapaxes(F[:, NU:, :], -1, -2)  # (N, NX, NX)

    RiS = _spd_solve(R, jnp.swapaxes(S_xu, -1, -2))  # R^{-1} S  (NU, NX)
    Rir = _spd_solve(R, r[..., None])[..., 0]  # R^{-1} r

    A_e = Am - jnp.matmul(Bm, RiS, precision=_HI)
    b_e = b - jnp.einsum("nxu,nu->nx", Bm, Rir)
    C_e = jnp.matmul(Bm, _spd_solve(R, jnp.swapaxes(Bm, -1, -2)), precision=_HI)
    J_e = Q - jnp.matmul(S_xu, RiS, precision=_HI)
    eta_e = -(q - jnp.einsum("nxu,nu->nx", S_xu, Rir))
    J_e = 0.5 * (J_e + jnp.swapaxes(J_e, -1, -2))
    C_e = 0.5 * (C_e + jnp.swapaxes(C_e, -1, -2))

    # terminal element
    zN = jnp.zeros((1, NX, NX), dt)
    elems = (
        jnp.concatenate([A_e, zN], axis=0),
        jnp.concatenate([b_e, jnp.zeros((1, NX), dt)], axis=0),
        jnp.concatenate([C_e, zN], axis=0),
        jnp.concatenate([eta_e, -g_eff[N:, NU:]], axis=0),
        jnp.concatenate([J_e, H_eff[N:, NU:, NU:]], axis=0),
    )

    # NOTE associative_scan(reverse=True) internally flips the sequence, so
    # the operator's first argument is the element LATER in original time;
    # _combine expects (earlier, later) -> swap
    suf = jax.lax.associative_scan(
        lambda a, b: _combine(b, a), elems, reverse=True
    )
    P = suf[4]  # (N+1, NX, NX) cost-to-go Hessians
    p = -suf[3]  # (N+1, NX) cost-to-go gradients

    # batched stage factorizations (ONE batched syrk+chol)
    M = H_eff.at[:N].add(
        jnp.einsum("nzx,nxy,nwy->nzw", F, P[1:], F)
    )
    L = cholesky(M)
    Pb = jnp.einsum("nxy,ny->nx", P[1:], b)
    m = g_eff.at[:N].add(jnp.einsum("nzx,nx->nz", F, Pb + p[1:]))
    eu = solve_tril(L[:, :NU, :NU], m[:, :NU, None])[..., 0]
    px = m[:, NU:] - jnp.einsum("nxu,nu->nx", L[:, NU:, :NU], eu)

    # forward rollout as an affine associative scan:
    # u_n = -Luu^{-T}(eu + Lxu' x) => x+ = Phi x + d
    Luu_invT = jnp.swapaxes(tril_inverse(L[:N, :NU, :NU]), -1, -2)
    K = jnp.matmul(
        Luu_invT, jnp.swapaxes(L[:N, NU:, :NU], -1, -2), precision=_HI
    )  # Luu^{-T} Lxu'
    ku = jnp.einsum("nuv,nv->nu", Luu_invT, eu[:N])
    Phi = Am - jnp.matmul(Bm, K, precision=_HI)
    d = b - jnp.einsum("nxu,nu->nx", Bm, ku)

    # x0 from P0 (free/eliminated initial state)
    Lxx0 = L[0, NU:, NU:]
    x0 = -solve_triu(Lxx0.T, solve_tril(Lxx0, px[0]))

    def aff_combine(a, bb):
        Pa, da = a
        Pb_, db_ = bb
        return (
            jnp.matmul(Pb_, Pa, precision=_HI),
            jnp.einsum("...ij,...j->...i", Pb_, da) + db_,
        )

    cum = jax.lax.associative_scan(aff_combine, (Phi, d))
    x_tail = jnp.einsum("nij,j->ni", cum[0], x0) + cum[1]  # x_1..x_N
    x = jnp.concatenate([x0[None], x_tail], axis=0)

    u = -jnp.einsum("nuv,nv->nu", K, x[:N]) - ku
    uN = -solve_triu(
        L[N, :NU, :NU].T,
        eu[N] + L[N, NU:, :NU].T @ x[N],
    )
    z = jnp.concatenate(
        [jnp.concatenate([u, uN[None]], axis=0), x], axis=-1
    )
    if with_pi:
        pi = jnp.einsum("nxy,ny->nx", P[1:], x[1:]) + p[1:]
    else:
        pi = jnp.zeros((N, NX), dt)
    return RiccatiSolution(z=z, pi=pi), L, eu, px, Pb
