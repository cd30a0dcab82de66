"""Forward Schur-complement recursion for stage-wise equality-constrained
KKT chains.

TPU-native re-design of ``d_forward_schur_trf_tv`` / ``d_forward_schur_trs_tv``
(``lqcp_solvers/d_for_schur_rec.c:45,:476``).  The problem class, read off
the reference's own residual evaluator (``lqcp_solvers/d_res.c:153-240``):

    min  sum_{n=0}^{N} 1/2 v_n' Q_n v_n + q_n' v_n
    s.t. A_n v_n - v_{n+1}[0:ne_n] + b_n = 0     (n = 0..N-1, multipliers pi_n)

i.e. each equality maps stage n's variables onto the LEADING ne_n
coordinates of stage n+1 (the information-form MHE chain: v_n = [x_n; w_n],
A_n = [A G], v_{n+1}[0:nx] = x_{n+1}).

Factorization (forward, one lax.scan; regularization ``reg`` as in the
reference):

    Lq_n  = chol(Q_n + reg I + Se_{n-1})     Se = Schur term from stage n-1
    Ab_n  = A_n Lq_n^{-T}
    Se_n  = embed( inv(Ab_n Ab_n' + reg I) ) into the leading block of n+1

where the embedded Schur term is carried as its Cholesky-inverse factor
(the reference's ``hpLe``).  Solve: forward elimination of v then pi,
backward substitution.

Per-stage sizes are static padded maxima with masks: padded variable slots
get Q = identity / q = 0, padded equality rows get A = 0 / b = 0, which
forces the padded coordinates and multipliers to zero self-consistently.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.tri import cholesky, solve_tril, solve_triu, tril_inverse

_HI = jax.lax.Precision.HIGHEST


class SchurChain(NamedTuple):
    """Stacked chain data (padded; NV = max nv, NE = max ne).

    Q: (N+1, NV, NV) with identity on padded diag; q: (N+1, NV)
    A: (N, NE, NV) zero on padded rows/cols; b: (N, NE)
    v_mask: (N+1, NV); e_mask: (N, NE)
    """

    Q: jax.Array
    q: jax.Array
    A: jax.Array
    b: jax.Array
    v_mask: jax.Array
    e_mask: jax.Array


class SchurFactor(NamedTuple):
    Lq: jax.Array  # (N+1, NV, NV) stage Cholesky factors
    Ab: jax.Array  # (N, NE, NV)  A Lq^{-T}
    Li: jax.Array  # (N, NE, NE)  inv(chol(Ab Ab' + reg)) (the reference hpLe)


def factor(chain: SchurChain, reg: float = 0.0) -> SchurFactor:
    """``d_forward_schur_trf_tv`` as a forward scan."""
    N = chain.A.shape[0]
    NV = chain.Q.shape[-1]
    NE = chain.A.shape[-2]
    dt = chain.Q.dtype
    regI_v = reg * jnp.eye(NV, dtype=dt)
    regI_e = reg * jnp.eye(NE, dtype=dt)

    def fwd(Se, inp):
        Q_n, A_n, em = inp
        Lq_n = cholesky(Q_n + regI_v + Se)
        Ab_n = jnp.swapaxes(solve_tril(Lq_n, jnp.swapaxes(A_n, -1, -2)), -1, -2)
        S = jnp.matmul(Ab_n, jnp.swapaxes(Ab_n, -1, -2), precision=_HI) + regI_e
        # padded equality rows: identity so the factor exists, decoupled
        S = S * (em[:, None] * em[None, :]) + jnp.diag(1.0 - em)
        Li_n = tril_inverse(cholesky(S))
        # Schur term entering the next stage's leading block:
        # Se_next = E' (Ab Ab')^{-1} E with E = [I_ne; 0]
        Sinv = jnp.matmul(jnp.swapaxes(Li_n, -1, -2), Li_n, precision=_HI)
        Sinv = Sinv * (em[:, None] * em[None, :])
        Se_next = jnp.zeros((NV, NV), dt).at[:NE, :NE].set(Sinv)
        return Se_next, (Lq_n, Ab_n, Li_n)

    Se_N, (Lq_s, Ab, Li) = lax.scan(
        fwd,
        jnp.zeros((NV, NV), dt),
        (chain.Q[:N], chain.A, chain.e_mask),
    )
    Lq_N = cholesky(chain.Q[N] + regI_v + Se_N)
    Lq = jnp.concatenate([Lq_s, Lq_N[None]], axis=0)
    return SchurFactor(Lq=Lq, Ab=Ab, Li=Li)


def solve(chain: SchurChain, fac: SchurFactor):
    """``d_forward_schur_trs_tv``: forward elimination, backward substitution.

    Returns (v, pi): v (N+1, NV), pi (N, NE).

    Derivation: eliminating v_n = Lq_n^{-T}(t_n - Ab_n' u_n) with
    t_n = Lq_n^{-1}(-q_n - E pi_{n-1}) and the Schur system for u_n = Li'Li
    (A_n v_n + b_n - v_{n+1}[:ne]) gives a forward recursion in the
    auxiliary y_n = Li_n (Ab_n t_n + b_n ...), closed by the backward pass.
    """
    N = chain.A.shape[0]
    NV = chain.Q.shape[-1]
    NE = chain.A.shape[-2]
    dt = chain.Q.dtype

    # forward: t_n = Lq^{-1} rhs_n, where rhs picks up the eliminated
    # pi_{n-1} contribution through the Schur fold (handled via y chain)
    def fwd(carry, inp):
        # carry: s_prev (NV,) = E' pi-elimination vector entering stage n
        s_prev = carry
        Lq_n, Ab_n, Li_n, q_n, b_n, em = inp
        t_n = solve_tril(Lq_n, -q_n + s_prev)
        y_n = Li_n @ ((Ab_n @ t_n + b_n) * em)
        # contribution to stage n+1 leading coords: E' Sinv (A v + b - v+1)
        # folded as s_next = E' Li' y_n
        s_next = jnp.zeros((NV,), dt).at[:NE].set((Li_n.T @ y_n) * em)
        return s_next, (t_n, y_n)

    s_last, (t, y) = lax.scan(
        fwd,
        jnp.zeros((NV,), dt),
        (fac.Lq[:N], fac.Ab, fac.Li, chain.q[:N], chain.b, chain.e_mask),
    )
    t_N = solve_tril(fac.Lq[N], -chain.q[N] + s_last)

    # backward: v_N = Lq_N^{-T} t_N; pi_n = Li'( y_n - Li (v_{n+1}[:ne]) );
    # v_n = Lq^{-T}( t_n - Ab' pi_n )
    v_N = solve_triu(fac.Lq[N].T, t_N)

    def bwd(v_next, inp):
        Lq_n, Ab_n, Li_n, t_n, y_n, em = inp
        pi_n = jnp.matmul(Li_n.T, (y_n - Li_n @ (v_next[:NE] * em)), precision=_HI)
        pi_n = pi_n * em
        v_n = solve_triu(Lq_n.T, t_n - Ab_n.T @ pi_n)
        return v_n, (v_n, pi_n)

    _, (v_s, pi) = lax.scan(
        bwd,
        v_N,
        (fac.Lq[:N], fac.Ab, fac.Li, t, y, chain.e_mask),
        reverse=True,
    )
    v = jnp.concatenate([v_s, v_N[None]], axis=0)
    return v * chain.v_mask, pi


def residuals(chain: SchurChain, v, pi):
    """KKT residuals (``d_forward_schur_res_tv``, ``d_res.c:153``)."""
    N = chain.A.shape[0]
    NE = chain.A.shape[-2]
    rv = chain.q + jnp.einsum("nij,nj->ni", chain.Q, v)
    rv = rv.at[:N].add(jnp.einsum("nev,ne->nv", chain.A, pi))
    # -pi_{n-1} on the leading coords of stage n
    rv = rv.at[1:, :NE].add(-pi)
    rv = rv * chain.v_mask
    re = (
        chain.b
        + jnp.einsum("nev,nv->ne", chain.A, v[:N])
        - v[1:, :NE]
    ) * chain.e_mask
    return rv, re


def factor_solve(chain: SchurChain, reg: float = 0.0):
    with jax.default_matmul_precision("float32"):
        fac = factor(chain, reg)
        v, pi = solve(chain, fac)
    return (v, pi), fac
