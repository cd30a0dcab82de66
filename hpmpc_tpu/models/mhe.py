"""Moving-horizon estimation: information-filter Riccati factorization/solve.

TPU-native re-design of the reference's MHE solvers
(``lqcp_solvers/d_ric_sv.c``: ``d_ric_trf_mhe_if`` :1298,
``d_ric_trs_mhe_if`` :1629; mathematical spec cross-checked against the
BLAS oracle ``reference_code/d_ric_sv_blas.c:47-300``).

Problem (information form; sizes nx, nw, horizon N, optional ndN terminal
equality rows):

    min  sum_{n=0}^{N} [ 1/2 x_n' Q_n x_n + q_n' x_n ]
         + sum_{n=0}^{N-1} [ 1/2 w_n' R_n w_n + r_n' w_n ]
         + 1/2 (x_0 - xp_0)' (Up_0 Up_0') (x_0 - xp_0)
    s.t. x_{n+1} = A_n x_n + G_n w_n + f_n
         D x_N = dN                      (ndN rows, data in A_N/f_N slots)

``Up_0`` is the (upper) Cholesky factor of the prior INFORMATION matrix
(the reference passes ``inv(chol(P0))``, ``test_d_ric_mhe.c:622-623``).
Q_n typically encodes measurement information C'WC with q_n = -C'W y_n.

Factorization sweep (per stage, all MXU-shaped ops inside one lax.scan):

    Ue_n   = chol( Q_n + Up_n Up_n' )          posterior information factor
    AU_n   = A_n Ue_n^{-T}                     (right triangular solve)
    Ur_n   = chol( R_n );  GU_n = G_n Ur_n^{-T}
    Up_{n+1} = inv( chol( AU AU' + GU GU' ) )  predicted information factor

Solve sweep: forward prediction of ``xp``, then backward smoothing for
``x``, ``w`` and the costates ``lam``.

All triangular factors here are LOWER (our cholesky convention); the
reference uses upper factors — same algebra transposed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.tri import cholesky, solve_tril, solve_triu, tril_inverse

_HI = jax.lax.Precision.HIGHEST


class MHEData(NamedTuple):
    """Stacked MHE problem data (a pytree; leading axes batch with vmap).

    A: (N, nx, nx); G: (N, nx, nw); f: (N, nx)
    Q: (N+1, nx, nx); q: (N+1, nx)
    R: (N, nw, nw); r: (N, nw)
    Up0: (nx, nx) lower-triangular prior information factor (P0^{-1} = Up0 Up0')
    xp0: (nx,) prior mean
    D: (ndN, nx) terminal equality rows (ndN may be 0); dN: (ndN,)
    """

    A: jax.Array
    G: jax.Array
    f: jax.Array
    Q: jax.Array
    q: jax.Array
    R: jax.Array
    r: jax.Array
    Up0: jax.Array
    xp0: jax.Array
    D: jax.Array
    dN: jax.Array


class MHEFactor(NamedTuple):
    Ue: jax.Array  # (N+1, nx, nx) posterior information factors (lower)
    AU: jax.Array  # (N, nx, nx) A Ue^{-T}
    Ur: jax.Array  # (N, nw, nw) chol(R) (lower)
    GU: jax.Array  # (N, nx, nw) G Ur^{-T}
    Up: jax.Array  # (N+1, nx, nx) predicted information factors (lower)
    DU: jax.Array  # (ndN, nx) D Ue_N^{-T}
    Ud: jax.Array  # (ndN, ndN) chol(DU DU') (lower)


class MHESolution(NamedTuple):
    x: jax.Array  # (N+1, nx) smoothed states
    w: jax.Array  # (N, nw) noises
    lam: jax.Array  # (N, nx) costates
    lamN: jax.Array  # (ndN,) terminal equality multipliers
    xp: jax.Array  # (N+1, nx) one-step predictions


def factor(data: MHEData) -> MHEFactor:
    """``d_ric_trf_mhe_if`` (``d_ric_sv.c:1298``) as a forward lax.scan."""
    N = data.A.shape[0]
    nx = data.A.shape[-1]
    ndN = data.D.shape[0]

    Ur = cholesky(data.R)  # (N, nw, nw) batched
    GU = jnp.swapaxes(
        solve_tril(Ur, jnp.swapaxes(data.G, -1, -2)), -1, -2
    )  # G Ur^{-T}

    def fwd(Up_n, inp):
        Q_n, A_n, GU_n = inp
        E = Q_n + jnp.matmul(Up_n, jnp.swapaxes(Up_n, -1, -2), precision=_HI)
        Ue_n = cholesky(E)
        AU_n = jnp.swapaxes(
            solve_tril(Ue_n, jnp.swapaxes(A_n, -1, -2)), -1, -2
        )
        P_pred = (
            jnp.matmul(AU_n, jnp.swapaxes(AU_n, -1, -2), precision=_HI)
            + jnp.matmul(GU_n, jnp.swapaxes(GU_n, -1, -2), precision=_HI)
        )
        # information factor: P^{-1} = L^{-T} L^{-1} = (L^{-T})(L^{-T})',
        # so Up must be L^{-T} (upper), not L^{-1} — Up only ever appears
        # in the product Up Up', so its triangularity is irrelevant to users
        Up_next = jnp.swapaxes(tril_inverse(cholesky(P_pred)), -1, -2)
        return Up_next, (Ue_n, AU_n, Up_n)

    Up_N, (Ue_s, AU, Up_s) = lax.scan(fwd, data.Up0, (data.Q[:N], data.A, GU))

    E_N = data.Q[N] + jnp.matmul(Up_N, Up_N.T, precision=_HI)
    Ue_N = cholesky(E_N)
    Ue = jnp.concatenate([Ue_s, Ue_N[None]], axis=0)
    Up = jnp.concatenate([Up_s, Up_N[None]], axis=0)

    if ndN > 0:
        DU = solve_tril(Ue_N, data.D.T).T  # D Ue^{-T}
        Ud = cholesky(jnp.matmul(DU, DU.T, precision=_HI))
    else:
        DU = jnp.zeros((0, nx), data.A.dtype)
        Ud = jnp.zeros((0, 0), data.A.dtype)

    return MHEFactor(Ue=Ue, AU=AU, Ur=Ur, GU=GU, Up=Up, DU=DU, Ud=Ud)


def solve(data: MHEData, fac: MHEFactor) -> MHESolution:
    """``d_ric_trs_mhe_if`` (``d_ric_sv.c:1629``): forward prediction then
    backward smoothing (spec: ``d_ric_sv_blas.c:175-300``)."""
    N = data.A.shape[0]
    ndN = data.D.shape[0]

    # pre-solved noise terms: wt_n = Ur^{-1} r_n
    wt = solve_tril(fac.Ur, data.r[..., None])[..., 0]

    def fwd(xp_n, inp):
        Up_n, Ue_n, AU_n, GU_n, q_n, f_n, wt_n = inp
        ix = jnp.matmul(Up_n, Up_n.T @ xp_n, precision=_HI) - q_n
        v_n = solve_tril(Ue_n, ix)  # partially solved state
        xp_next = f_n + AU_n @ v_n - GU_n @ wt_n
        return xp_next, (v_n, xp_n)

    xp_N, (v, xp_s) = lax.scan(
        fwd,
        data.xp0,
        (fac.Up[:N], fac.Ue[:N], fac.AU, fac.GU, data.q[:N], data.f, wt),
    )
    xp = jnp.concatenate([xp_s, xp_N[None]], axis=0)

    # terminal stage
    ix_N = jnp.matmul(fac.Up[N], fac.Up[N].T @ xp_N, precision=_HI) - data.q[N]
    v_N = solve_tril(fac.Ue[N], ix_N)
    if ndN > 0:
        lamN = fac.DU @ v_N - data.dN
        lamN = solve_triu(fac.Ud.T, solve_tril(fac.Ud, lamN))
        x_N = solve_triu(fac.Ue[N].T, v_N - fac.DU.T @ lamN)
    else:
        lamN = jnp.zeros((0,), data.A.dtype)
        x_N = solve_triu(fac.Ue[N].T, v_N)

    def bwd(x_next, inp):
        Up_next, Ue_n, AU_n, GU_n, Ur_n, v_n, wt_n, xp_next = inp
        lam_n = jnp.matmul(Up_next, Up_next.T @ (xp_next - x_next), precision=_HI)
        x_n = solve_triu(Ue_n.T, v_n - AU_n.T @ lam_n)
        w_n = solve_triu(Ur_n.T, -GU_n.T @ lam_n - wt_n)
        return x_n, (x_n, lam_n, w_n)

    _, (x_s, lam, w) = lax.scan(
        bwd,
        x_N,
        (fac.Up[1:], fac.Ue[:N], fac.AU, fac.GU, fac.Ur, v, wt, xp[1:]),
        reverse=True,
    )
    x = jnp.concatenate([x_s, x_N[None]], axis=0)
    return MHESolution(x=x, w=w, lam=lam, lamN=lamN, xp=xp)


def factor_solve(data: MHEData):
    """Convenience: factorize and solve (the reference's typical call pair,
    ``test_d_ric_mhe.c:766-777``)."""
    with jax.default_matmul_precision("float32"):
        fac = factor(data)
        sol = solve(data, fac)
    return sol, fac
