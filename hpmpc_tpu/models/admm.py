"""Over-relaxed ADMM solvers for box- and soft-constrained MPC.

The reference ships tests for ``d_admm_box_mpc`` / ``d_admm_soft_mpc``
(``test_problems/test_d_admm_box.c:381``, ``test_d_admm_soft.c:408``) whose
implementations only existed in upstream v0.1 — SURVEY.md §2.6 flags them
as an orphaned capability.  This module reconstructs the solvers from the
call signatures: consensus splitting z = v over the stage variables with
penalty ``rho``, over-relaxation ``alpha``, scaled duals ``w`` (the tests'
``hux_v``/``hux_w``), warm start, and a retained equality-KKT factorization
(the ``update_hessian`` flag: the (H + rho I) Riccati factor is computed
once and reused every iteration and across calls).

    z-step:  z = argmin 1/2 z'Hz + g'z + rho/2 ||z - v + w||^2  s.t. dynamics
             (Riccati solve with the retained H + rho*I factor)
    relax:   zh = alpha z + (1 - alpha) v
    v-step:  v = prox_{phi/rho}(zh + w)     (clip for box; piecewise-quadratic
             closed form for soft constraints — equivalent to the reference's
             explicit slack splitting at the fixed point)
    w-step:  w = w + zh - v

Convergence on primal/dual residual norms ||z - v||, rho ||v - v_prev||
(the tests scale tol by sqrt(N (nx+nu)), ``test_d_admm_box.c:343``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ocp import OCPDims, OCPQP
from . import riccati
from .ipm import _box_onehot, _scatter_box


@dataclasses.dataclass(frozen=True)
class ADMMConfig:
    k_max: int = 1000
    rho: float = 2.0  # penalty (test_d_admm_box.c:345)
    alpha: float = 1.5  # over-relaxation (:346)
    tol_p: float = 1e-5
    tol_d: float = 1e-5
    warm_start: bool = False
    # route the per-iteration retained-factor Riccati resolve through the
    # custom_vmap KKT wrapper (models/ipm.make_pallas_chain_kkt._trs):
    # vmapped over a 1024-multiple batch it dispatches to the fused Pallas
    # stage solve kernels (ops/stage_kernel.solve_batched) — the ADMM
    # z-step is EXACTLY the "new rhs, retained factor" fast path the
    # reference's update_hessian=0 flag selects (test_d_admm_box.c:381).
    use_pallas: bool = False


class ADMMSolution(NamedTuple):
    z: jax.Array  # (N+1, NZ) primal iterate (the QP variable)
    v: jax.Array  # (N+1, NZ) split variable (feasible wrt the constraints)
    w: jax.Array  # (N+1, NZ) scaled duals
    pi: jax.Array  # (N, NX) equality multipliers (from the last z-step)
    kk: jax.Array
    status: jax.Array  # 0 converged, 1 max iterations
    stat: jax.Array  # (k_max, 5): [r_primal, r_dual, 0, 0, 0]


class _State(NamedTuple):
    z: jax.Array
    v: jax.Array
    w: jax.Array
    pi: jax.Array
    rp: jax.Array
    rd: jax.Array
    kk: jax.Array
    stat: jax.Array


def _bounds_full(dims: OCPDims, qp: OCPQP):
    """Scatter the box bounds onto full padded z coordinates; unbounded
    coordinates get +-inf (their prox is the identity)."""
    oh = _box_onehot(qp)
    big = jnp.asarray(jnp.finfo(qp.dtype).max / 4, qp.dtype)
    sel = _scatter_box(oh, qp.nb_mask)  # 1.0 where bounded
    lb = _scatter_box(oh, qp.d_lb * qp.nb_mask) - big * (1.0 - sel)
    ub = _scatter_box(oh, qp.d_ub * qp.nb_mask) + big * (1.0 - sel)
    return lb, ub, sel


def _solve_common(dims, qp, cfg, prox, z0=None, v0=None, w0=None):
    dt = qp.dtype
    N, NU, NZ = dims.N, dims.NU, dims.NZ
    rho = jnp.asarray(cfg.rho, dt)
    alpha = jnp.asarray(cfg.alpha, dt)
    # residual tolerances scaled like the reference tests
    nvar = sum(dims.nu[n] + dims.nx[n] for n in range(N + 1))
    scale = jnp.sqrt(jnp.asarray(float(nvar), dt))
    tol_p = jnp.asarray(cfg.tol_p, dt) * scale
    tol_d = jnp.asarray(cfg.tol_d, dt) * scale

    # retained factorization of H + rho I on the REAL coordinates
    H_eff = qp.H + jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(
        qp.pad_diag + rho * qp.z_mask
    )
    L = riccati.factor(H_eff, qp.F, NU)
    # Pb_n = P_{n+1} b_n = Lxx_{n+1} (Lxx_{n+1}' b_n): retained across
    # every z-step (the reference's compute_Pb=0 resolve fast path)
    Lxx = L[1:, NU:, NU:]
    Pb = jnp.einsum(
        "nij,nkj,nk->ni", Lxx, Lxx, qp.b,
        precision=jax.lax.Precision.HIGHEST)

    import os as _os

    if _os.environ.get("HPMPC_ADMM_NO_RESOLVE") == "1":
        # BENCHMARK-ONLY breakdown knob (tools/bench_admm.py): replace
        # the retained-factor Riccati resolve with a passthrough so the
        # per-iteration cost of everything ELSE (prox, over-relaxation,
        # dual update, residual norms — the XLA glue) can be measured in
        # isolation.  Results are numerically meaningless.
        def resolve(g_eff):
            return g_eff, jnp.zeros((N, dims.NX), dt)
    elif cfg.use_pallas:
        from .ipm import make_pallas_chain_kkt

        _, _trs = make_pallas_chain_kkt((), NU)

        def resolve(g_eff):
            z, pi = _trs(L, g_eff, qp.F, qp.b, Pb)
            return z, pi
    else:
        def resolve(g_eff):
            sol, _ = riccati.solve(L, g_eff, qp.F, qp.b, NU, Pb=Pb)
            return sol.z, sol.pi

    zeros = jnp.zeros((N + 1, NZ), dt)
    state0 = _State(
        z=zeros if z0 is None else z0,
        v=zeros if v0 is None else v0,
        w=zeros if w0 is None else w0,
        pi=jnp.zeros((N, dims.NX), dt),
        rp=jnp.asarray(jnp.inf, dt),
        rd=jnp.asarray(jnp.inf, dt),
        kk=jnp.asarray(0, jnp.int32),
        stat=jnp.zeros((cfg.k_max, 5), dt),
    )

    def body(s: _State) -> _State:
        # z-step: gradient g - rho (v - w) on real coords
        g_eff = (qp.g - rho * (s.v - s.w)) * qp.z_mask
        z_new, pi_new = resolve(g_eff)
        z = z_new * qp.z_mask
        zh = alpha * z + (1.0 - alpha) * s.v
        y = zh + s.w
        v = prox(y) * qp.z_mask
        w = (y - v) * qp.z_mask
        rp = jnp.linalg.norm((z - v) * qp.z_mask)
        rd = rho * jnp.linalg.norm((v - s.v) * qp.z_mask)
        row = jnp.stack([rp, rd, jnp.zeros_like(rp), jnp.zeros_like(rp), jnp.zeros_like(rp)])
        stat = lax.dynamic_update_slice(
            s.stat, row[None].astype(dt), (s.kk, jnp.asarray(0, s.kk.dtype))
        )
        return _State(z=z, v=v, w=w, pi=pi_new, rp=rp, rd=rd, kk=s.kk + 1, stat=stat)

    def pred(s: _State):
        return (s.kk < cfg.k_max) & ((s.rp > tol_p) | (s.rd > tol_d))

    def gated(s):
        s_new = body(s)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(pred(s), a, b), s_new, s
        )

    sf = lax.while_loop(pred, gated, state0)
    status = jnp.where((sf.rp <= tol_p) & (sf.rd <= tol_d), 0, 1).astype(jnp.int32)
    return ADMMSolution(
        z=sf.z, v=sf.v, w=sf.w, pi=sf.pi, kk=sf.kk, status=status, stat=sf.stat
    )


def solve_box(dims: OCPDims, qp: OCPQP, cfg: ADMMConfig, **kw) -> ADMMSolution:
    """Box-constrained ADMM (``d_admm_box_mpc`` capability)."""
    with jax.default_matmul_precision("float32"):
        lb, ub, _ = _bounds_full(dims, qp)
        return _solve_common(dims, qp, cfg, lambda y: jnp.clip(y, lb, ub), **kw)


def solve_soft(
    dims: OCPDims,
    qp: OCPQP,
    Z: jax.Array,  # (N+1, NZ) quadratic slack penalty per coordinate (0 ok)
    z_lin: jax.Array,  # (N+1, NZ) linear slack penalty per coordinate
    cfg: ADMMConfig,
    **kw,
) -> ADMMSolution:
    """Soft-constrained ADMM (``d_admm_soft_mpc`` capability): bound
    violations are allowed at cost 1/2 Z s^2 + z_lin s (per side).  The
    v-step prox has the closed form

        v = y                                    if  lb <= y <= ub
        v = ub + max(0, rho (y-ub) - z_lin) / (rho + Z)     if y > ub
        v = lb - max(0, rho (lb-y) - z_lin) / (rho + Z)     if y < lb

    which is the fixed point of the reference's slack-splitting scheme.
    """
    with jax.default_matmul_precision("float32"):
        lb, ub, sel = _bounds_full(dims, qp)
        rho = cfg.rho

        def prox(y):
            up = ub + jnp.maximum(0.0, rho * (y - ub) - z_lin) / (rho + Z)
            lo = lb - jnp.maximum(0.0, rho * (lb - y) - z_lin) / (rho + Z)
            v = jnp.where(y > ub, up, jnp.where(y < lb, lo, y))
            # unbounded coordinates: identity
            return jnp.where(sel > 0, v, y)

        return _solve_common(dims, qp, cfg, prox, **kw)
