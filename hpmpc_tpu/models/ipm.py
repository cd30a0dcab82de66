"""Primal-dual interior-point method for hard-constrained linear MPC.

TPU-native re-design of the reference's flagship solver
``d_ip2_res_mpc_hard_tv`` (``mpc_solvers/d_ip2_res_hard.c:116``): a two-phase
Mehrotra predictor-corrector IPM whose per-iteration KKT systems are solved by
the backward Riccati recursion (:mod:`.riccati`).

Structure (mirrors the reference call stack, SURVEY.md §3.2):

  phase 1 — iterate *without* residuals while mu > max(mu_tol, 1e-5)
            (``d_ip2_res_hard.c:498-718``): the Riccati ``sv`` solves for the
            *full* new iterate; update is ``z += alpha (dz - z)``.
  phase 2 — iterate *with* exact KKT residuals (``:756-1270``): the Riccati
            solves for *deltas* against the residual rhs; update is
            ``z += alpha dz``.

Everything is padded/masked (see ``ocp.OCPQP``), so the whole solver
jit-compiles once, ``vmap``s over problem instances, and ``pjit``s over a
device mesh.  Per-instance convergence is handled by gating each while-loop
body on the instance's own continue-predicate — under ``vmap`` this freezes
converged instances exactly like the reference's early loop exit.

The per-iteration statistics contract is preserved: ``stat[k] =
[sigma, alpha_aff, mu_aff, alpha, mu]`` (``d_ip2_res_hard.c:564-567,
1011-1025``; documented ``doc/guide.tex:304-309``), with ``alpha`` values
recorded *before* the 0.995 damping, and ``mu_aff`` computed *after* it —
exactly the reference's ordering.

Elementwise step-primitive formulas are clean-room re-derivations of
``mpc_solvers/c99/d_aux_ip_hard_lib4.c`` (init_var :43, update_hessian :217,
update_gradient :387, compute_alpha :489, update_var :618, compute_mu :715,
and the ``_res_`` family :954-1639) re-expressed as masked batched array ops.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ocp import OCPDims, OCPQP
from . import riccati


@dataclasses.dataclass(frozen=True)
class IPMConfig:
    """Runtime tunables (the reference's function arguments
    ``k_max, mu0, mu_tol, alpha_min, warm_start``)."""

    k_max: int = 30
    mu0: float = 2.0
    mu_tol: float = 1e-8
    alpha_min: float = 1e-8
    warm_start: bool = False
    # phase-1 -> phase-2 switch threshold (reference THR_ITER_REF,
    # d_ip2_res_hard.c:49).  Degenerate settings recover the reference's
    # other solver variants: mu_switch=0 runs phase 1 all the way to mu_tol
    # (the legacy no-residual d_ip2_mpc_hard_tv); a huge mu_switch skips
    # phase 1 entirely (pure residual iteration from the start).
    mu_switch: float = 1e-5
    # dispatch the Riccati sweeps to the fused Pallas TPU kernels
    # (ops/stage_kernel.py) when the solve is vmapped over a batch that is a
    # multiple of 1024 instances; requires a TPU backend.
    use_pallas: bool = False
    # diagonal (Levenberg) regularization added to the stage Hessians before
    # factorization.  0.0 reproduces the reference exactly (f64 path); the
    # f32 TPU path needs ~1e-5: the barrier Hessian's condition number
    # (~lam/t ~ 1/mu) exceeds 1/eps_f32 near convergence and the Cholesky
    # loses positive-definiteness.  Phase 2 solves against exact residuals,
    # so a regularized factor is just inexact Newton — convergence to
    # mu ~ sqrt(eps) is unaffected (cf. the reference's own ITER_REF hooks,
    # d_ip2_res_hard.c:48).
    reg_eps: float = 0.0
    # iterative refinement of each KKT solve (the reference's compile-time
    # ITER_REF option, d_ip2_res_hard.c:48 / :1086-1163): after the
    # Riccati-factored solve, evaluate the Newton-system residuals with
    # full-precision matvecs (d_back_ric_res_tv) and re-solve with the
    # retained factor for a correction, `iter_ref` times.  Recovers the
    # accuracy lost to factorization roundoff / reg_eps; mainly useful on
    # the f32 path.  Supported on both the XLA backend path and the
    # flat/Pallas engine (ipm_fast.newton_refine; Pb recomputed in-kernel
    # by stage_kernel.solve_flat_pb).
    iter_ref: int = 0
    # Mehrotra corrector toggles, per phase (the reference's
    # compile-time CORRECTOR_LOW / CORRECTOR_HIGH switches,
    # d_ip2_res_hard.c:51-52): False takes the pure affine (predictor-
    # only) step in that phase — the affine direction is applied with
    # its own fraction-to-boundary step and no centering resolve.
    # stat rows then carry [stale sigma, 0, 0, alpha, mu] exactly like
    # the reference's untouched stat slots.  Structured path only
    # (the engines always run the full Mehrotra iteration).
    corrector_low: bool = True
    corrector_high: bool = True
    # mu-gated refinement (flat engine only): when > 0, the `iter_ref`
    # correction re-solves run ONLY on iterations where some instance's
    # duality measure has dropped below this threshold — early iterations
    # (mu large, barrier Hessian well conditioned, f32 directions
    # accurate) go at unrefined speed, and refinement kicks in exactly
    # where factorization roundoff starts to matter (conditioning
    # ~ 1/mu).  0.0 = refine every iteration (the reference's ITER_REF
    # semantics).  Parity-validated at 1e-2 by
    # tests/test_stage_kernel.py::test_flat_ipm_iter_ref_reaches_f64_parity.
    iter_ref_mu_thr: float = 0.0
    # f32-floor escalation (round 5): after an f32 batch solve, stalled
    # instances (status != 0) are re-solved ONCE in FULL f64 through the
    # structured path and merged per-instance
    # (parallel.batch._escalate_stalled).  Measured at the (16,1)
    # north-star size, mu_tol=1e-3, k_max=30: f32 converges 63.7%, f64
    # 67.2% — and the remaining non-converged instances diverge in f64
    # too (duals blow up; one actuator + perturbed b + tight bounds make
    # them infeasible-like).  NOTE the mixed-precision route (f32
    # factorization, the reference's single/double idea,
    # d_ip2_res_hard.c:48) does NOT close this gap: true-mixed measures
    # 62.5-62.9% (with or without f64 refinement) — near infeasibility
    # the dtype gap is trajectory chaos, not endpoint precision, so only
    # an f64 factorization recovers the f64 set.  Costs one
    # lax.cond-gated f64 batch solve only when some instance actually
    # stalled.  Off by default: the throughput benches run fixed-work
    # protocols (mu_tol=0) where "stalled" is the expected end state.
    escalate_stalled: bool = False


class IPMState(NamedTuple):
    z: jax.Array  # (N+1, NZ) primal iterate [u; x]
    pi: jax.Array  # (N, NX) equality multipliers
    lam_b: jax.Array  # (N+1, 2, NB) box ineq multipliers [lower, upper]
    t_b: jax.Array  # (N+1, 2, NB) box slacks (padded slots: lam=0, t=1)
    lam_g: jax.Array  # (N+1, 2, NG) general ineq multipliers
    t_g: jax.Array  # (N+1, 2, NG) general slacks
    mu: jax.Array  # scalar duality measure
    alpha: jax.Array  # scalar last (damped) step size
    kk: jax.Array  # int32 iteration counter
    sigma: jax.Array  # scalar last centering parameter
    stat: jax.Array  # (k_max, 5) per-iteration stats
    carry: "KKTCarry"  # retained factor + backup iterate (empty if disabled)
    # cumulative-guard anchor: max |lam| at the iterate that first
    # crossed GUARD_MU_FLOOR (+inf until then); see step_ok / anchor_lam_ref
    lam_ref: jax.Array


class KKTCarry(NamedTuple):
    """Retained Riccati factor + one-step-back iterate, the state the
    reference keeps alive in its workspace between a full IPM solve and a
    ``d_kkt_solve_new_rhs_res_mpc_hard_tv`` re-solve
    (``d_ip2_res_hard.c:1922-2299``; backup writes at :1207, :666-688).

    ``L`` is the factor from the *last* IPM iteration (factorized at the
    backup point's slack/multiplier weights); ``*_bkp`` is the iterate one
    step before the final one — exactly what the reference restores at
    :2140-2174 before taking the warm Newton step.
    """

    L: jax.Array  # (N+1, NZ, NZ)
    z_bkp: jax.Array
    pi_bkp: jax.Array
    lam_b_bkp: jax.Array
    t_b_bkp: jax.Array
    lam_g_bkp: jax.Array
    t_g_bkp: jax.Array


def _empty_carry(dt) -> KKTCarry:
    e = jnp.zeros((0,), dt)
    return KKTCarry(e, e, e, e, e, e, e)


class Residuals(NamedTuple):
    rq: jax.Array  # (N+1, NZ) stationarity
    rb: jax.Array  # (N, NX) dynamics
    rd_b: jax.Array  # (N+1, 2, NB) box constraint residuals
    rd_g: jax.Array  # (N+1, 2, NG) general constraint residuals
    rm_b: jax.Array  # (N+1, 2, NB) complementarity
    rm_g: jax.Array  # (N+1, 2, NG)
    mu: jax.Array  # scalar


class KKTBackend(NamedTuple):
    """Equality-structure backend for the IPM: the chain default uses the
    stage Riccati recursion; the scenario-tree solver injects a tree
    Riccati and tree-topology residuals (models/tree.py).

    factor_solve(Qx_b, Qx_g, g_eff, rhs_b) -> (dz, dpi, factor_state)
        (the backend owns the barrier-Hessian assembly H + diag fold +
        C'diag(Qx_g)C — the Pallas backend fuses it into the sweep kernel
        to avoid materializing (N+1, NZ, NZ) stage Hessians in HBM)
    resolve(factor_state, g_eff, rhs_b) -> (dz, dpi)
    residuals(z, pi, lam_b, t_b, lam_g, t_g, b) -> Residuals
    """

    factor_solve: object
    resolve: object
    residuals: object


class IPMSolution(NamedTuple):
    z: jax.Array
    pi: jax.Array
    lam_b: jax.Array
    t_b: jax.Array
    lam_g: jax.Array
    t_g: jax.Array
    kk: jax.Array  # iterations used
    status: jax.Array  # 0 converged, 1 max iters, 2 alpha too small
    stat: jax.Array  # (k_max, 5)
    inf_norm_res: jax.Array  # (4,) {|rq|inf, |rb|inf, |rd|inf, mu}


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def _box_onehot(qp: OCPQP):
    """(N+1, NB, NZ) one-hot of idxb masked by nb_mask: turns the reference's
    idxb gather/scatter (`dvecad_libsp`/`ddiaadin_libsp`) into matmuls."""
    NZ = qp.H.shape[-1]
    oh = jax.nn.one_hot(qp.idxb, NZ, dtype=qp.H.dtype)
    return oh * qp.nb_mask[..., None]


def _gather_box(oh, z):
    return jnp.einsum("nbz,nz->nb", oh, z)


def _scatter_box(oh, v):
    return jnp.einsum("nbz,nb->nz", oh, v)


def _cz(qp: OCPQP, z):
    return jnp.einsum("ngz,nz->ng", qp.C, z)


def _build_Heff(qp: OCPQP, oh, Qx_b, Qx_g, reg=0.0, ng_stages=None):
    """H + diag(scatter(idxb, Qx_b)) + C' diag(Qx_g) C + identity padding
    (reference ``ddiaadin_libsp`` + ``dgemm_diag_right``+``dsyrk`` fold,
    ``d_back_ric_rec.c:197-230``).  ``reg`` adds Levenberg regularization
    for low-precision factorization (see IPMConfig.reg_eps).

    ``ng_stages`` (static tuple) restricts the general-constraint fold to
    the stages that actually have general rows — MPC problems typically
    constrain only a few stages (e.g. the terminal), and materializing the
    (N+1, NG, NZ, NZ) contraction over every stage is pure HBM waste."""
    NZ = qp.H.shape[-1]
    dvec = _scatter_box(oh, Qx_b) + qp.pad_diag + jnp.asarray(reg, qp.dtype)
    H = qp.H + jnp.eye(NZ, dtype=qp.H.dtype)[None] * dvec[:, None, :]
    if ng_stages is None:
        H = H + jnp.einsum("ngz,ng,ngw->nzw", qp.C, Qx_g * qp.ng_mask, qp.C)
    elif len(ng_stages) > 0:
        idx = np.asarray(ng_stages)
        H = H.at[idx].add(
            jnp.einsum(
                "ngz,ng,ngw->nzw",
                qp.C[idx],
                Qx_g[idx] * qp.ng_mask[idx],
                qp.C[idx],
            )
        )
    return H


def _build_geff(qp: OCPQP, oh, base, qx_b, qx_g, ng_stages=None):
    """base + scatter(idxb, qx_b) + C' qx_g (reference ``drowad_libsp`` +
    ``drowin``/``dgemv`` gradient fold)."""
    out = base + _scatter_box(oh, qx_b)
    if ng_stages is None:
        out = out + jnp.einsum("ngz,ng->nz", qp.C, qx_g * qp.ng_mask)
    elif len(ng_stages) > 0:
        idx = np.asarray(ng_stages)
        out = out.at[idx].add(
            jnp.einsum("ngz,ng->nz", qp.C[idx], qx_g[idx] * qp.ng_mask[idx])
        )
    return out


def _min_ratio(alpha, v, dv, mask):
    """Fraction-to-boundary: alpha = min(alpha, min_{dv<0, valid} -v/dv)
    (reference sequential form ``d_aux_ip_hard_lib4.c:535-550`` — each update
    only shrinks alpha, so the sequential scan equals the global min)."""
    pred = (dv < 0.0) & (mask > 0.0)
    safe = jnp.where(pred, dv, -1.0)
    ratio = jnp.where(pred, -v / safe, jnp.inf)
    return jnp.minimum(alpha, jnp.min(ratio))


def _sum_lt(lam_b, t_b, lam_g, t_g, nb_mask, ng_mask):
    s = jnp.sum(lam_b * t_b * nb_mask[:, None, :])
    s += jnp.sum(lam_g * t_g * ng_mask[:, None, :])
    return s


# --------------------------------------------------------------------------
# variable initialization (d_init_var_mpc_hard_tv, d_aux_ip_hard_lib4.c:43)
# --------------------------------------------------------------------------


def init_vars(dims: OCPDims, qp: OCPQP, cfg: IPMConfig, z0=None, pi0=None,
              carry0: KKTCarry | None = None, iterate0=None):
    if iterate0 is not None:
        # full warm start from a provided iterate (the reference's
        # d_init_var_mpc_hard_tv_single_newton, d_aux_ip_hard_lib4.c:154)
        z0_, pi0_, lam_b0, t_b0, lam_g0, t_g0 = iterate0
        dt = qp.dtype
        return IPMState(
            z=z0_, pi=pi0_,
            lam_b=lam_b0, t_b=t_b0, lam_g=lam_g0, t_g=t_g0,
            mu=jnp.asarray(cfg.mu0, dt),
            alpha=jnp.asarray(1.0, dt),
            kk=jnp.asarray(0, jnp.int32),
            sigma=jnp.asarray(0.0, dt),
            stat=jnp.zeros((cfg.k_max, 5), dt),
            carry=carry0 if carry0 is not None else _empty_carry(dt),
            lam_ref=jnp.asarray(jnp.inf, dt),
        )
    dt = qp.dtype
    N = dims.N
    NZ, NX, NB, NG = dims.NZ, dims.NX, dims.NB, dims.NG
    thr0 = jnp.asarray(0.1, dt)
    mu0 = jnp.asarray(cfg.mu0, dt)

    if cfg.warm_start and z0 is not None:
        z = z0
    else:
        z = jnp.zeros((N + 1, NZ), dt)

    oh = _box_onehot(qp)
    mb = qp.nb_mask

    zb = _gather_box(oh, z)
    t_lo0 = zb - qp.d_lb
    t_up0 = qp.d_ub - zb
    both = (t_lo0 < thr0) & (t_up0 < thr0)
    lo_only = (t_lo0 < thr0) & ~both
    up_only = (t_up0 < thr0) & ~both
    # exact reference branching (incl. its stale-slack quirk: when only one
    # side is violated the other side's slack keeps its pre-correction value)
    t_lo = jnp.where(both | lo_only, thr0, t_lo0)
    t_up = jnp.where(both | up_only, thr0, t_up0)
    z_corr = jnp.where(
        both,
        (qp.d_lb - qp.d_ub) * 0.5,
        jnp.where(
            lo_only, qp.d_lb + thr0, jnp.where(up_only, qp.d_ub - thr0, zb)
        ),
    )
    changed = (both | lo_only | up_only) & (mb > 0)
    # scatter corrected coordinates back into z
    sel = _scatter_box(oh, changed.astype(dt))
    z = z * (1.0 - sel) + _scatter_box(oh, jnp.where(changed, z_corr, 0.0))

    t_b = jnp.stack([t_lo, t_up], axis=1)
    t_b = jnp.where(mb[:, None, :] > 0, t_b, 1.0)
    lam_b = jnp.where(mb[:, None, :] > 0, mu0 / t_b, 0.0)

    # general constraints: slacks from the (corrected) iterate, clamped
    mg = qp.ng_mask
    cz = _cz(qp, z)
    tg_lo = jnp.maximum(thr0, cz - qp.d_lg)
    tg_up = jnp.maximum(thr0, qp.d_ug - cz)
    t_g = jnp.stack([tg_lo, tg_up], axis=1)
    t_g = jnp.where(mg[:, None, :] > 0, t_g, 1.0)
    lam_g = jnp.where(mg[:, None, :] > 0, mu0 / t_g, 0.0)

    pi = pi0 if (cfg.warm_start and pi0 is not None) else jnp.zeros((N, NX), dt)

    return IPMState(
        z=z,
        pi=pi,
        lam_b=lam_b,
        t_b=t_b,
        lam_g=lam_g,
        t_g=t_g,
        mu=mu0,
        alpha=jnp.asarray(1.0, dt),
        kk=jnp.asarray(0, jnp.int32),
        sigma=jnp.asarray(0.0, dt),
        stat=jnp.zeros((cfg.k_max, 5), dt),
        carry=carry0 if carry0 is not None else _empty_carry(dt),
        lam_ref=jnp.asarray(jnp.inf, dt),
    )


# --------------------------------------------------------------------------
# residuals (d_res_res_mpc_hard_tv, mpc_solvers/c99/d_res_ip_res_hard.c:39)
# --------------------------------------------------------------------------


#: mu level below which the f32 breakdown guards arm (barrier
#: conditioning ~1/mu outruns f32 near here)
GUARD_MU_FLOOR = 1e-3


def step_ok(mu_new, mu_old, lam_max_new=None, lam_max_old=None,
            lam_ref=None):
    """Numerical-breakdown guard predicate, shared by every solver loop
    (structured / flat / lanes, hard and soft).

    Freezes the last good iterate (alpha-min exit, status=2) when the
    accepted step produced (a) a non-finite duality measure — the
    reference's unimplemented "if mu is nan, recover solution" hook,
    ``d_ip2_res_hard.c:1306-1311`` — or, on f32 only, (b) a DIVERGING
    one: mu growing >10x from below 1e-3 means the barrier system's
    conditioning (~1/mu) has outrun f32 and the computed direction is
    garbage, or (c) EXPLODING duals: ``lam``'s max growing >30x in one
    step from below-floor mu — the blowup mode mu alone misses, because
    a huge-lam/tiny-t pair leaves the duality products balanced
    (measured at nx=16 nu=3: 1-2 instances per 1024 reach lam ~1e4 on a
    mu-DECREASING step while their controls stay within 1e-3 of the f64
    trajectory — tools/diag_eng_resid.py).  Healthy solves never
    trigger (b)/(c): neither occurs on the central path at
    f32-reachable tolerances, and f64 is exempt.

    ``lam_ref`` (round 5, VERDICT r04 Weak #3): the CUMULATIVE twin of
    (c) — the max dual at the iterate where the instance first crossed
    ``GUARD_MU_FLOOR`` (the anchor; carried in the loop state, updated
    via :func:`anchor_lam_ref`).  Gradual multi-step climbs (e.g. ~5x
    per step for 4 steps) walk through the per-step 30x gate but not
    the anchored one.  Same 30x factor: a healthy max-dual does not
    grow 30x TOTAL after entering the floor region — multipliers
    stabilize toward their converged values there.
    """
    ok = jnp.isfinite(mu_new)
    if mu_new.dtype == jnp.float32:
        floor = mu_old < GUARD_MU_FLOOR
        ok = ok & ~((mu_new > 10.0 * mu_old) & floor)
        if lam_max_new is not None:
            # 30x: the measured blowups climb ~58x then ~6.5x per step
            # (a 100x per-step gate missed them); a healthy max-dual
            # does not jump 30x at mu < 1e-3 — multipliers stabilize
            # toward their converged values there
            ok = ok & ~(
                (lam_max_new > 30.0 * jnp.maximum(lam_max_old, 1.0))
                & floor
            )
        if lam_ref is not None:
            ok = ok & ~(
                (lam_max_new > 30.0 * lam_ref) & jnp.isfinite(lam_ref)
            )
    return ok


def anchor_lam_ref(lam_ref, mu_old, mu_new, lam_max_new):
    """Carry update for the cumulative-guard anchor: on the step that
    first takes an instance below :data:`GUARD_MU_FLOOR`, record
    ``max(|lam|, 1)``; afterwards keep the anchor.  Initialize the
    carry to ``+inf`` (guard inert until the anchor exists; f64 loops
    can carry it harmlessly — step_ok ignores it there)."""
    entering = jnp.isinf(lam_ref) & (mu_new < GUARD_MU_FLOOR)
    return jnp.where(
        entering, jnp.maximum(lam_max_new, 1.0).astype(lam_ref.dtype),
        lam_ref)


def compute_residuals(qp: OCPQP, oh, mu_scal, z, pi, lam_b, t_b, lam_g, t_g):
    N = qp.F.shape[0]
    NU = qp.H.shape[-1] - qp.x_mask.shape[-1]
    mb, mg = qp.nb_mask, qp.ng_mask

    # stationarity: rq = g + H z + [0; -pi_{n-1}] + F_n pi_n + box/gen terms
    rq = qp.g + jnp.einsum("nzw,nw->nz", qp.H, z)
    pi_pad = jnp.concatenate([jnp.zeros_like(pi[:1]), pi], axis=0)  # (N+1,NX)
    rq = rq.at[:, NU:].add(-pi_pad)
    rq = rq.at[:N].add(jnp.einsum("nzx,nx->nz", qp.F, pi))
    dlam_net_b = (lam_b[:, 1] - lam_b[:, 0]) * mb
    rq = rq + _scatter_box(oh, dlam_net_b)
    dlam_net_g = (lam_g[:, 1] - lam_g[:, 0]) * mg
    rq = rq + jnp.einsum("ngz,ng->nz", qp.C, dlam_net_g)
    rq = rq * qp.z_mask

    # dynamics: rb = b + F' z_n - x_{n+1}
    rb = qp.b + jnp.einsum("nzx,nz->nx", qp.F, z[:N]) - z[1:, NU:]
    rb = rb * qp.x_mask[1:]

    # inequality residuals
    zb = _gather_box(oh, z)
    rd_b = jnp.stack(
        [qp.d_lb - zb + t_b[:, 0], qp.d_ub - zb - t_b[:, 1]], axis=1
    )
    rd_b = rd_b * mb[:, None, :]
    cz = _cz(qp, z)
    rd_g = jnp.stack(
        [qp.d_lg + t_g[:, 0] - cz, qp.d_ug - t_g[:, 1] - cz], axis=1
    )
    rd_g = rd_g * mg[:, None, :]

    # complementarity
    rm_b = lam_b * t_b * mb[:, None, :]
    rm_g = lam_g * t_g * mg[:, None, :]
    mu = (jnp.sum(rm_b) + jnp.sum(rm_g)) * mu_scal

    return Residuals(rq=rq, rb=rb, rd_b=rd_b, rd_g=rd_g, rm_b=rm_b, rm_g=rm_g, mu=mu)


# --------------------------------------------------------------------------
# chain (stage-recursion) backend
# --------------------------------------------------------------------------


def make_pallas_chain_kkt(ng_stages: tuple, NU: int):
    """A ``custom_vmap`` (factor_solve, trs) pair for the chain KKT system.

    Un-vmapped (or with a batch that is not a 1024-multiple) the pair runs
    the per-instance XLA Riccati; vmapped over a ``stage_kernel.BI``-
    multiple batch it dispatches to the fused Pallas stage kernels.  The
    effective Hessian is passed DECOMPOSED (constant ``H`` + diagonal
    ``dvec`` + ng-stage barrier term) so the Pallas route can assemble it
    in VMEM (``factor_solve_folded``) instead of materializing the 17x
    tile-padded ``(B, N+1, NZ, NZ)`` stack in HBM.

    Shared by the hard-IPM structured route (:func:`chain_backend`) and
    the soft IPM (:mod:`.ipm_soft`) — the soft barrier's Schur-eliminated
    slack terms fold into ``dvec`` (pure diagonal), so the same kernels
    serve both (reference twin: ``d_ip2_soft.c`` reusing the hard Riccati,
    SURVEY.md §2)."""
    from ..ops import stage_kernel

    @jax.custom_batching.custom_vmap
    def _fs(dvec, Qx_g, g_eff, H, C, F, rhs_b):
        H_eff = H + jnp.eye(H.shape[-1], dtype=H.dtype)[None] * dvec[:, None, :]
        if len(ng_stages) > 0:
            idx = np.asarray(ng_stages)
            H_eff = H_eff.at[idx].add(
                jnp.einsum("ngz,ng,ngw->nzw", C[idx], Qx_g[idx], C[idx])
            )
        sol, L, eu, px, Pb = riccati.factor_solve(H_eff, g_eff, F, rhs_b, NU)
        return sol.z, sol.pi, L, Pb

    def _blocked_ok(axis_size, dtype):
        """Gate for the blocked medium/large-NZ branch.

        On TPU: any sublane-multiple batch, f32 only (the batch_chol
        Pallas kernel cannot lower f64 on hardware — f64 degrades to the
        vmapped XLA path instead of failing compile).  On CPU the gate
        stays at the BI multiple so ordinary f64 parity tests keep the
        pure-XLA route (Pallas on CPU only runs under the tests'
        interpret monkeypatch)."""
        from ..ops import stage_kernel

        if jax.default_backend() == "tpu":
            return axis_size % 8 == 0 and dtype == jnp.float32
        return axis_size % stage_kernel.BI == 0

    @_fs.def_vmap
    def _fs_vmap(axis_size, in_batched, dvec, Qx_g, g, H, C, F, rhs_b):
        assert all(in_batched), "pallas path expects fully batched data"
        NZ = H.shape[-1]
        fits = stage_kernel.engine_fits(NZ - NU, NU) and (
            H.dtype == jnp.float32 or jax.default_backend() != "tpu")
        if axis_size % stage_kernel.BI == 0 and fits:
            if len(ng_stages) > 0:
                idx = np.asarray(ng_stages)
                ngterm = jnp.einsum(
                    "bngz,bng,bngw->bnzw", C[:, idx], Qx_g[:, idx], C[:, idx]
                )
            else:
                ngterm = jnp.zeros(
                    (axis_size, 0, H.shape[-1], H.shape[-1]), H.dtype
                )
            z, pi, L, eu, px, Pb = stage_kernel.factor_solve_folded(
                H, dvec, ngterm, ng_stages, g, F, rhs_b, NU
            )
        elif _blocked_ok(axis_size, H.dtype):
            # MEDIUM/LARGE band: past the per-scalar engines' VMEM
            # envelope the batch rides the blocked Riccati — batched
            # MXU matmuls per stage with the Pallas right-looking
            # Cholesky replacing the D&C recursion (ops/batch_chol),
            # effective Hessians assembled in-scan (never in HBM).
            from . import riccati_blocked

            # fun's semantics: the barrier term only exists at ng_stages
            smask = np.zeros((1, H.shape[1], 1), dtype=np.float64)
            if len(ng_stages) > 0:
                smask[:, np.asarray(ng_stages)] = 1.0
            sol, L, eu, px, Pb = riccati_blocked.factor_solve_folded(
                H, dvec, C, Qx_g * jnp.asarray(smask, Qx_g.dtype),
                g, F, rhs_b, NU
            )
            z, pi = sol.z, sol.pi
        else:
            z, pi, L, Pb = jax.vmap(
                lambda *a: _fs.fun(*a)
            )(dvec, Qx_g, g, H, C, F, rhs_b)
        return (z, pi, L, Pb), (True, True, True, True)

    @jax.custom_batching.custom_vmap
    def _trs(L, g_eff, F, rhs_b, Pb):
        sol, _ = riccati.solve(L, g_eff, F, rhs_b, NU, Pb=Pb)
        return sol.z, sol.pi

    @_trs.def_vmap
    def _trs_vmap(axis_size, in_batched, L, g, F, rhs_b, Pb):
        assert all(in_batched)
        fits = stage_kernel.engine_fits(F.shape[-1], NU) and (
            L.dtype == jnp.float32 or jax.default_backend() != "tpu")
        if axis_size % stage_kernel.BI == 0 and fits:
            z, pi = stage_kernel.solve_batched(L, g, F, rhs_b, Pb, NU)
        elif _blocked_ok(axis_size, L.dtype):
            from . import riccati_blocked

            sol, _ = riccati_blocked.solve(L, g, F, rhs_b, NU, Pb=Pb)
            z, pi = sol.z, sol.pi
        else:
            z, pi = jax.vmap(lambda *a: _trs.fun(*a))(L, g, F, rhs_b, Pb)
        return (z, pi), (True, True)

    return _fs, _trs


def chain_backend(
    dims: OCPDims, qp: OCPQP, oh, mu_scal, use_pallas: bool = False,
    reg_eps: float = 0.0, iter_ref: int = 0,
) -> KKTBackend:
    """Default backend: stage-chain Riccati + chain residual topology.

    With ``use_pallas`` the factor/solve calls go through
    ``jax.custom_batching.custom_vmap`` wrappers: a vmapped solve over a
    1024-multiple batch dispatches to the fused Pallas stage kernels
    (ops/stage_kernel.py) instead of the vmapped XLA scan — same math,
    intermediates pinned in VMEM."""
    NU = dims.NU

    ng_stages = tuple(n for n in range(dims.N + 1) if dims.ng[n] > 0)
    reg = reg_eps

    if use_pallas:
        _fs, _trs = make_pallas_chain_kkt(ng_stages, NU)

        def factor_solve(Qx_b, Qx_g, g_eff, rhs_b):
            dvec = (
                _scatter_box(oh, Qx_b)
                + qp.pad_diag
                + jnp.asarray(reg, qp.dtype)
            )
            z, pi, L, Pb = _fs(
                dvec, Qx_g * qp.ng_mask, g_eff, qp.H, qp.C, qp.F, rhs_b
            )
            return z, pi, (L, Pb)

        def resolve(fstate, g_eff, rhs_b):
            L, Pb = fstate
            return _trs(L, g_eff, qp.F, rhs_b, Pb)

    else:

        def _refine(L, H_eff, g_eff, rhs_b, z, pi):
            """Iterative refinement (reference ITER_REF, d_ip2_res_hard.c:48):
            full-precision Newton residuals via d_back_ric_res_tv semantics,
            correction re-solve with the retained factor.  Pb is recomputed
            per correction (its cache is keyed to the original rhs)."""
            for _ in range(iter_ref):
                rq, rb = riccati.kkt_residuals(H_eff, g_eff, qp.F, rhs_b, z, pi, NU)
                dsol, _ = riccati.solve(L, rq, qp.F, rb, NU)
                z = z + dsol.z
                pi = pi + dsol.pi
            return z, pi

        def factor_solve(Qx_b, Qx_g, g_eff, rhs_b):
            H_eff = _build_Heff(qp, oh, Qx_b, Qx_g, reg=reg, ng_stages=ng_stages)
            sol, L, eu, px, Pb = riccati.factor_solve(H_eff, g_eff, qp.F, rhs_b, NU)
            z, pi = _refine(L, H_eff, g_eff, rhs_b, sol.z, sol.pi)
            return z, pi, (L, Pb, H_eff) if iter_ref else (L, Pb)

        def resolve(fstate, g_eff, rhs_b):
            if iter_ref:
                L, Pb, H_eff = fstate
            else:
                L, Pb = fstate
            sol, _ = riccati.solve(L, g_eff, qp.F, rhs_b, NU, Pb=Pb)
            if iter_ref:
                return _refine(L, H_eff, g_eff, rhs_b, sol.z, sol.pi)
            return sol.z, sol.pi

    def residuals(z, pi, lam_b, t_b, lam_g, t_g, rhs_b):
        import dataclasses as _dc

        qp_b = _dc.replace(qp, b=rhs_b)
        return compute_residuals(qp_b, oh, mu_scal, z, pi, lam_b, t_b, lam_g, t_g)

    return KKTBackend(factor_solve=factor_solve, resolve=resolve, residuals=residuals)


# --------------------------------------------------------------------------
# the solver
# --------------------------------------------------------------------------


def solve(
    dims: OCPDims,
    qp: OCPQP,
    cfg: IPMConfig,
    z0=None,
    pi0=None,
    return_carry: bool = False,
    backend: "KKTBackend | None" = None,
    iterate0=None,
    rti_mode: bool = False,
) -> IPMSolution:
    """Solve the hard-constrained OCP QP.  Jit/vmap/pjit-safe.

    Mirrors ``d_ip2_res_mpc_hard_tv`` (``mpc_solvers/d_ip2_res_hard.c:116``)
    including the per-iteration ``stat`` trace and exit conditions.

    With ``return_carry=True`` also returns a :class:`KKTCarry` for
    :func:`kkt_solve_new_rhs` re-solves (the reference's retained-workspace
    idiom).

    All matmuls are pinned to float32 precision: TPU MXUs default to bf16
    multiplication, whose 8-bit mantissa destroys IPM convergence (the
    iterates stall around mu~1e-1 and the Cholesky eventually NaNs).
    """
    with jax.default_matmul_precision("float32"):
        return _solve_impl(
            dims, qp, cfg, z0, pi0, return_carry, backend, iterate0, rti_mode
        )


def _solve_impl(
    dims: OCPDims,
    qp: OCPQP,
    cfg: IPMConfig,
    z0=None,
    pi0=None,
    return_carry: bool = False,
    backend: "KKTBackend | None" = None,
    iterate0=None,
    rti_mode: bool = False,
) -> IPMSolution:
    dt = qp.dtype
    N, NU = dims.N, dims.NU
    n_constr = dims.n_constr

    if n_constr == 0:
        # no inequality constraints: single Riccati solve (reference :435-450)
        H_eff = qp.H + jnp.eye(dims.NZ, dtype=dt)[None] * qp.pad_diag[:, None, :]
        sol, L, eu, px, Pb = riccati.factor_solve(
            H_eff, qp.g * qp.z_mask, qp.F, qp.b, NU
        )
        zeros4 = jnp.zeros((4,), dt)
        lam_b0 = jnp.zeros((dims.N + 1, 2, dims.NB), dt)
        lam_g0 = jnp.zeros((dims.N + 1, 2, dims.NG), dt)
        sol_unc = IPMSolution(
            z=sol.z * qp.z_mask,
            pi=sol.pi * qp.x_mask[1:],
            lam_b=lam_b0,
            t_b=jnp.ones_like(lam_b0),
            lam_g=lam_g0,
            t_g=jnp.ones_like(lam_g0),
            kk=jnp.asarray(0, jnp.int32),
            status=jnp.asarray(0, jnp.int32),
            stat=jnp.zeros((cfg.k_max, 5), dt),
            inf_norm_res=zeros4,
        )
        if return_carry:
            carry = KKTCarry(
                L, sol_unc.z, sol_unc.pi,
                lam_b0, jnp.ones_like(lam_b0),
                lam_g0, jnp.ones_like(lam_g0),
            )
            return sol_unc, carry
        return sol_unc

    mu_scal = jnp.asarray(1.0 / n_constr, dt)
    mu_tol = jnp.asarray(cfg.mu_tol, dt)
    mu_tol_low = jnp.asarray(max(cfg.mu_tol, cfg.mu_switch), dt)
    alpha_min = jnp.asarray(cfg.alpha_min, dt)
    k_max = cfg.k_max

    oh = _box_onehot(qp)
    mb, mg = qp.nb_mask, qp.ng_mask
    mb2, mg2 = mb[:, None, :], mg[:, None, :]

    ng_stages = tuple(n for n in range(dims.N + 1) if dims.ng[n] > 0)

    if backend is None:
        # iter_ref through the STRUCTURED path runs on the XLA backend (the
        # structured custom_vmap Pallas wrappers have no refine hook); the
        # batch-level flat engine (ipm_fast, entered via
        # parallel.batch.solve_batched) supports iter_ref natively through
        # stage_kernel.solve_flat_pb.
        backend = chain_backend(
            dims, qp, oh, mu_scal,
            use_pallas=cfg.use_pallas and not cfg.iter_ref,
            reg_eps=cfg.reg_eps, iter_ref=cfg.iter_ref,
        )

    if return_carry:
        NZ = dims.NZ
        carry0 = KKTCarry(
            L=jnp.zeros((dims.N + 1, NZ, NZ), dt),
            z_bkp=jnp.zeros((dims.N + 1, NZ), dt),
            pi_bkp=jnp.zeros((dims.N, dims.NX), dt),
            lam_b_bkp=jnp.zeros((dims.N + 1, 2, dims.NB), dt),
            t_b_bkp=jnp.ones((dims.N + 1, 2, dims.NB), dt),
            lam_g_bkp=jnp.zeros((dims.N + 1, 2, dims.NG), dt),
            t_g_bkp=jnp.ones((dims.N + 1, 2, dims.NG), dt),
        )
    else:
        carry0 = None
    state0 = init_vars(
        dims, qp, cfg, z0=z0, pi0=pi0, carry0=carry0, iterate0=iterate0
    )

    # -------------------- phase 1: no residuals --------------------

    def dt_dlam_phase1(z_new, t_b, t_g, lam_b, t_inv_b, t_inv_g, dlam0_b, dlam0_g, lam_g):
        """dt from the *full* new iterate; dlam = dlam0 - lam*t_inv*dt - lam
        (compute_alpha, d_aux_ip_hard_lib4.c:489-614)."""
        zb = _gather_box(oh, z_new)
        dtb = jnp.stack([zb - qp.d_lb - t_b[:, 0], -zb + qp.d_ub - t_b[:, 1]], axis=1)
        dtb = dtb * mb2
        cz = _cz(qp, z_new)
        dtg = jnp.stack([cz - qp.d_lg - t_g[:, 0], -cz + qp.d_ug - t_g[:, 1]], axis=1)
        dtg = dtg * mg2
        dlam_b = (dlam0_b - lam_b * t_inv_b * dtb - lam_b) * mb2
        dlam_g = (dlam0_g - lam_g * t_inv_g * dtg - lam_g) * mg2
        return dtb, dtg, dlam_b, dlam_g

    def alpha_all(dtb, dtg, dlam_b, dlam_g, t_b, t_g, lam_b, lam_g):
        a = jnp.asarray(1.0, dt)
        a = _min_ratio(a, lam_b, dlam_b, mb2 * jnp.ones_like(lam_b))
        a = _min_ratio(a, t_b, dtb, mb2 * jnp.ones_like(t_b))
        a = _min_ratio(a, lam_g, dlam_g, mg2 * jnp.ones_like(lam_g))
        a = _min_ratio(a, t_g, dtg, mg2 * jnp.ones_like(t_g))
        return a

    def mu_pred(alpha, lam_b, dlam_b, t_b, dtb, lam_g, dlam_g, t_g, dtg):
        return (
            _sum_lt(
                lam_b + alpha * dlam_b,
                t_b + alpha * dtb,
                lam_g + alpha * dlam_g,
                t_g + alpha * dtg,
                mb,
                mg,
            )
            * mu_scal
        )

    def phase1_body(s: IPMState) -> IPMState:
        t_inv_b = jnp.where(mb2 > 0, 1.0 / s.t_b, 0.0)
        t_inv_g = jnp.where(mg2 > 0, 1.0 / s.t_g, 0.0)
        lamt_b = s.lam_b * t_inv_b
        lamt_g = s.lam_g * t_inv_g

        # hessian/gradient fold (update_hessian with sigma_mu=0, :217)
        Qx_b = (lamt_b[:, 0] + lamt_b[:, 1]) * mb
        Qx_g = (lamt_g[:, 0] + lamt_g[:, 1]) * mg
        qx_b = (
            s.lam_b[:, 1]
            - lamt_b[:, 1] * qp.d_ub
            - s.lam_b[:, 0]
            - lamt_b[:, 0] * qp.d_lb
        ) * mb
        qx_g = (
            s.lam_g[:, 1]
            - lamt_g[:, 1] * qp.d_ug
            - s.lam_g[:, 0]
            - lamt_g[:, 0] * qp.d_lg
        ) * mg

        g_eff = _build_geff(qp, oh, qp.g * qp.z_mask, qx_b, qx_g, ng_stages=ng_stages)

        # affine (predictor) solve: full new iterate
        dz, dpi, fstate = backend.factor_solve(Qx_b, Qx_g, g_eff, qp.b)

        dtb, dtg, dlam_b, dlam_g = dt_dlam_phase1(
            dz, s.t_b, s.t_g, s.lam_b, t_inv_b, t_inv_g,
            jnp.zeros_like(s.lam_b), jnp.zeros_like(s.lam_g), s.lam_g,
        )
        alpha_aff = alpha_all(dtb, dtg, dlam_b, dlam_g, s.t_b, s.t_g, s.lam_b, s.lam_g)
        if cfg.corrector_low:
            a = alpha_aff * 0.995
            mu_aff = mu_pred(a, s.lam_b, dlam_b, s.t_b, dtb, s.lam_g, dlam_g, s.t_g, dtg)
            sigma = (mu_aff / s.mu) ** 3

            # corrector gradient update (update_gradient, :387)
            sm = sigma * s.mu
            dlam2_b = t_inv_b * (sm - dlam_b * dtb) * mb2
            dlam2_g = t_inv_g * (sm - dlam_g * dtg) * mg2
            qx_b2 = qx_b + (dlam2_b[:, 1] - dlam2_b[:, 0]) * mb
            qx_g2 = qx_g + (dlam2_g[:, 1] - dlam2_g[:, 0]) * mg
            g_eff2 = _build_geff(
                qp, oh, qp.g * qp.z_mask, qx_b2, qx_g2, ng_stages=ng_stages
            )

            dz2, dpi2 = backend.resolve(fstate, g_eff2, qp.b)

            dtb, dtg, dlam_b, dlam_g = dt_dlam_phase1(
                dz2, s.t_b, s.t_g, s.lam_b, t_inv_b, t_inv_g, dlam2_b, dlam2_g, s.lam_g
            )
            alpha2 = alpha_all(dtb, dtg, dlam_b, dlam_g, s.t_b, s.t_g, s.lam_b, s.lam_g)
        else:
            # predictor-only step (reference CORRECTOR_LOW=0,
            # d_ip2_res_hard.c:643): the affine direction is applied
            # directly; sigma stays stale, alpha_aff/mu_aff unrecorded
            dz2, dpi2 = dz, dpi
            alpha2 = alpha_aff
            mu_aff = jnp.zeros_like(s.mu)
            alpha_aff = jnp.zeros_like(alpha_aff)
            sigma = s.sigma
        a2 = alpha2 * 0.995

        z_new = s.z + a2 * (dz2 - s.z)
        pi_new = s.pi + a2 * (dpi2 - s.pi)
        lam_b_new = s.lam_b + a2 * dlam_b
        t_b_new = s.t_b + a2 * dtb
        lam_g_new = s.lam_g + a2 * dlam_g
        t_g_new = s.t_g + a2 * dtg
        mu_new = _sum_lt(lam_b_new, t_b_new, lam_g_new, t_g_new, mb, mg) * mu_scal

        row = jnp.stack([sigma, alpha_aff, mu_aff, alpha2, mu_new])
        stat = lax.dynamic_update_slice(s.stat, row[None].astype(dt), (s.kk, jnp.asarray(0, s.kk.dtype)))

        carry = (
            KKTCarry(fstate[0], s.z, s.pi, s.lam_b, s.t_b, s.lam_g, s.t_g)
            if return_carry
            else s.carry
        )
        lmx_new = jnp.maximum(jnp.max(jnp.abs(lam_b_new)),
                              jnp.max(jnp.abs(lam_g_new)))
        s_new = IPMState(
            z=z_new, pi=pi_new,
            lam_b=lam_b_new, t_b=t_b_new, lam_g=lam_g_new, t_g=t_g_new,
            mu=mu_new, alpha=a2, kk=s.kk + 1, sigma=sigma, stat=stat,
            carry=carry,
            lam_ref=anchor_lam_ref(s.lam_ref, s.mu, mu_new, lmx_new),
        )
        # numerical-breakdown guard: see step_ok (finite + f32
        # divergence/dual-explosion freeze, incl. the anchored
        # cumulative-growth gate)
        lmx_old = jnp.maximum(jnp.max(jnp.abs(s.lam_b)),
                              jnp.max(jnp.abs(s.lam_g)))
        ok = step_ok(mu_new, s.mu, lmx_new, lmx_old, lam_ref=s.lam_ref)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b),
            s_new,
            s._replace(alpha=jnp.zeros_like(s.alpha)),
        )

    def phase1_pred(s: IPMState):
        return (s.kk < k_max) & (s.mu > mu_tol_low) & (s.alpha >= alpha_min)

    def gated(body, pred):
        def f(s):
            s_new = body(s)
            take = pred(s)
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(take, a, b), s_new, s
            )
        return f

    if rti_mode:
        state1 = state0  # no phase-1 loop (d_ip2_..._single_newton_step:1686)
    else:
        state1 = lax.while_loop(
            phase1_pred, gated(phase1_body, phase1_pred), state0
        )

    # -------------------- phase 2: with residuals --------------------

    res1 = backend.residuals(
        state1.z, state1.pi,
        state1.lam_b, state1.t_b, state1.lam_g, state1.t_g, qp.b,
    )
    state1 = state1._replace(mu=res1.mu)

    def dt_dlam_res(dz, res: Residuals, t_inv_b, t_inv_g, lam_b, lam_g):
        """delta slacks from delta iterate and constraint residuals
        (compute_alpha_res, d_aux_ip_hard_lib4.c:1180-1313)."""
        dzb = _gather_box(oh, dz)
        dtb = jnp.stack([dzb - res.rd_b[:, 0], -dzb + res.rd_b[:, 1]], axis=1) * mb2
        cdz = _cz(qp, dz)
        dtg = jnp.stack([cdz - res.rd_g[:, 0], -cdz + res.rd_g[:, 1]], axis=1) * mg2
        dlam_b = -t_inv_b * (lam_b * dtb + res.rm_b) * mb2
        dlam_g = -t_inv_g * (lam_g * dtg + res.rm_g) * mg2
        return dtb, dtg, dlam_b, dlam_g

    def phase2_body(carry):
        s, res = carry
        t_inv_b = jnp.where(mb2 > 0, 1.0 / s.t_b, 0.0)
        t_inv_g = jnp.where(mg2 > 0, 1.0 / s.t_g, 0.0)

        # update_hessian_gradient_res (:954)
        Qx_b = (t_inv_b[:, 0] * s.lam_b[:, 0] + t_inv_b[:, 1] * s.lam_b[:, 1]) * mb
        Qx_g = (t_inv_g[:, 0] * s.lam_g[:, 0] + t_inv_g[:, 1] * s.lam_g[:, 1]) * mg

        def qx_from(res_m_b, res_m_g):
            qxb = (
                t_inv_b[:, 0] * (res_m_b[:, 0] - s.lam_b[:, 0] * res.rd_b[:, 0])
                - t_inv_b[:, 1] * (res_m_b[:, 1] + s.lam_b[:, 1] * res.rd_b[:, 1])
            ) * mb
            qxg = (
                t_inv_g[:, 0] * (res_m_g[:, 0] - s.lam_g[:, 0] * res.rd_g[:, 0])
                - t_inv_g[:, 1] * (res_m_g[:, 1] + s.lam_g[:, 1] * res.rd_g[:, 1])
            ) * mg
            return qxb, qxg

        qx_b, qx_g = qx_from(res.rm_b, res.rm_g)
        g_eff = _build_geff(qp, oh, res.rq, qx_b, qx_g, ng_stages=ng_stages)

        dz, dpi, fstate = backend.factor_solve(Qx_b, Qx_g, g_eff, res.rb)

        dtb, dtg, dlam_b, dlam_g = dt_dlam_res(dz, res, t_inv_b, t_inv_g, s.lam_b, s.lam_g)
        alpha_aff = alpha_all(dtb, dtg, dlam_b, dlam_g, s.t_b, s.t_g, s.lam_b, s.lam_g)
        if cfg.corrector_high:
            a = alpha_aff * 0.995
            mu_aff = mu_pred(a, s.lam_b, dlam_b, s.t_b, dtb, s.lam_g, dlam_g, s.t_g, dtg)
            sigma = (mu_aff / s.mu) ** 3

            # centering correction folded into res_m (:1512) + gradient (:1550)
            sm = sigma * s.mu
            rm_b2 = res.rm_b + (dtb * dlam_b - sm) * mb2
            rm_g2 = res.rm_g + (dtg * dlam_g - sm) * mg2
            qx_b2, qx_g2 = qx_from(rm_b2, rm_g2)
            g_eff2 = _build_geff(qp, oh, res.rq, qx_b2, qx_g2, ng_stages=ng_stages)
            res2 = res._replace(rm_b=rm_b2, rm_g=rm_g2)

            dz2, dpi2 = backend.resolve(fstate, g_eff2, res.rb)

            dtb, dtg, dlam_b, dlam_g = dt_dlam_res(dz2, res2, t_inv_b, t_inv_g, s.lam_b, s.lam_g)
            alpha2 = alpha_all(dtb, dtg, dlam_b, dlam_g, s.t_b, s.t_g, s.lam_b, s.lam_g)
        else:
            # predictor-only residual step (reference CORRECTOR_HIGH=0,
            # d_ip2_res_hard.c:1003)
            dz2, dpi2 = dz, dpi
            alpha2 = alpha_aff
            mu_aff = jnp.zeros_like(s.mu)
            alpha_aff = jnp.zeros_like(alpha_aff)
            sigma = s.sigma
        a2 = alpha2 * 0.995

        z_new = s.z + a2 * dz2
        pi_new = s.pi + a2 * dpi2
        lam_b_new = s.lam_b + a2 * dlam_b
        t_b_new = s.t_b + a2 * dtb
        lam_g_new = s.lam_g + a2 * dlam_g
        t_g_new = s.t_g + a2 * dtg

        res_new = backend.residuals(
            z_new, pi_new, lam_b_new, t_b_new, lam_g_new, t_g_new, qp.b
        )
        mu_new = res_new.mu

        row = jnp.stack([sigma, alpha_aff, mu_aff, alpha2, mu_new])
        stat = lax.dynamic_update_slice(s.stat, row[None].astype(dt), (s.kk, jnp.asarray(0, s.kk.dtype)))

        carry = (
            KKTCarry(fstate[0], s.z, s.pi, s.lam_b, s.t_b, s.lam_g, s.t_g)
            if return_carry
            else s.carry
        )
        lmx_new = jnp.maximum(jnp.max(jnp.abs(lam_b_new)),
                              jnp.max(jnp.abs(lam_g_new)))
        s_new = IPMState(
            z=z_new, pi=pi_new,
            lam_b=lam_b_new, t_b=t_b_new, lam_g=lam_g_new, t_g=t_g_new,
            mu=mu_new, alpha=a2, kk=s.kk + 1, sigma=sigma, stat=stat,
            carry=carry,
            lam_ref=anchor_lam_ref(s.lam_ref, s.mu, mu_new, lmx_new),
        )
        # numerical-breakdown guard — see step_ok
        lmx_old = jnp.maximum(jnp.max(jnp.abs(s.lam_b)),
                              jnp.max(jnp.abs(s.lam_g)))
        ok = step_ok(mu_new, s.mu, lmx_new, lmx_old, lam_ref=s.lam_ref)
        s_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b),
            s_new,
            s._replace(alpha=jnp.zeros_like(s.alpha)),
        )
        res_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), res_new, res
        )
        return (s_new, res_new)

    def phase2_pred(carry):
        s, _ = carry
        if rti_mode:
            # fixed iteration count, no tolerance exits (reference :1686)
            return s.kk < k_max
        return (s.kk < k_max) & (s.mu > mu_tol) & (s.alpha >= alpha_min)

    def gated2(body, pred):
        def f(c):
            c_new = body(c)
            take = pred(c)
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(take, a, b), c_new, c
            )
        return f

    state2, res_f = lax.while_loop(
        phase2_pred, gated2(phase2_body, phase2_pred), (state1, res1)
    )

    status = jnp.where(
        state2.mu <= mu_tol,
        0,
        jnp.where(state2.kk >= k_max, 1, 2),
    ).astype(jnp.int32)

    inf_norm_res = jnp.stack(
        [
            jnp.max(jnp.abs(res_f.rq)),
            jnp.max(jnp.abs(res_f.rb)),
            jnp.maximum(jnp.max(jnp.abs(res_f.rd_b)), jnp.max(jnp.abs(res_f.rd_g))),
            res_f.mu,
        ]
    )

    solution = IPMSolution(
        z=state2.z,
        pi=state2.pi,
        lam_b=state2.lam_b,
        t_b=state2.t_b,
        lam_g=state2.lam_g,
        t_g=state2.t_g,
        kk=state2.kk,
        status=status,
        stat=state2.stat,
        inf_norm_res=inf_norm_res,
    )
    if return_carry:
        return solution, state2.carry
    return solution


# --------------------------------------------------------------------------
# re-solve with retained factorization for a new rhs
# (d_kkt_solve_new_rhs_res_mpc_hard_tv, d_ip2_res_hard.c:1922)
# --------------------------------------------------------------------------


def kkt_solve_new_rhs(
    dims: OCPDims,
    qp_new: OCPQP,
    carry: KKTCarry,
) -> IPMSolution:
    """One warm Newton step for changed vector data (b, g, d) reusing the
    Riccati factorization of the last IPM iteration.

    Matches the reference exactly: restore the backup iterate (:2140-2174),
    compute residuals against the *new* data (:2193), fold the constraint
    gradient (``d_update_gradient_res``, :2214), triangular re-solve with the
    retained factor (:2223), recover ``dt``/``dlam``
    (``d_compute_dt_dlam_res``, :2234) and take a full (alpha=1) step
    (:2237).  Matrix data (A, B, Q, R, S, C) must be unchanged.
    """
    with jax.default_matmul_precision("float32"):
        return _kkt_solve_new_rhs_impl(dims, qp_new, carry)


def _kkt_solve_new_rhs_impl(dims, qp_new, carry):
    qp = qp_new
    dt = qp.dtype
    NU = dims.NU
    n_constr = dims.n_constr
    mu_scal = jnp.asarray(1.0 / max(n_constr, 1), dt)

    oh = _box_onehot(qp)
    mb2 = qp.nb_mask[:, None, :]
    mg2 = qp.ng_mask[:, None, :]

    z, pi = carry.z_bkp, carry.pi_bkp
    lam_b, t_b = carry.lam_b_bkp, carry.t_b_bkp
    lam_g, t_g = carry.lam_g_bkp, carry.t_g_bkp

    res = compute_residuals(qp, oh, mu_scal, z, pi, lam_b, t_b, lam_g, t_g)

    t_inv_b = jnp.where(mb2 > 0, 1.0 / t_b, 0.0)
    t_inv_g = jnp.where(mg2 > 0, 1.0 / t_g, 0.0)

    # d_update_gradient_res (:1550)
    qx_b = (
        t_inv_b[:, 0] * (res.rm_b[:, 0] - lam_b[:, 0] * res.rd_b[:, 0])
        - t_inv_b[:, 1] * (res.rm_b[:, 1] + lam_b[:, 1] * res.rd_b[:, 1])
    ) * qp.nb_mask
    qx_g = (
        t_inv_g[:, 0] * (res.rm_g[:, 0] - lam_g[:, 0] * res.rd_g[:, 0])
        - t_inv_g[:, 1] * (res.rm_g[:, 1] + lam_g[:, 1] * res.rd_g[:, 1])
    ) * qp.ng_mask

    ng_stages = tuple(n for n in range(dims.N + 1) if dims.ng[n] > 0)
    g_eff = _build_geff(qp, oh, res.rq, qx_b, qx_g, ng_stages=ng_stages)
    sol, _ = riccati.solve(carry.L, g_eff, qp.F, res.rb, NU)
    dz, dpi = sol.z, sol.pi

    # d_compute_dt_dlam_res (:1082)
    dzb = _gather_box(oh, dz)
    dtb = jnp.stack([dzb - res.rd_b[:, 0], -dzb + res.rd_b[:, 1]], axis=1) * mb2
    cdz = _cz(qp, dz)
    dtg = jnp.stack([cdz - res.rd_g[:, 0], -cdz + res.rd_g[:, 1]], axis=1) * mg2
    dlam_b = -t_inv_b * (lam_b * dtb + res.rm_b) * mb2
    dlam_g = -t_inv_g * (lam_g * dtg + res.rm_g) * mg2

    # full step (alpha = 1, d_update_var_res :2237)
    z_new = z + dz
    pi_new = pi + dpi
    lam_b_new = lam_b + dlam_b
    t_b_new = t_b + dtb
    lam_g_new = lam_g + dlam_g
    t_g_new = t_g + dtg

    res_new = compute_residuals(
        qp, oh, mu_scal, z_new, pi_new, lam_b_new, t_b_new, lam_g_new, t_g_new
    )
    inf_norm_res = jnp.stack(
        [
            jnp.max(jnp.abs(res_new.rq)),
            jnp.max(jnp.abs(res_new.rb)),
            jnp.maximum(
                jnp.max(jnp.abs(res_new.rd_b)), jnp.max(jnp.abs(res_new.rd_g))
            ),
            res_new.mu,
        ]
    )

    return IPMSolution(
        z=z_new,
        pi=pi_new,
        lam_b=lam_b_new,
        t_b=t_b_new,
        lam_g=lam_g_new,
        t_g=t_g_new,
        kk=jnp.asarray(1, jnp.int32),
        status=jnp.asarray(0, jnp.int32),
        stat=jnp.zeros((1, 5), dt),
        inf_norm_res=inf_norm_res,
    )


def solve_single_newton(
    dims: OCPDims,
    qp: OCPQP,
    cfg: IPMConfig,
    z0,
    pi0,
    lam_b0,
    t_b0,
    lam_g0,
    t_g0,
    return_carry: bool = False,
) -> IPMSolution:
    """RTI-style fixed-count warm Newton iterations
    (``d_ip2_res_mpc_hard_tv_single_newton_step``, ``d_ip2_res_hard.c:1348``):
    start from the provided full iterate (typically the previous MPC
    solution), run exactly ``cfg.k_max`` residual-phase iterations with no
    tolerance exits (set ``k_max=1`` for classic RTI)."""
    return solve(
        dims, qp, cfg,
        iterate0=(z0, pi0, lam_b0, t_b0, lam_g0, t_g0),
        rti_mode=True,
        return_carry=return_carry,
    )


# --------------------------------------------------------------------------
# parallel-in-time backend (associative-scan Riccati)
# --------------------------------------------------------------------------


def chain_backend_par(
    dims: OCPDims, qp: OCPQP, oh, mu_scal, reg_eps: float = 0.0
) -> KKTBackend:
    """KKT backend with O(log N) sequential depth per solve
    (:mod:`.riccati_par` associative-scan Riccati) — for single-instance
    latency, where the reference's only lever is partial condensing
    (``d_part_cond.c:926``; the recursion itself is sequential,
    ``d_back_ric_rec.c:249``).

    ``resolve`` refactorizes from the retained ``H_eff`` (the corrector
    shares the predictor's Hessian): twice the flops of a sequential trs
    but still O(log N) depth, which is what latency-bound MPC cares about.
    """
    from . import riccati_par

    NU = dims.NU
    ng_stages = tuple(n for n in range(dims.N + 1) if dims.ng[n] > 0)

    def factor_solve(Qx_b, Qx_g, g_eff, rhs_b):
        H_eff = _build_Heff(qp, oh, Qx_b, Qx_g, reg=reg_eps, ng_stages=ng_stages)
        sol, L, eu, px, Pb = riccati_par.factor_solve(H_eff, g_eff, qp.F, rhs_b, NU)
        return sol.z, sol.pi, (L, H_eff)

    def resolve(fstate, g_eff, rhs_b):
        L, H_eff = fstate
        sol, *_ = riccati_par.factor_solve(H_eff, g_eff, qp.F, rhs_b, NU)
        return sol.z, sol.pi

    def residuals(z, pi, lam_b, t_b, lam_g, t_g, rhs_b):
        import dataclasses as _dc

        qp_b = _dc.replace(qp, b=rhs_b)
        return compute_residuals(qp_b, oh, mu_scal, z, pi, lam_b, t_b, lam_g, t_g)

    return KKTBackend(factor_solve=factor_solve, resolve=resolve, residuals=residuals)
