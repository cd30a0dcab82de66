"""Primal-dual IPM with soft (slack-penalized) box constraints.

TPU-native re-design of ``d_ip2_mpc_soft_tv`` (``mpc_solvers/d_ip2_soft.c:83``):
a single-loop Mehrotra predictor-corrector where each soft constraint

    lb_i - s_lo <= z[idx_i] <= ub_i + s_up,   s_lo, s_up >= 0,
    penalty  1/2 s' diag(Z) s + z_lin' s

carries FOUR slack/multiplier pairs (lower, upper, s_lo >= 0, s_up >= 0; the
reference's ``2*pnb+2*png + 4*pns`` layout) and the slack variables are
eliminated per-iteration by a scalar Schur complement that folds into the
stage Hessian exactly like a hard box constraint (``d_update_hessian_mpc_
soft_tv``, ``mpc_solvers/c99/d_aux_ip_soft_lib4.c:167``: the ``Zl``/``zl``
recurrences).  The Riccati backend then sees hard+soft as one merged box set
(``d_ip2_soft.c:94-96`` merges ``nbs = nb + ns``).

Elementwise formulas are clean-room re-derivations of
``d_aux_ip_soft_lib4.c`` (init :38, update_hessian :167, update_gradient
:508, compute_alpha :611, update_var :806, compute_mu :926) as masked
batched array ops.  ``stat`` rows keep the {sigma, alpha_aff, mu_aff,
alpha, mu} contract.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ocp import OCPDims, OCPQP
from . import riccati
from .ipm import (
    IPMConfig,
    _box_onehot,
    _build_Heff,
    _build_geff,
    _cz,
    _gather_box,
    _min_ratio,
    _scatter_box,
    make_pallas_chain_kkt,
    step_ok,
)


class SoftSpec(NamedTuple):
    """Soft-constraint data (a pytree; stacks/batches like OCPQP).

    idxbs: (N+1, NS) int32 padded-z coordinates of the softly-bounded entries
    d_lbs/d_ubs: (N+1, NS) soft bounds
    Z: (N+1, 2, NS) quadratic slack penalties [lower, upper]
    z_lin: (N+1, 2, NS) linear slack penalties
    ns_mask: (N+1, NS) validity
    """

    idxbs: jax.Array
    d_lbs: jax.Array
    d_ubs: jax.Array
    Z: jax.Array
    z_lin: jax.Array
    ns_mask: jax.Array


class SoftSolution(NamedTuple):
    z: jax.Array
    pi: jax.Array
    lam_b: jax.Array  # (N+1, 2, NB)
    t_b: jax.Array
    lam_g: jax.Array  # (N+1, 2, NG)
    t_g: jax.Array
    lam_s: jax.Array  # (N+1, 4, NS) [lower, upper, s_lo>=0, s_up>=0]
    t_s: jax.Array
    kk: jax.Array
    status: jax.Array
    stat: jax.Array


class _State(NamedTuple):
    z: jax.Array
    pi: jax.Array
    lam_b: jax.Array
    t_b: jax.Array
    lam_g: jax.Array
    t_g: jax.Array
    lam_s: jax.Array
    t_s: jax.Array
    mu: jax.Array
    alpha: jax.Array
    kk: jax.Array
    sigma: jax.Array
    stat: jax.Array


def _soft_onehot(qp: OCPQP, soft: SoftSpec):
    NZ = qp.H.shape[-1]
    oh = jax.nn.one_hot(soft.idxbs, NZ, dtype=qp.H.dtype)
    return oh * soft.ns_mask[..., None]


def solve(
    dims: OCPDims,
    qp: OCPQP,
    soft: SoftSpec,
    cfg: IPMConfig,
    exact_mehrotra_soft: bool = True,
    z0=None,
    pi0=None,
) -> SoftSolution:
    """Solve the soft-constrained OCP QP (``d_ip2_mpc_soft_tv``).

    ``exact_mehrotra_soft=True`` (default) applies the full Mehrotra
    centering correction to the soft-constraint gradient.  The reference
    C code MEANS to do this but writes the correction through a stale
    pointer (``d_aux_ip_soft_lib4.c:557`` leaves ``ptr_qx`` at
    ``qx+pnbs`` when ng==0, so the soft ``qx`` update at ``:601`` lands
    outside the slots the Riccati reads) — the correction is silently
    dropped and the reference needs ~40% more iterations.  Set False to
    reproduce the reference's trace bit-for-bit (golden parity tests).

    ``z0``/``pi0`` with ``cfg.warm_start`` seed the iterate (the
    reference soft interface's ``warm_start`` argument,
    ``fortran_order_d_ip_ocp_soft_tv``,
    ``interfaces/c/fortran_order_interface.c:1442``); the box-violation
    correction branch still applies, as in ``d_init_var_mpc_soft_tv``.
    """
    with jax.default_matmul_precision("float32"):
        return _solve_impl(dims, qp, soft, cfg, exact_mehrotra_soft,
                           z0=z0, pi0=pi0)


def _solve_impl(dims, qp, soft, cfg, exact_mehrotra_soft=True,
                z0=None, pi0=None):
    dt = qp.dtype
    N, NU = dims.N, dims.NU
    NS = soft.idxbs.shape[-1]

    mb = qp.nb_mask
    mg = qp.ng_mask
    ms = soft.ns_mask
    mb2, mg2 = mb[:, None, :], mg[:, None, :]
    ms4 = ms[:, None, :]

    oh_b = _box_onehot(qp)
    oh_s = _soft_onehot(qp, soft)

    # KKT backend: with cfg.use_pallas the factor/solve pair dispatches to
    # the fused Pallas stage kernels when vmapped over a 1024-multiple
    # batch (the soft barrier's Schur-eliminated slack terms are pure
    # diagonal, so the hard chain kernels serve unchanged — the reference's
    # own structure, d_ip2_soft.c:94-96 merging nbs = nb + ns)
    use_pallas = bool(getattr(cfg, "use_pallas", False))
    if use_pallas:
        ng_stages = tuple(n for n in range(N + 1) if dims.ng[n] > 0)
        _fs, _trs = make_pallas_chain_kkt(ng_stages, NU)
        reg = jnp.asarray(cfg.reg_eps, dt)

    def kkt_factor_solve(Qx_b, Qx_s, Qx_g, g_eff):
        if use_pallas:
            dvec = (
                _scatter_box(oh_b, Qx_b) + _scatter_box(oh_s, Qx_s)
                + qp.pad_diag + reg
            )
            z, pi, L, Pb = _fs(
                dvec, Qx_g * qp.ng_mask, g_eff, qp.H, qp.C, qp.F, qp.b
            )
            return z, pi, (L, Pb)
        NZ = qp.H.shape[-1]
        H_eff = _build_Heff(qp, oh_b, Qx_b, Qx_g, reg=cfg.reg_eps)
        H_eff = H_eff + jnp.eye(NZ, dtype=dt)[None] * _scatter_box(oh_s, Qx_s)[:, None, :]
        sol, L, eu, px, Pb = riccati.factor_solve(H_eff, g_eff, qp.F, qp.b, NU)
        return sol.z, sol.pi, (L, Pb)

    def kkt_resolve(fstate, g_eff2):
        L, Pb = fstate
        if use_pallas:
            return _trs(L, g_eff2, qp.F, qp.b, Pb)
        sol2, _ = riccati.solve(L, g_eff2, qp.F, qp.b, NU, Pb=Pb)
        return sol2.z, sol2.pi

    # mu scaling: 2 nb + 2 ng + 4 ns (d_ip2_soft.c:268-271); the ns count
    # comes from the mask sum (a constant under jit for fixed problem data)
    n_constr = 2 * sum(dims.nb) + 2 * sum(dims.ng)
    ns_sum = jnp.sum(ms)
    mu_scal = 1.0 / (n_constr + 4.0 * ns_sum)
    mu_tol = jnp.asarray(cfg.mu_tol, dt)
    alpha_min = jnp.asarray(cfg.alpha_min, dt)
    k_max = cfg.k_max
    thr0 = jnp.asarray(0.1, dt)
    mu0 = jnp.asarray(cfg.mu0, dt)

    # ---- init (d_init_var_mpc_soft_tv :38) ----
    if getattr(cfg, "warm_start", False) and z0 is not None:
        z0 = jnp.asarray(z0, dt) * qp.z_mask
    else:
        z0 = jnp.zeros((N + 1, dims.NZ), dt)
    zb = _gather_box(oh_b, z0)
    t_lo0 = zb - qp.d_lb
    t_up0 = qp.d_ub - zb
    both = (t_lo0 < thr0) & (t_up0 < thr0)
    lo_only = (t_lo0 < thr0) & ~both
    up_only = (t_up0 < thr0) & ~both
    t_lo = jnp.where(both | lo_only, thr0, t_lo0)
    t_up = jnp.where(both | up_only, thr0, t_up0)
    z_corr = jnp.where(
        both,
        (qp.d_lb - qp.d_ub) * 0.5,
        jnp.where(lo_only, qp.d_lb + thr0, jnp.where(up_only, qp.d_ub - thr0, zb)),
    )
    changed = (both | lo_only | up_only) & (mb > 0)
    sel = _scatter_box(oh_b, changed.astype(dt))
    z0 = z0 * (1.0 - sel) + _scatter_box(oh_b, jnp.where(changed, z_corr, 0.0))

    t_b0 = jnp.stack([t_lo, t_up], axis=1)
    t_b0 = jnp.where(mb2 > 0, t_b0, 1.0)
    lam_b0 = jnp.where(mb2 > 0, mu0 / t_b0, 0.0)

    cz = _cz(qp, z0)
    tg_lo = jnp.maximum(thr0, cz - qp.d_lg)
    tg_up = jnp.maximum(thr0, qp.d_ug - cz)
    t_g0 = jnp.stack([tg_lo, tg_up], axis=1)
    t_g0 = jnp.where(mg2 > 0, t_g0, 1.0)
    lam_g0 = jnp.where(mg2 > 0, mu0 / t_g0, 0.0)

    t_s0 = jnp.ones((N + 1, 4, NS), dt)
    lam_s0 = jnp.where(ms4 > 0, mu0, 0.0) * jnp.ones((N + 1, 4, NS), dt)

    if getattr(cfg, "warm_start", False) and pi0 is not None:
        pi_init = jnp.asarray(pi0, dt)
    else:
        pi_init = jnp.zeros((N, dims.NX), dt)
    state0 = _State(
        z=z0,
        pi=pi_init,
        lam_b=lam_b0,
        t_b=t_b0,
        lam_g=lam_g0,
        t_g=t_g0,
        lam_s=lam_s0,
        t_s=t_s0,
        mu=mu0,
        alpha=jnp.asarray(1.0, dt),
        kk=jnp.asarray(0, jnp.int32),
        sigma=jnp.asarray(0.0, dt),
        stat=jnp.zeros((k_max, 5), dt),
    )

    def sum_lt(lam_b, t_b, lam_g, t_g, lam_s, t_s):
        return (
            jnp.sum(lam_b * t_b * mb2)
            + jnp.sum(lam_g * t_g * mg2)
            + jnp.sum(lam_s * t_s * ms4)
        )

    def body(s: _State) -> _State:
        t_inv_b = jnp.where(mb2 > 0, 1.0 / s.t_b, 0.0)
        t_inv_g = jnp.where(mg2 > 0, 1.0 / s.t_g, 0.0)
        t_inv_s = jnp.where(ms4 > 0, 1.0 / s.t_s, 0.0)
        lamt_b = s.lam_b * t_inv_b
        lamt_g = s.lam_g * t_inv_g
        lamt_s = s.lam_s * t_inv_s

        # --- hessian/gradient folds (sigma_mu = 0 on the affine pass) ---
        Qx_b = (lamt_b[:, 0] + lamt_b[:, 1]) * mb
        qx_b = (
            s.lam_b[:, 1] - lamt_b[:, 1] * qp.d_ub
            - s.lam_b[:, 0] - lamt_b[:, 0] * qp.d_lb
        ) * mb
        Qx_g = (lamt_g[:, 0] + lamt_g[:, 1]) * mg
        qx_g = (
            s.lam_g[:, 1] - lamt_g[:, 1] * qp.d_ug
            - s.lam_g[:, 0] - lamt_g[:, 0] * qp.d_lg
        ) * mg

        # soft Schur elimination (update_hessian soft block :344-506)
        rQx0 = lamt_s[:, 0]
        rQx1 = lamt_s[:, 1]
        rqx0 = s.lam_s[:, 0] + lamt_s[:, 0] * soft.d_lbs
        rqx1 = s.lam_s[:, 1] - lamt_s[:, 1] * soft.d_ubs
        Zl0 = jnp.where(ms > 0, 1.0 / (soft.Z[:, 0] + rQx0 + lamt_s[:, 2]), 0.0)
        Zl1 = jnp.where(ms > 0, 1.0 / (soft.Z[:, 1] + rQx1 + lamt_s[:, 3]), 0.0)
        zl0 = -soft.z_lin[:, 0] + rqx0 + s.lam_s[:, 2]
        zl1 = -soft.z_lin[:, 1] + rqx1 + s.lam_s[:, 3]
        rqx0e = rqx0 - rQx0 * zl0 * Zl0
        rqx1e = rqx1 - rQx1 * zl1 * Zl1
        rQx0e = rQx0 - rQx0 * rQx0 * Zl0
        rQx1e = rQx1 - rQx1 * rQx1 * Zl1
        Qx_s = (rQx0e + rQx1e) * ms
        qx_s = (rqx1e - rqx0e) * ms

        # --- KKT factor+solve (merged hard+soft box scatter) ---
        g_eff = _build_geff(qp, oh_b, qp.g * qp.z_mask, qx_b, qx_g)
        g_eff = g_eff + _scatter_box(oh_s, qx_s)

        dz, dpi, fstate = kkt_factor_solve(Qx_b, Qx_s, Qx_g, g_eff)

        # --- affine dt/dlam + alpha (compute_alpha :611) ---
        def dt_dlam(dz, dlam0_b, dlam0_g, dlam0_s, zl0, zl1):
            zb = _gather_box(oh_b, dz)
            dtb = jnp.stack(
                [zb - qp.d_lb - s.t_b[:, 0], -zb + qp.d_ub - s.t_b[:, 1]], axis=1
            ) * mb2
            czv = _cz(qp, dz)
            dtg = jnp.stack(
                [czv - qp.d_lg - s.t_g[:, 0], -czv + qp.d_ug - s.t_g[:, 1]], axis=1
            ) * mg2
            zs = _gather_box(oh_s, dz)
            ds_lo = (zl0 - lamt_s[:, 0] * zs) * Zl0
            ds_up = (zl1 + lamt_s[:, 1] * zs) * Zl1
            dts = jnp.stack(
                [
                    ds_lo + zs - soft.d_lbs - s.t_s[:, 0],
                    ds_up - zs + soft.d_ubs - s.t_s[:, 1],
                    ds_lo - s.t_s[:, 2],
                    ds_up - s.t_s[:, 3],
                ],
                axis=1,
            ) * ms4
            dlam_b = (dlam0_b - lamt_b * dtb - s.lam_b) * mb2
            dlam_g = (dlam0_g - lamt_g * dtg - s.lam_g) * mg2
            dlam_s = (dlam0_s - lamt_s * dts - s.lam_s) * ms4
            return dtb, dtg, dts, dlam_b, dlam_g, dlam_s

        zero_b = jnp.zeros_like(s.lam_b)
        zero_g = jnp.zeros_like(s.lam_g)
        zero_s = jnp.zeros_like(s.lam_s)
        dtb, dtg, dts, dlam_b, dlam_g, dlam_s = dt_dlam(
            dz, zero_b, zero_g, zero_s, zl0, zl1
        )

        def alpha_all(dtb, dtg, dts, dlam_b, dlam_g, dlam_s):
            a = jnp.asarray(1.0, dt)
            a = _min_ratio(a, s.lam_b, dlam_b, mb2 * jnp.ones_like(s.lam_b))
            a = _min_ratio(a, s.t_b, dtb, mb2 * jnp.ones_like(s.t_b))
            a = _min_ratio(a, s.lam_g, dlam_g, mg2 * jnp.ones_like(s.lam_g))
            a = _min_ratio(a, s.t_g, dtg, mg2 * jnp.ones_like(s.t_g))
            a = _min_ratio(a, s.lam_s, dlam_s, ms4 * jnp.ones_like(s.lam_s))
            a = _min_ratio(a, s.t_s, dts, ms4 * jnp.ones_like(s.t_s))
            return a

        alpha_aff = alpha_all(dtb, dtg, dts, dlam_b, dlam_g, dlam_s)
        a = alpha_aff * 0.995
        mu_aff = (
            sum_lt(
                s.lam_b + a * dlam_b, s.t_b + a * dtb,
                s.lam_g + a * dlam_g, s.t_g + a * dtg,
                s.lam_s + a * dlam_s, s.t_s + a * dts,
            )
            * mu_scal
        )
        sigma = (mu_aff / s.mu) ** 3
        sm = sigma * s.mu

        # --- corrector gradient update (update_gradient :508) ---
        dlam2_b = t_inv_b * (sm - dlam_b * dtb) * mb2
        dlam2_g = t_inv_g * (sm - dlam_g * dtg) * mg2
        dlam2_s = t_inv_s * (sm - dlam_s * dts) * ms4
        qx_b2 = qx_b + (dlam2_b[:, 1] - dlam2_b[:, 0]) * mb
        qx_g2 = qx_g + (dlam2_g[:, 1] - dlam2_g[:, 0]) * mg
        zl0c = zl0 + dlam2_s[:, 0] + dlam2_s[:, 2]
        zl1c = zl1 + dlam2_s[:, 1] + dlam2_s[:, 3]
        rqx0c = dlam2_s[:, 0] - rQx0 * (dlam2_s[:, 0] + dlam2_s[:, 2]) * Zl0
        rqx1c = dlam2_s[:, 1] - rQx1 * (dlam2_s[:, 1] + dlam2_s[:, 3]) * Zl1
        if exact_mehrotra_soft:
            qx_s2 = qx_s + (rqx1c - rqx0c) * ms
        else:  # reference compat: the soft qx correction is dropped
            qx_s2 = qx_s

        g_eff2 = _build_geff(qp, oh_b, qp.g * qp.z_mask, qx_b2, qx_g2)
        g_eff2 = g_eff2 + _scatter_box(oh_s, qx_s2)
        dz2, dpi2 = kkt_resolve(fstate, g_eff2)

        dtb, dtg, dts, dlam_b, dlam_g, dlam_s = dt_dlam(
            dz2, dlam2_b, dlam2_g, dlam2_s, zl0c, zl1c
        )
        alpha2 = alpha_all(dtb, dtg, dts, dlam_b, dlam_g, dlam_s)
        a2 = alpha2 * 0.995

        z_new = s.z + a2 * (dz2 - s.z)
        pi_new = s.pi + a2 * (dpi2 - s.pi)
        lam_b_new = s.lam_b + a2 * dlam_b
        t_b_new = s.t_b + a2 * dtb
        lam_g_new = s.lam_g + a2 * dlam_g
        t_g_new = s.t_g + a2 * dtg
        lam_s_new = s.lam_s + a2 * dlam_s
        t_s_new = s.t_s + a2 * dts
        mu_new = (
            sum_lt(lam_b_new, t_b_new, lam_g_new, t_g_new, lam_s_new, t_s_new)
            * mu_scal
        )

        row = jnp.stack([sigma, alpha_aff, mu_aff, alpha2, mu_new])
        stat = lax.dynamic_update_slice(
            s.stat, row[None].astype(dt), (s.kk, jnp.asarray(0, s.kk.dtype))
        )

        s_new = _State(
            z=z_new, pi=pi_new,
            lam_b=lam_b_new, t_b=t_b_new, lam_g=lam_g_new, t_g=t_g_new,
            lam_s=lam_s_new, t_s=t_s_new,
            mu=mu_new, alpha=a2, kk=s.kk + 1, sigma=sigma, stat=stat,
        )
        ok = step_ok(mu_new, s.mu)
        return jax.tree_util.tree_map(
            lambda a_, b_: jnp.where(ok, a_, b_),
            s_new,
            s._replace(alpha=jnp.zeros_like(s.alpha)),
        )

    def pred(s: _State):
        return (s.kk < k_max) & (s.mu > mu_tol) & (s.alpha >= alpha_min)

    def gated(s):
        s_new = body(s)
        return jax.tree_util.tree_map(
            lambda a_, b_: jnp.where(pred(s), a_, b_), s_new, s
        )

    sf = lax.while_loop(pred, gated, state0)

    status = jnp.where(
        sf.mu <= mu_tol, 0, jnp.where(sf.kk >= k_max, 1, 2)
    ).astype(jnp.int32)

    return SoftSolution(
        z=sf.z, pi=sf.pi,
        lam_b=sf.lam_b, t_b=sf.t_b,
        lam_g=sf.lam_g, t_g=sf.t_g,
        lam_s=sf.lam_s, t_s=sf.t_s,
        kk=sf.kk, status=status, stat=sf.stat,
    )


class SoftResiduals(NamedTuple):
    rq: jax.Array    # (N+1, NZ)  z-stationarity
    rz: jax.Array    # (N+1, 2, NS) slack stationarity
    rb: jax.Array    # (N, NX)
    rd_b: jax.Array  # (N+1, 2, NB)
    rd_g: jax.Array  # (N+1, 2, NG)
    rd_s: jax.Array  # (N+1, 2, NS) slacked-bound gaps
    mu: jax.Array    # scalar


def compute_residuals(dims, qp: OCPQP, soft: SoftSpec, sol: SoftSolution):
    """Exact KKT residuals of the soft-constrained QP at a solution point
    (the reference's ``d_res_mpc_soft_tv``, ``d_res_ip_soft.c:38``;
    slack-variable convention: the 3rd/4th slack families ARE the slack
    variables s_lo/s_up, as in the reference where ``ht[2*pns..]`` holds
    them).  Residual sign conventions follow :func:`ipm.compute_residuals`.

    Per-instance (vmap for batches).  Returns :class:`SoftResiduals`;
    ``mu`` uses the 2nb+2ng+4ns scaling of the solver's stat trace.
    """
    from .ipm import _box_onehot, _cz, _gather_box, _scatter_box

    N, NU = dims.N, dims.NU
    z, pi = sol.z, sol.pi
    lam_b, t_b = sol.lam_b, sol.t_b
    lam_g, t_g = sol.lam_g, sol.t_g
    lam_s, t_s = sol.lam_s, sol.t_s
    mb, mg, ms = qp.nb_mask, qp.ng_mask, soft.ns_mask
    oh_b = _box_onehot(qp)
    oh_s = _soft_onehot(qp, soft)
    s_lo, s_up = t_s[:, 2], t_s[:, 3]  # the slack variables themselves

    # z-stationarity: hard terms exactly as ipm.compute_residuals, plus
    # the soft bound multipliers scattered at the soft coordinates
    rq = qp.g * qp.z_mask + jnp.einsum("nzw,nw->nz", qp.H, z)
    pi_pad = jnp.concatenate([jnp.zeros_like(pi[:1]), pi], axis=0)
    rq = rq.at[:, NU:].add(-pi_pad)
    rq = rq.at[:N].add(jnp.einsum("nzx,nx->nz", qp.F, pi))
    rq = rq + _scatter_box(oh_b, (lam_b[:, 1] - lam_b[:, 0]) * mb)
    rq = rq + jnp.einsum("ngz,ng->nz", qp.C, (lam_g[:, 1] - lam_g[:, 0]) * mg)
    rq = rq + _scatter_box(oh_s, (lam_s[:, 1] - lam_s[:, 0]) * ms)
    rq = rq * qp.z_mask

    # slack stationarity (d_res_ip_soft.c:150): Z s + z_lin - lam_bound
    # - lam_nonneg, per side
    rz = jnp.stack(
        [soft.z_lin[:, 0] + soft.Z[:, 0] * s_lo - lam_s[:, 0] - lam_s[:, 2],
         soft.z_lin[:, 1] + soft.Z[:, 1] * s_up - lam_s[:, 1] - lam_s[:, 3]],
        axis=1,
    ) * ms[:, None, :]

    rb = qp.b + jnp.einsum("nzx,nz->nx", qp.F, z[:N]) - z[1:, NU:]
    rb = rb * qp.x_mask[1:]

    zb = _gather_box(oh_b, z)
    rd_b = jnp.stack(
        [qp.d_lb - zb + t_b[:, 0], qp.d_ub - zb - t_b[:, 1]], axis=1
    ) * mb[:, None, :]
    cz = _cz(qp, z)
    rd_g = jnp.stack(
        [qp.d_lg + t_g[:, 0] - cz, qp.d_ug - t_g[:, 1] - cz], axis=1
    ) * mg[:, None, :]
    # slacked soft bounds: z_s >= d_lbs - s_lo, z_s <= d_ubs + s_up
    zs = _gather_box(oh_s, z)
    rd_s = jnp.stack(
        [soft.d_lbs - s_lo - zs + t_s[:, 0],
         soft.d_ubs + s_up - zs - t_s[:, 1]], axis=1
    ) * ms[:, None, :]

    n_constr = 2 * sum(dims.nb) + 2 * sum(dims.ng)
    mu = (
        jnp.sum(lam_b * t_b * mb[:, None, :])
        + jnp.sum(lam_g * t_g * mg[:, None, :])
        + jnp.sum(lam_s * t_s * ms[:, None, :])
    ) / (n_constr + 4.0 * jnp.sum(ms))

    return SoftResiduals(rq=rq, rz=rz, rb=rb, rd_b=rd_b, rd_g=rd_g,
                         rd_s=rd_s, mu=mu)
