"""Dense condensed-QP IPM — the single-instance LATENCY engine (5th
generation).

Every stage-recursive engine pays sequential depth ~4(N+1) grid phases
per IPM iteration; at N=30 that is ~124 VPU-bound steps of ~0.55us and a
measured ~690-760us converged tick (wide-K protocol, AUX r05) — above
the reference's published 314us single-core solve
(``doc/guide.tex:355-360``).  The TPU-native answer at deployment-latency
scale is the reference's own small-problem lever taken to its limit:
FULL condensing (``lqcp_solvers/d_cond.c``, N2=1 via the golden-parity
``cond.plan/condense`` pipeline) plus elimination of the terminal state,
leaving ONE dense QP

    min 1/2 y' Hd y + gd' y          y = condensed inputs (nz = sum nu)
    s.t. lb <= Sel' y <= ub          (the surviving input box slots)
         dlg <= G y <= dug           (state boxes + terminal rows)

with NO stage recursion: the only sequential depth per IPM iteration is
the nz-column dense Cholesky, whose column updates vectorize over tile
sublanes (``ops/dense_kernel``).

Per-tick data flow is deployment-style: matrices are condensed ONCE
(fixed across ticks) and the VECTOR condense (raw per-stage offsets
``b`` -> dense gd/lb/ub/dlg/dug) is an affine map extracted EXACTLY by
``jax.jacfwd`` of the condensing pipeline (it is affine in b), applied
per tick — the tick is end-to-end raw-b -> controls.

f32 caveat (measured): condensing squares conditioning; with the
terminal general-constraint block active (ngN=8) the f32 dense path
stalls at mu ~1e-3 — the same failure the parallel-in-time scan shows
(see ``riccati_par``'s caveat) — so the sequential engines remain the
f32 route there.  On the latency suite's protocol (box-constrained
mass-spring) f32 converges with the same iteration count as the
sequential solver (tests/test_ipm_dense.py).

Semantics: phase-1 Mehrotra to ``mu_tol``/``k_max`` (the legacy
``d_ip2_hard.c`` contract — identical to the resident tick rows).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ocp import OCPDims, OCPQP
from . import cond as _cond
from . import ipm as _ipm

_HI = jax.lax.Precision.HIGHEST


class DensePlan(NamedTuple):
    """Static dense-QP data + affine vector-condense maps.

    ``v(b) = v_c + v_m @ vec(b)`` for v in {gd, lb, ub, dlg, dug} —
    exact (the condense pipeline is affine in the stage offsets)."""

    nz: int
    nb: int
    ngd: int
    nu0: int           # nu of stage 0 (u_0 = y[nz-nu0:nz], reversed-u)
    Hd: jax.Array      # (nz, nz)
    Sel: jax.Array     # (nz, nb) 0/1 box gather
    G: jax.Array       # (ngd, nz)
    gd_c: jax.Array
    gd_m: jax.Array
    lb_c: jax.Array
    lb_m: jax.Array
    ub_c: jax.Array
    ub_m: jax.Array
    dlg_c: jax.Array
    dlg_m: jax.Array
    dug_c: jax.Array
    dug_m: jax.Array


def _terminal_blocks(dims: OCPDims, qp2, pl2):
    """Terminal-stage x-block cost + layout offsets.  NOTE the padded
    stage layout puts the x block at the PADDED offset ``d2.NU`` for
    every stage (ocp.pack_ocp's ``jp = NU + (j - nu)`` convention) —
    while ``dims2.idxb`` stores LOGICAL coordinates (state index =
    idx - nu[N])."""
    d2 = pl2.dims2
    NU2, NX2 = d2.NU, d2.NX
    Hxx = qp2.H[1][NU2:NU2 + NX2, NU2:NU2 + NX2]
    gx = qp2.g[1][NU2:NU2 + NX2]
    return Hxx, gx, NU2, NX2


def _dense_vectors(dims: OCPDims, qp: OCPQP, pl2, box_slots, bflat):
    """(gd, lb, ub, dlg, dug) of the eliminated dense QP as a function
    of ``vec(b)`` — affine, jacfwd-extracted by :func:`plan_dense`."""
    N, NX = dims.N, dims.NX
    d2 = pl2.dims2
    nz = d2.NU
    qp_b = dataclasses.replace(qp, b=bflat.reshape(N, NX))
    qp2 = _cond.condense(qp_b, pl2)
    Hxx, gx, xoff, NX2 = _terminal_blocks(dims, qp2, pl2)
    nuN = dims.nu[dims.N]                     # logical idxb offset
    Fy = qp2.F[0][:nz, :]                     # (nz, NX2)
    b0 = qp2.b[0]                             # (NX2,)

    gd = qp2.g[0][:nz] + Fy @ (Hxx @ b0 + gx)

    lb = jnp.stack([qp2.d_lb[0, k] for k in box_slots]) \
        if box_slots else jnp.zeros((0,), qp.b.dtype)
    ub = jnp.stack([qp2.d_ub[0, k] for k in box_slots]) \
        if box_slots else jnp.zeros((0,), qp.b.dtype)

    rows_lo, rows_hi = [], []
    for r in range(d2.ng[0]):
        rows_lo.append(qp2.d_lg[0, r])
        rows_hi.append(qp2.d_ug[0, r])
    for k in range(d2.nb[1]):                 # terminal box -> general
        j = int(d2.idxb[1][k]) - nuN
        rows_lo.append(qp2.d_lb[1, k] - b0[j])
        rows_hi.append(qp2.d_ub[1, k] - b0[j])
    for r in range(d2.ng[1]):                 # terminal ng -> general
        crow = qp2.C[1, r, xoff:xoff + NX2]
        rows_lo.append(qp2.d_lg[1, r] - crow @ b0)
        rows_hi.append(qp2.d_ug[1, r] - crow @ b0)
    dlg = (jnp.stack(rows_lo) if rows_lo
           else jnp.zeros((0,), qp.b.dtype))
    dug = (jnp.stack(rows_hi) if rows_hi
           else jnp.zeros((0,), qp.b.dtype))
    return gd, lb, ub, dlg, dug


def plan_dense(dims: OCPDims, qp: OCPQP) -> DensePlan:
    """Build the dense plan from ONE (unbatched) chain QP.  Matrices via
    the golden-parity condensing; vector maps via ``jacfwd`` (exact)."""
    N = dims.N
    pl2 = _cond.plan(dims, 1)
    d2 = pl2.dims2
    nz = d2.NU
    qp2 = _cond.condense(qp, pl2)
    Hxx, gx, xoff, NX2 = _terminal_blocks(dims, qp2, pl2)
    nuN = dims.nu[dims.N]                     # logical idxb offset
    Fy = qp2.F[0][:nz, :]

    Hd = qp2.H[0][:nz, :nz] + jnp.matmul(
        jnp.matmul(Fy, Hxx, precision=_HI), Fy.T, precision=_HI)
    Hd = 0.5 * (Hd + Hd.T)

    # surviving input box slots of the condensed stage (coords < nz and
    # unmasked); x0-region rows are eliminated with x0
    nbm = np.asarray(qp2.nb_mask[0])
    box_slots = tuple(
        k for k in range(d2.nb[0])
        if int(d2.idxb[0][k]) < nz and nbm[k] > 0
    )
    sel = np.zeros((nz, len(box_slots)), np.float32)
    for i, k in enumerate(box_slots):
        sel[int(d2.idxb[0][k]), i] = 1.0
    Sel = jnp.asarray(sel, qp.b.dtype)

    rows = [qp2.C[0, :d2.ng[0], :nz]] if d2.ng[0] else []
    for k in range(d2.nb[1]):
        j = int(d2.idxb[1][k]) - nuN
        rows.append(Fy[:, j][None, :])
    if d2.ng[1]:
        rows.append(qp2.C[1, :d2.ng[1], xoff:xoff + NX2] @ Fy.T)
    G = (jnp.concatenate(rows, axis=0) if rows
         else jnp.zeros((0, nz), qp.b.dtype))

    bflat0 = qp.b.reshape(-1)
    vec_fn = lambda bf: _dense_vectors(  # noqa: E731
        dims, qp, pl2, box_slots, bf)
    with jax.default_matmul_precision("float32"):
        consts = vec_fn(jnp.zeros_like(bflat0))
        maps = jax.jacfwd(vec_fn)(bflat0)

    return DensePlan(
        nz=int(nz), nb=len(box_slots), ngd=int(G.shape[0]),
        nu0=int(dims.nu[0]),
        Hd=Hd, Sel=Sel, G=G,
        gd_c=consts[0], gd_m=maps[0],
        lb_c=consts[1], lb_m=maps[1],
        ub_c=consts[2], ub_m=maps[2],
        dlg_c=consts[3], dlg_m=maps[3],
        dug_c=consts[4], dug_m=maps[4],
    )


class DenseTickResult(NamedTuple):
    u0: jax.Array      # (nu0,) first-stage controls (what a tick ships)
    y: jax.Array       # (nz,) full condensed input vector
    kk: jax.Array      # int32 iterations
    mu: jax.Array      # final duality measure
    status: jax.Array  # 0 converged / 1 k_max / 2 frozen


def _result(plan: DensePlan, y, kk, mu, status):
    # reversed-u layout: u_0 is the LAST nu0 block of y (cond.plan)
    return DenseTickResult(
        u0=y[plan.nz - plan.nu0:plan.nz], y=y, kk=kk, mu=mu,
        status=status)


def solve_dense_ref(plan: DensePlan, bflat, cfg,
                    y0=None) -> DenseTickResult:
    """Pure-JAX reference of the dense phase-1 Mehrotra IPM — the
    kernel's oracle; mirrors ``ipm.py``'s phase-1 formulas specialized
    to one dense stage (box slots + general rows, no dynamics).
    ``y0``: warm-start iterate (None = cold)."""
    with jax.default_matmul_precision("float32"):
        return _solve_dense_ref_impl(plan, bflat, cfg, y0)


def _solve_dense_ref_impl(plan, bflat, cfg, y0=None):
    from ..ops.tri import cholesky, solve_tril, solve_triu

    dt = plan.Hd.dtype
    gd = plan.gd_c + plan.gd_m @ bflat
    lb = plan.lb_c + plan.lb_m @ bflat
    ub = plan.ub_c + plan.ub_m @ bflat
    dlg = plan.dlg_c + plan.dlg_m @ bflat
    dug = plan.dug_c + plan.dug_m @ bflat
    Sel, G = plan.Sel, plan.G

    mu0 = jnp.asarray(cfg.mu0, dt)
    thr0 = jnp.asarray(0.1, dt)
    n_con = 2 * (plan.nb + plan.ngd)
    mu_scal = jnp.asarray(1.0 / n_con, dt)
    mu_tol = jnp.asarray(cfg.mu_tol, dt)
    alpha_min = jnp.asarray(cfg.alpha_min, dt)
    k_max = cfg.k_max

    # ---- d_init_var (init_vars twin on the dense stage; y0 = the
    # warm-start iterate, clamp applies either way) -----------------------
    y = (jnp.zeros((plan.nz,), dt) if y0 is None
         else jnp.asarray(y0, dt))
    yb = Sel.T @ y
    t_lo0, t_up0 = yb - lb, ub - yb
    both = (t_lo0 < thr0) & (t_up0 < thr0)
    lo_o = (t_lo0 < thr0) & ~both
    up_o = (t_up0 < thr0) & ~both
    t_lo = jnp.where(both | lo_o, thr0, t_lo0)
    t_up = jnp.where(both | up_o, thr0, t_up0)
    yb_c = jnp.where(both, 0.5 * (lb - ub),
                     jnp.where(lo_o, lb + thr0,
                               jnp.where(up_o, ub - thr0, yb)))
    ch = (both | lo_o | up_o).astype(dt)
    y = y - Sel @ (ch * yb) + Sel @ (ch * yb_c)
    lam_lo, lam_up = mu0 / t_lo, mu0 / t_up
    cz = G @ y
    tg_lo = jnp.maximum(thr0, cz - dlg)
    tg_up = jnp.maximum(thr0, dug - cz)
    lg_lo, lg_up = mu0 / tg_lo, mu0 / tg_up

    def mu_of(ll, tl, lu, tu, gl, sl, gu, su):
        return (jnp.sum(ll * tl) + jnp.sum(lu * tu)
                + jnp.sum(gl * sl) + jnp.sum(gu * su)) * mu_scal

    def min_ratio(a, v, dv):
        pred = dv < 0.0
        r = jnp.where(pred, -v / jnp.where(pred, dv, -1.0), jnp.inf)
        return jnp.minimum(a, jnp.min(r))

    def body(c):
        (y, t_lo, t_up, lam_lo, lam_up, tg_lo, tg_up, lg_lo, lg_up,
         mu, alpha, kk) = c
        ti_lo, ti_up = 1.0 / t_lo, 1.0 / t_up
        si_lo, si_up = 1.0 / tg_lo, 1.0 / tg_up
        lt_lo, lt_up = lam_lo * ti_lo, lam_up * ti_up
        gt_lo, gt_up = lg_lo * si_lo, lg_up * si_up
        Qx_b = lt_lo + lt_up
        # qx = fold(-sgn lam - lamt d): lower (sgn=+1, d=lb), upper
        # (sgn=-1, d=ub) — exactly the engines' _qx_fold
        qx_b = (-lam_lo - lt_lo * lb) + (lam_up - lt_up * ub)
        Qx_g = gt_lo + gt_up
        qx_g = (-lg_lo - gt_lo * dlg) + (lg_up - gt_up * dug)

        Hbar = (plan.Hd + Sel @ (Qx_b[:, None] * Sel.T)
                + G.T @ (Qx_g[:, None] * G))
        g_eff = gd + Sel @ qx_b + G.T @ qx_g
        L = cholesky(Hbar)
        solve = lambda r: solve_triu(  # noqa: E731
            L.T, solve_tril(L, r))
        y1 = solve(-g_eff)

        def dirs(y_new, dl0_lo, dl0_up, dg0_lo, dg0_up):
            ybn = Sel.T @ y_new
            dt_lo = (ybn - lb) - t_lo
            dt_up = (ub - ybn) - t_up
            dl_lo = dl0_lo - lt_lo * dt_lo - lam_lo
            dl_up = dl0_up - lt_up * dt_up - lam_up
            czn = G @ y_new
            ds_lo = (czn - dlg) - tg_lo
            ds_up = (dug - czn) - tg_up
            dg_lo = dg0_lo - gt_lo * ds_lo - lg_lo
            dg_up = dg0_up - gt_up * ds_up - lg_up
            return dt_lo, dt_up, dl_lo, dl_up, ds_lo, ds_up, dg_lo, dg_up

        zz = jnp.zeros_like
        d1 = dirs(y1, zz(lam_lo), zz(lam_up), zz(lg_lo), zz(lg_up))
        a = jnp.asarray(1.0, dt)
        for v, dv in ((lam_lo, d1[2]), (lam_up, d1[3]), (t_lo, d1[0]),
                      (t_up, d1[1]), (lg_lo, d1[6]), (lg_up, d1[7]),
                      (tg_lo, d1[4]), (tg_up, d1[5])):
            a = min_ratio(a, v, dv)
        a_aff = a * 0.995
        mu_aff = mu_of(lam_lo + a_aff * d1[2], t_lo + a_aff * d1[0],
                       lam_up + a_aff * d1[3], t_up + a_aff * d1[1],
                       lg_lo + a_aff * d1[6], tg_lo + a_aff * d1[4],
                       lg_up + a_aff * d1[7], tg_up + a_aff * d1[5])
        sigma = (mu_aff / mu) ** 3
        sm = sigma * mu

        dl2_lo = ti_lo * (sm - d1[2] * d1[0])
        dl2_up = ti_up * (sm - d1[3] * d1[1])
        dg2_lo = si_lo * (sm - d1[6] * d1[4])
        dg2_up = si_up * (sm - d1[7] * d1[5])
        # corrector gradient: qx2 = qx + fold(-sgn dl2)
        qx_b2 = qx_b + (-dl2_lo + dl2_up)
        qx_g2 = qx_g + (-dg2_lo + dg2_up)
        g_eff2 = gd + Sel @ qx_b2 + G.T @ qx_g2
        y2 = solve(-g_eff2)
        d2_ = dirs(y2, dl2_lo, dl2_up, dg2_lo, dg2_up)
        a = jnp.asarray(1.0, dt)
        for v, dv in ((lam_lo, d2_[2]), (lam_up, d2_[3]), (t_lo, d2_[0]),
                      (t_up, d2_[1]), (lg_lo, d2_[6]), (lg_up, d2_[7]),
                      (tg_lo, d2_[4]), (tg_up, d2_[5])):
            a = min_ratio(a, v, dv)
        a2 = a * 0.995

        y_n = y + a2 * (y2 - y)
        new = (y_n,
               t_lo + a2 * d2_[0], t_up + a2 * d2_[1],
               lam_lo + a2 * d2_[2], lam_up + a2 * d2_[3],
               tg_lo + a2 * d2_[4], tg_up + a2 * d2_[5],
               lg_lo + a2 * d2_[6], lg_up + a2 * d2_[7])
        mu_n = mu_of(new[3], new[1], new[4], new[2],
                     new[7], new[5], new[8], new[6])
        ok = _ipm.step_ok(mu_n, mu)
        new = new + (mu_n, a2, kk + 1)
        old = (y, t_lo, t_up, lam_lo, lam_up, tg_lo, tg_up, lg_lo,
               lg_up, mu, jnp.zeros_like(alpha), kk)
        return jax.tree_util.tree_map(
            lambda n_, o_: jnp.where(ok, n_, o_), new, old)

    def pred(c):
        return (c[-1] < k_max) & (c[-3] > mu_tol) & (c[-2] >= alpha_min)

    def gated(c):
        n = body(c)
        return jax.tree_util.tree_map(
            lambda a_, b_: jnp.where(pred(c), a_, b_), n, c)

    c0 = (y, t_lo, t_up, lam_lo, lam_up, tg_lo, tg_up, lg_lo, lg_up,
          jnp.asarray(cfg.mu0, dt), jnp.asarray(1.0, dt),
          jnp.asarray(0, jnp.int32))
    cf = jax.lax.while_loop(lambda c: pred(c), gated, c0)
    y_f, mu_f, kk_f = cf[0], cf[-3], cf[-1]
    status = jnp.where(mu_f <= mu_tol, 0,
                       jnp.where(kk_f >= k_max, 1, 2)).astype(jnp.int32)
    return _result(plan, y_f, kk_f, mu_f, status)


def solve_dense_tick(plan: DensePlan, bflat, cfg,
                     use_kernel: bool = True,
                     y0=None) -> DenseTickResult:
    """The deployment tick: raw per-stage offsets ``vec(b)`` in,
    controls out, through the dense Pallas kernel
    (``ops/dense_kernel.dense_ipm_call``); ``use_kernel=False`` runs the
    pure-JAX oracle (CPU/f64 parity).  ``y0``: warm-start iterate (the
    previous tick's ``y`` — the RTI hot loop; the d_init_var clamp still
    applies)."""
    if not use_kernel:
        return solve_dense_ref(plan, bflat, cfg, y0=y0)
    from ..ops import dense_kernel as dk

    # the vector-condense matvecs and padding run in XLA before the
    # kernel: pin them to f32 (TPU matmuls default to bf16 — measured
    # to break the ORACLE's convergence entirely on hardware)
    with jax.default_matmul_precision("float32"):
        y, kk, mu, status = dk.dense_ipm_call(plan, bflat, cfg, y0=y0)
    return _result(plan, y, kk, mu, status)
