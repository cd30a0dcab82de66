"""Lanes-resident batched SOFT IPM (the :mod:`.ipm_lanes` treatment of
:mod:`.ipm_soft_fast`).

Same single-loop Mehrotra predictor-corrector and per-iteration slack
Schur elimination as ``d_ip2_mpc_soft_tv`` (``mpc_solvers/d_ip2_soft.c:83``),
with the loop state held in the Pallas kernels' lanes layout end to end:
the soft step primitives (the 4-slack-family elementwise machinery of
``mpc_solvers/{c99,avx}/d_aux_ip_soft_lib4.c``, including the Zl/zl Schur
recurrences at ``:167`` and the corrector gradient at ``:508``) run as
the ``soft_*`` kernels of :mod:`..ops.step_kernel`, the Riccati sweeps
run ``lanes_io=True``, and XLA keeps the per-instance scalars, the tiny
general-constraint streams, gating and the trace.

Dispatched from :func:`hpmpc_tpu.parallel.batch.solve_batched_soft` when
``HPMPC_LANES_LOOP=1`` (same A/B knob as the hard engine; composes with
``HPMPC_FUSED_SWEEPS``).  f32-only; requires NB > 0 and NS > 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ocp import OCPDims, OCPQP
from . import ipm_soft as _soft
from .ipm_lanes import make_ng_lanes


class _LSState(NamedTuple):
    zL: jax.Array      # (nb, N+1, NZ, 8, 128)
    piL: jax.Array     # (nb, N, NX, 8, 128)
    lamL: jax.Array    # (nb, N+1, 2NB, 8, 128)
    tL: jax.Array      # (nb, N+1, 2NB, 8, 128)
    lam_g: jax.Array   # (B, 2*NGF) flat
    t_g: jax.Array     # (B, 2*NGF)
    lamsL: jax.Array   # (nb, N+1, 4NS, 8, 128)  [lo; up; s_lo; s_up]
    tsL: jax.Array     # (nb, N+1, 4NS, 8, 128)
    mu: jax.Array      # (B,)
    alpha: jax.Array   # (B,)
    kk: jax.Array      # (B,) int32
    stat: jax.Array    # (5, k_max, B)


def solve_batched_soft_lanes(
    dims: OCPDims, qp: OCPQP, soft, cfg, idxbs_static,
    exact_mehrotra_soft: bool = True,
) -> _soft.SoftSolution:
    """Batch-level lanes-resident soft solve (same contract as
    :func:`.ipm_soft_fast.solve_batched_flat`)."""
    with jax.default_matmul_precision("float32"):
        return _impl(dims, qp, soft, cfg, idxbs_static, exact_mehrotra_soft)


def _impl(dims, qp, soft, cfg, idxbs_static, exact):
    from ..ops import stage_kernel as sk
    from ..ops import step_kernel as stk

    dt = qp.dtype
    N, NU, NX, NZ, NB, NG = dims.N, dims.NU, dims.NX, dims.NZ, dims.NB, dims.NG
    Np1 = N + 1
    B = qp.b.shape[0]
    assert B % sk.BI == 0, "lanes path requires batch % 1024 == 0"
    assert NB > 0, "lanes path requires box constraints (NB > 0)"
    assert dims.idxb is not None
    NS = soft.ns_mask.shape[-1]
    assert NS > 0
    nb_blk = B // sk.BI

    ng_stages = tuple(n for n in range(Np1) if dims.ng[n] > 0)
    n_ng = len(ng_stages)
    NGF = n_ng * NG

    def to_lanes3(x):
        return sk._to_lanes(x, B)

    def from_lanes3(y):
        return sk._from_lanes(y, B)

    def sc_l(x):
        return x.reshape(nb_blk, sk.SUBS, sk.LANES)

    def sc_B(y):
        return y.reshape(B)

    # ---- trace-time constants -------------------------------------------
    idx_np = np.zeros((Np1, NB), np.int32)
    for n in range(Np1):
        nun = dims.nu[n]
        for k in range(dims.nb[n]):
            j = int(dims.idxb[n][k])
            idx_np[n, k] = j if j < nun else NU + (j - nun)
    idxT = jnp.asarray(idx_np)
    idxS = jnp.asarray(
        np.asarray(idxbs_static, np.int32).reshape(Np1, NS)
    )

    mb1 = qp.nb_mask
    mb_st = jnp.concatenate([mb1, mb1], -1)
    dcat_st = jnp.concatenate([qp.d_lb, qp.d_ub], -1)
    mbL = to_lanes3(mb_st)
    dcatL = to_lanes3(dcat_st)
    gL = to_lanes3(qp.g * qp.z_mask)
    reg = jnp.asarray(cfg.reg_eps, dt)
    pdregL = to_lanes3(qp.pad_diag + reg)
    bL = to_lanes3(qp.b)
    Hl = sk._to_lanes(sk.sym_compress(qp.H.astype(dt)), B)
    Fl = sk._to_lanes(qp.F.astype(dt), B)

    ms1 = soft.ns_mask                                   # (B, Np1, NS)
    ms4_st = jnp.concatenate([ms1] * 4, -1)              # (B, Np1, 4NS)
    msL = to_lanes3(ms1)
    # soft constants: [d_lbs; d_ubs; Z0; Z1; zlin0; zlin1] per stage
    softcL = to_lanes3(jnp.concatenate([
        soft.d_lbs, soft.d_ubs,
        soft.Z[:, :, 0], soft.Z[:, :, 1],
        soft.z_lin[:, :, 0], soft.z_lin[:, :, 1],
    ], -1))

    ngh = make_ng_lanes(dims, qp, ng_stages, dt, B)
    mgF, dg_cat, mg2, sgn_g = ngh.mgF, ngh.dg_cat, ngh.mg2, ngh.sgn_g

    def cat2(v):
        return jnp.concatenate([v, v], 1)

    def min_ratio(a, v, dv, m):
        if v.shape[1] == 0:
            return a
        pred = (dv < 0.0) & (m > 0.0)
        ratio = jnp.where(pred, -v / jnp.where(pred, dv, -1.0), jnp.inf)
        return jnp.minimum(a, jnp.min(ratio, axis=1))

    # mu scaling: 2 nb + 2 ng + 4 ns (d_ip2_soft.c:268-271)
    n_hard = 2 * sum(dims.nb) + 2 * sum(dims.ng)
    mu_scal = 1.0 / (
        n_hard + 4.0 * jnp.sum(ms1.reshape(B, -1), axis=1)
    )
    mu_tol = jnp.asarray(cfg.mu_tol, dt)
    alpha_min = jnp.asarray(cfg.alpha_min, dt)
    k_max = cfg.k_max
    thr0 = jnp.asarray(0.1, dt)
    mu0 = jnp.asarray(cfg.mu0, dt)

    fused = __import__(
        "hpmpc_tpu.models.ipm_fast", fromlist=["_fused_sweeps"]
    )._fused_sweeps()

    def kkt_factor_solve(dvecL, ngl, geffL):
        if fused:
            return sk.factor_solve_folded_flat_fused(
                Hl, dvecL, ngl, ng_stages, geffL, Fl, bL,
                NU, NZ, NX, lanes_io=True,
            )
        return sk.factor_solve_folded_flat(
            Hl, dvecL, ngl, ng_stages, geffL, Fl, bL,
            NU, NZ, NX, want_pi=False, lanes_io=True,
        )

    def kkt_resolve(fstate, geffL):
        Ll_l, Lxx_l, Pb_l = fstate
        fn = sk.solve_flat_fused if fused else sk.solve_flat
        return fn(Ll_l, Lxx_l, Pb_l, geffL, Fl, bL, NU, NZ, NX,
                  lanes_io=True)

    def gate(m, new, old):
        m_l = sc_l(m)
        out = []
        for f, a, b in zip(_LSState._fields, new, old):
            if f == "stat":
                mm = m[None, None, :]
            elif a.ndim >= 4:
                mm = m_l.reshape(
                    (nb_blk,) + (1,) * (a.ndim - 3) + (sk.SUBS, sk.LANES)
                )
            else:
                mm = m.reshape((B,) + (1,) * (a.ndim - 1))
            out.append(jnp.where(mm, a, b))
        return _LSState(*out)

    def bcast5(a2, like):
        return sc_l(a2).reshape(
            (nb_blk,) + (1,) * (like.ndim - 3) + (sk.SUBS, sk.LANES)
        )

    # ---- init (d_init_var_mpc_soft_tv; box == ipm_lanes) -----------------
    d_lb3, d_ub3 = qp.d_lb, qp.d_ub
    zb0 = jnp.zeros((B, Np1, NB), dt)
    t_lo0 = zb0 - d_lb3
    t_up0 = d_ub3 - zb0
    both = (t_lo0 < thr0) & (t_up0 < thr0)
    lo_only = (t_lo0 < thr0) & ~both
    up_only = (t_up0 < thr0) & ~both
    t_lo = jnp.where(both | lo_only, thr0, t_lo0)
    t_up = jnp.where(both | up_only, thr0, t_up0)
    z_corr = jnp.where(
        both, (d_lb3 - d_ub3) * 0.5,
        jnp.where(lo_only, d_lb3 + thr0,
                  jnp.where(up_only, d_ub3 - thr0, zb0)),
    )
    changed = ((both | lo_only | up_only) & (mb1 > 0)).astype(dt)
    sel_np = np.zeros((Np1, NZ, NB), np.float32)
    for n in range(Np1):
        for k in range(dims.nb[n]):
            sel_np[n, idx_np[n, k], k] = 1.0
    z0 = jnp.einsum(
        "bnk,nzk->bnz", changed * z_corr, jnp.asarray(sel_np, dt),
        precision=jax.lax.Precision.HIGHEST,
    )

    t_b0 = jnp.concatenate([t_lo, t_up], -1)
    t_b0 = jnp.where(mb_st > 0, t_b0, 1.0)
    lam_b0 = jnp.where(mb_st > 0, mu0 / t_b0, 0.0)

    zL0 = to_lanes3(z0)
    if n_ng:
        czv = ngh.cz_of(zL0)
        t_g0 = jnp.maximum(thr0, sgn_g * (cat2(czv) - dg_cat))
        t_g0 = jnp.where(mg2 > 0, t_g0, 1.0)
        lam_g0 = jnp.where(mg2 > 0, mu0 / t_g0, 0.0)
    else:
        t_g0 = jnp.ones((B, 0), dt)
        lam_g0 = jnp.zeros((B, 0), dt)
    t_s0 = jnp.ones((B, Np1, 4 * NS), dt)
    lam_s0 = jnp.where(ms4_st > 0, mu0, 0.0)

    s0 = _LSState(
        zL=zL0, piL=jnp.zeros((nb_blk, N, NX, sk.SUBS, sk.LANES), dt),
        lamL=to_lanes3(lam_b0), tL=to_lanes3(t_b0),
        lam_g=lam_g0, t_g=t_g0,
        lamsL=to_lanes3(lam_s0), tsL=to_lanes3(t_s0),
        mu=jnp.full((B,), mu0, dt),
        alpha=jnp.ones((B,), dt),
        kk=jnp.zeros((B,), jnp.int32),
        stat=jnp.zeros((5, k_max, B), dt),
    )

    kiota = jnp.arange(k_max, dtype=jnp.int32)

    def stat_update(stat, kk, row):
        mask = kiota[None, :, None] == kk[None, None, :]
        return jnp.where(mask, row[:, None, :], stat)

    def finish(outs, lam_g, t_g, dtg, dlg):
        amin = sc_B(jnp.min(outs[4], axis=1))
        sums = [sc_B(jnp.sum(o, axis=1)) for o in outs[5:8]]
        if n_ng:
            amin = min_ratio(amin, lam_g, dlg, mg2)
            amin = min_ratio(amin, t_g, dtg, mg2)
            sums[0] = sums[0] + jnp.sum(lam_g * t_g * mg2, axis=1)
            sums[1] = sums[1] + jnp.sum(lam_g * dtg + t_g * dlg, axis=1)
            sums[2] = sums[2] + jnp.sum(dlg * dtg, axis=1)
        alpha = jnp.minimum(jnp.ones((B,), dt), amin)
        return alpha, sums[0], sums[1], sums[2]

    # ---- single loop (d_ip2_mpc_soft_tv, lanes) --------------------------
    def body(s):
        if n_ng:
            t_inv_g = jnp.where(mg2 > 0, 1.0 / s.t_g, 0.0)
            lamt_g = s.lam_g * t_inv_g
            Qx_g = ngh.fold_g(lamt_g) * mgF
            qx_g = ngh.fold_g(-sgn_g * s.lam_g - lamt_g * dg_cat) * mgF
            ngl = ngh.ngl_of(Qx_g)
        else:
            t_inv_g = lamt_g = jnp.zeros((B, 0), dt)
            ngl = ngh.ngl0

        dvecL, geffL = stk.soft_prep_flat(
            idxT, idxS, s.lamL, s.tL, dcatL, mbL, s.lamsL, s.tsL,
            softcL, msL, gL, pdregL, NB=NB, NS=NS, NZ=NZ,
        )
        if n_ng:
            geffL = ngh.ct_add_lanes(geffL, qx_g)
        dzL, _, fstate = kkt_factor_solve(dvecL, ngl, geffL)

        aff = stk.soft_alpha_sums_flat(
            idxT, idxS, dzL, s.lamL, s.tL, dcatL, mbL, s.lamsL, s.tsL,
            softcL, msL, None, None, NB=NB, NS=NS, NZ=NZ, corrector=False,
        )
        if n_ng:
            czn = ngh.cz_of(dzL)
            dtg = (sgn_g * (cat2(czn) - dg_cat) - s.t_g) * mg2
            dlg = (-lamt_g * dtg - s.lam_g) * mg2
        else:
            dtg = dlg = jnp.zeros((B, 0), dt)
        alpha_aff, a0, a1, a2c = finish(aff, s.lam_g, s.t_g, dtg, dlg)
        a = 0.995 * alpha_aff
        mu_aff = (a0 + a * a1 + a * a * a2c) * mu_scal
        sigma = (mu_aff / s.mu) ** 3
        sm = sigma * s.mu

        geff2L, dl2bL, dl2sL = stk.soft_corr_flat(
            idxT, idxS, s.lamL, s.tL, dcatL, mbL, s.lamsL, s.tsL,
            softcL, msL, aff[0], aff[1], aff[2], aff[3],
            sc_l(sm)[:, None], gL, NB=NB, NS=NS, NZ=NZ, exact=exact,
        )
        if n_ng:
            dl2g = t_inv_g * (sm[:, None] - dlg * dtg) * mg2
            qx_g2 = qx_g + ngh.fold_g(-sgn_g * dl2g) * mgF
            geff2L = ngh.ct_add_lanes(geff2L, qx_g2)
        dz2L, dpi2L = kkt_resolve(fstate, geff2L)

        corr = stk.soft_alpha_sums_flat(
            idxT, idxS, dz2L, s.lamL, s.tL, dcatL, mbL, s.lamsL, s.tsL,
            softcL, msL, dl2bL, dl2sL, NB=NB, NS=NS, NZ=NZ,
            corrector=True,
        )
        if n_ng:
            czn2 = ngh.cz_of(dz2L)
            dtg2 = (sgn_g * (cat2(czn2) - dg_cat) - s.t_g) * mg2
            dlg2 = (dl2g - lamt_g * dtg2 - s.lam_g) * mg2
        else:
            dtg2 = dlg2 = jnp.zeros((B, 0), dt)
        alpha2, b0, b1, b2 = finish(corr, s.lam_g, s.t_g, dtg2, dlg2)
        a2 = 0.995 * alpha2
        mu_new = (b0 + a2 * b1 + a2 * a2 * b2) * mu_scal

        z_new = s.zL + bcast5(a2, s.zL) * (dz2L - s.zL)
        pi_new = s.piL + bcast5(a2, s.piL) * (dpi2L - s.piL)
        lam_n = s.lamL + bcast5(a2, s.lamL) * corr[1]
        t_n = s.tL + bcast5(a2, s.tL) * corr[0]
        lams_n = s.lamsL + bcast5(a2, s.lamsL) * corr[3]
        ts_n = s.tsL + bcast5(a2, s.tsL) * corr[2]
        lam_g_n = s.lam_g + a2[:, None] * dlg2
        t_g_n = s.t_g + a2[:, None] * dtg2

        row = jnp.stack([sigma, alpha_aff, mu_aff, alpha2, mu_new])
        s_new = _LSState(
            zL=z_new, piL=pi_new, lamL=lam_n, tL=t_n,
            lam_g=lam_g_n, t_g=t_g_n, lamsL=lams_n, tsL=ts_n,
            mu=mu_new, alpha=alpha2 * 0.995, kk=s.kk + 1,
            stat=stat_update(s.stat, s.kk, row),
        )
        ok = jnp.isfinite(mu_new)
        return gate(ok, s_new, s._replace(alpha=jnp.zeros_like(s.alpha)))

    def pred_b(s):
        return (s.kk < k_max) & (s.mu > mu_tol) & (s.alpha >= alpha_min)

    def gated(s):
        return gate(pred_b(s), body(s), s)

    sf = lax.while_loop(lambda s: jnp.any(pred_b(s)), gated, s0)

    status = jnp.where(
        sf.mu <= mu_tol, 0, jnp.where(sf.kk >= k_max, 1, 2)
    ).astype(jnp.int32)

    # ---- structured outputs (SoftSolution contract) ----------------------
    lam_b_s = from_lanes3(sf.lamL).reshape(B, Np1, 2, NB)
    t_b_s = from_lanes3(sf.tL).reshape(B, Np1, 2, NB)
    lam_g_s = jnp.zeros((B, Np1, 2, NG), dt)
    t_g_s = jnp.ones((B, Np1, 2, NG), dt)
    for k, n in enumerate(ng_stages):
        sl = slice(k * NG, (k + 1) * NG)
        lam_g_s = lam_g_s.at[:, n, 0].set(sf.lam_g[:, sl])
        lam_g_s = lam_g_s.at[:, n, 1].set(sf.lam_g[:, NGF:][:, sl])
        t_g_s = t_g_s.at[:, n, 0].set(sf.t_g[:, sl])
        t_g_s = t_g_s.at[:, n, 1].set(sf.t_g[:, NGF:][:, sl])
    lam_s_s = from_lanes3(sf.lamsL).reshape(B, Np1, 4, NS)
    t_s_s = from_lanes3(sf.tsL).reshape(B, Np1, 4, NS)

    return _soft.SoftSolution(
        z=from_lanes3(sf.zL),
        pi=from_lanes3(sf.piL),
        lam_b=lam_b_s, t_b=t_b_s, lam_g=lam_g_s, t_g=t_g_s,
        lam_s=lam_s_s, t_s=t_s_s,
        kk=sf.kk, status=status,
        stat=jnp.transpose(sf.stat, (2, 1, 0)),
    )
