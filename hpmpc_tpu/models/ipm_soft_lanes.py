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
from .ipm import step_ok as _step_ok
from .ipm_lanes import (
    _ipm_fast_knob, _mega_sweeps, make_lanes_common, make_ng_lanes,
)


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

    # ---- shared scaffolding (one copy for hard and soft engines) --------
    cm = make_lanes_common(dims, qp, cfg)
    to_lanes3, from_lanes3 = cm.to_lanes3, cm.from_lanes3
    sc_l, sc_B, cat2, min_ratio = cm.sc_l, cm.sc_B, cm.cat2, cm.min_ratio
    gate, bcast5, stat_update = cm.gate, cm.bcast5, cm.stat_update
    idxT = cm.idxT
    mbL, dcatL, gL, pdregL, bL = cm.mbL, cm.dcatL, cm.gL, cm.pdregL, cm.bL
    Hl, Fl = cm.Hl, cm.Fl
    idxS = jnp.asarray(
        np.asarray(idxbs_static, np.int32).reshape(Np1, NS)
    )

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

    # mu scaling: 2 nb + 2 ng + 4 ns (d_ip2_soft.c:268-271)
    n_hard = 2 * sum(dims.nb) + 2 * sum(dims.ng)
    mu_scal = 1.0 / (
        n_hard + 4.0 * jnp.sum(ms1.reshape(B, -1), axis=1)
    )
    mu_tol = jnp.asarray(cfg.mu_tol, dt)
    alpha_min = jnp.asarray(cfg.alpha_min, dt)
    k_max = cfg.k_max
    mu0 = jnp.asarray(cfg.mu0, dt)

    fused = _ipm_fast_knob()
    mega = _mega_sweeps()
    if mega:
        from ..ops import mega_kernel as mk

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

    def affine_half(s, ngl, qx_g):
        """soft prep + factor + affine solve + affine alpha/sums: ONE
        soft-mega pallas_call when HPMPC_MEGA_SWEEPS=1, else the
        3-kernel sequence.  Returns (dzL, fstate, aff)."""
        if mega:
            ngaddl = ngh.ct_lanes_stream(qx_g) if n_ng else ngh.ngadd0
            outs = mk.factor_solve_soft_mega(
                idxT, idxS, s.lamL, s.tL, dcatL, mbL,
                s.lamsL, s.tsL, softcL, msL, gL, pdregL, Hl,
                ngl, ngaddl, ng_stages, Fl, bL,
                NB=NB, NS=NS, NU=NU, NZ=NZ, NX=NX,
            )
            return outs[0], outs[1], outs[2:]
        dvecL, geffL = stk.soft_prep_flat(
            idxT, idxS, s.lamL, s.tL, dcatL, mbL, s.lamsL, s.tsL,
            softcL, msL, gL, pdregL, NB=NB, NS=NS, NZ=NZ,
        )
        if n_ng:
            geffL = ngh.ct_add_lanes(geffL, qx_g)
        dzL, _, fstate = kkt_factor_solve(dvecL, ngl, geffL)
        aff = stk.soft_alpha_sums_flat(
            idxT, idxS, dzL, s.lamL, s.tL, dcatL, mbL, s.lamsL, s.tsL,
            softcL, msL, None, None, NB=NB, NS=NS, NZ=NZ,
            corrector=False,
        )
        return dzL, fstate, aff

    def corr_half(s, fstate, aff, smL, qx_g2):
        """soft corrector gradient + resolve + corrector alpha/sums (one
        soft-mega pallas_call or the 3-kernel sequence).  Returns
        (dz2L, dpi2L, corr)."""
        if mega:
            ngadd2 = ngh.ct_lanes_stream(qx_g2) if n_ng else ngh.ngadd0
            outs = mk.solve_soft_mega(
                idxT, idxS, fstate, s.lamL, s.tL, dcatL, mbL,
                s.lamsL, s.tsL, softcL, msL,
                aff[0], aff[1], aff[2], aff[3], smL, gL, ngadd2,
                ng_stages, Fl, bL,
                NB=NB, NS=NS, NU=NU, NZ=NZ, NX=NX, exact=exact,
            )
            return outs[0], outs[1], outs[2:]
        geff2L, dl2bL, dl2sL = stk.soft_corr_flat(
            idxT, idxS, s.lamL, s.tL, dcatL, mbL, s.lamsL, s.tsL,
            softcL, msL, aff[0], aff[1], aff[2], aff[3],
            smL, gL, NB=NB, NS=NS, NZ=NZ, exact=exact,
        )
        if n_ng:
            geff2L = ngh.ct_add_lanes(geff2L, qx_g2)
        dz2L, dpi2L = kkt_resolve(fstate, geff2L)
        corr = stk.soft_alpha_sums_flat(
            idxT, idxS, dz2L, s.lamL, s.tL, dcatL, mbL, s.lamsL, s.tsL,
            softcL, msL, dl2bL, dl2sL, NB=NB, NS=NS, NZ=NZ,
            corrector=True,
        )
        return dz2L, dpi2L, corr

    # ---- init (d_init_var_mpc_soft_tv; box/ng init shared via cm) --------
    lam_g0, t_g0 = cm.ng_init(ngh)
    t_s0 = jnp.ones((B, Np1, 4 * NS), dt)
    lam_s0 = jnp.where(ms4_st > 0, mu0, 0.0)

    s0 = _LSState(
        zL=cm.zL0, piL=jnp.zeros((nb_blk, N, NX, sk.SUBS, sk.LANES), dt),
        lamL=cm.lamL0, tL=cm.tL0,
        lam_g=lam_g0, t_g=t_g0,
        lamsL=to_lanes3(lam_s0), tsL=to_lanes3(t_s0),
        mu=jnp.full((B,), mu0, dt),
        alpha=jnp.ones((B,), dt),
        kk=jnp.zeros((B,), jnp.int32),
        stat=jnp.zeros((5, k_max, B), dt),
    )

    def finish(outs, lam_g, t_g, dtg, dlg):
        return cm.finish_alpha_sums(outs, ngh, lam_g, t_g, dtg, dlg)

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

        dzL, fstate, aff = affine_half(s, ngl, qx_g if n_ng else None)
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

        if n_ng:
            dl2g = t_inv_g * (sm[:, None] - dlg * dtg) * mg2
            qx_g2 = qx_g + ngh.fold_g(-sgn_g * dl2g) * mgF
        else:
            qx_g2 = None
        dz2L, dpi2L, corr = corr_half(
            s, fstate, aff, sc_l(sm)[:, None], qx_g2
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
        ok = _step_ok(mu_new, s.mu)
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
