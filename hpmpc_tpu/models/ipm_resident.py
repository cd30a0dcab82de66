"""Solver-resident batched IPM (4th engine generation; latency mode).

Wraps :func:`..ops.resident_kernel.ipm_resident` — the ENTIRE phase-1
Mehrotra loop in ONE pallas_call, state VMEM-resident across iterations,
alpha/sigma step glue in-kernel — with the same batched
:class:`~.ipm.IPMSolution` contract as the other engines.

Semantics: the reference's legacy no-residual solver (``d_ip2_hard.c``) —
the ``mu_switch <= mu_tol`` degeneracy of the flagship: pure delta
formulation to ``mu_tol``/``k_max``; final KKT residuals evaluated once
at the end (one residual kernel), which also provides the residual
duality measure in ``inf_norm_res[:, 3]`` exactly like the other
engines' phase-1 exit.  Differences from the lanes engine, by design:

  * ``stat`` rows are indexed by ITERATION NUMBER, not per-instance
    ``kk`` (identical whenever no instance exits early);
  * ``status=2`` (breakdown freeze) folds the NaN guard and the
    ``alpha_min`` exit into one per-lane frozen flag.

General constraints supported (static active stages, in-kernel C-row
machinery).  Dispatch: ``HPMPC_RESIDENT=1`` routes
eligible ``parallel.batch.solve_batched`` calls here (opt-in until
hardware-validated); ``parallel.batch.solve_single`` is the intended
consumer (deployment latency ticks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ocp import OCPDims, OCPQP
from . import ipm as _ipm
from .ipm_lanes import make_lanes_common


def solve_batched_resident(dims: OCPDims, qp: OCPQP, cfg,
                           z0=None, pi0=None) -> _ipm.IPMSolution:
    with jax.default_matmul_precision("float32"):
        return _impl(dims, qp, cfg, z0=z0, pi0=pi0)


def _impl(dims: OCPDims, qp: OCPQP, cfg, z0=None, pi0=None):
    from ..ops import resident_kernel as rk
    from ..ops import stage_kernel as sk
    from ..ops import step_kernel as stk

    dt = qp.dtype
    N, NU, NX, NZ, NB, NG = (dims.N, dims.NU, dims.NX, dims.NZ,
                             dims.NB, dims.NG)
    Np1 = N + 1
    B = qp.b.shape[0]
    assert B % sk.BI == 0, "resident path requires batch % 1024 == 0"
    assert NB > 0 and dims.idxb is not None
    assert dt == jnp.float32, "resident engine is f32-only"
    ng_stages = tuple(n for n in range(Np1) if dims.ng[n] > 0)
    n_ng = len(ng_stages)
    assert int(getattr(cfg, "iter_ref", 0)) == 0

    from .ipm_lanes import make_ng_lanes

    cm = make_lanes_common(dims, qp, cfg, z0=z0, pi0=pi0)
    nb_blk = cm.nb_blk
    pi0l = (cm.piL0 if cm.piL0 is not None
            else jnp.zeros((nb_blk, N, NX, sk.SUBS, sk.LANES), dt))

    mu_scal = 1.0 / dims.n_constr
    # phase-1-only: run to the flagship's phase-1 floor
    mu_tol = float(max(cfg.mu_tol, getattr(cfg, "mu_switch", 0.0)))

    ngh = make_ng_lanes(dims, qp, ng_stages, dt, B)
    ng_kw = {}
    if n_ng:
        NGF = n_ng * NG

        def g_lanes(flat):  # (B, 2*NGF) [lo-all; up-all] -> lanes
            lo = flat[:, :NGF].reshape(B, n_ng, NG)
            up = flat[:, NGF:].reshape(B, n_ng, NG)
            return sk._to_lanes(jnp.concatenate([lo, up], -1), B)

        lam_g0, t_g0 = cm.ng_init(ngh)
        C_stack = jnp.stack(
            [qp.C[:, n] for n in ng_stages], 1).astype(dt)
        ng_kw = dict(
            NG=NG, ng_stage_ids=ng_stages,
            Cg=sk._to_lanes(C_stack, B),
            dgg=g_lanes(ngh.dg_cat),
            mgg=g_lanes(ngh.mg2),
            lamg0=g_lanes(lam_g0),
            tg0=g_lanes(t_g0),
        )

    outs = rk.ipm_resident(
        cm.idxT, cm.lamL0, cm.tL0, cm.zL0, pi0l,
        cm.gL, cm.pdregL, cm.Hl, cm.Fl, cm.bL, cm.dcatL, cm.mbL,
        NB=NB, NU=NU, NZ=NZ, NX=NX, k_max=int(cfg.k_max),
        mu_scal=float(mu_scal), mu_tol=mu_tol,
        alpha_min=float(cfg.alpha_min), mu0=float(cfg.mu0),
        **ng_kw,
    )
    z_l, pi_l, lam_l, t_l, mu_t, kk_t, frz_t, stat_l = outs[:8]
    if n_ng:
        lamg_l, tg_l = outs[8:10]

    # ---- final residuals (one kernel; engines do this at phase-1 exit) --
    zmaskL = cm.to_lanes3(qp.z_mask)
    xmaskL = cm.to_lanes3(qp.x_mask[:, 1:])
    rqL, rbL, rdL, rmL, musumL = stk.resid_full_flat(
        cm.idxT, cm.Hl, cm.Fl, z_l, pi_l, cm.gL, cm.bL, lam_l, t_l,
        cm.dcatL, cm.mbL, zmaskL, xmaskL, NB=NB, NU=NU, NZ=NZ, NX=NX,
    )
    rbL = rbL[:, :N]
    mu_sum = cm.sc_B(jnp.sum(musumL, axis=1))

    def absmax_l(y):
        return cm.sc_B(jnp.max(jnp.abs(y), axis=tuple(range(1, y.ndim - 2))))

    def absmax_f(x):
        if x.shape[1] == 0:
            return jnp.zeros((B,), dt)
        return jnp.max(jnp.abs(x), axis=1)

    if n_ng:
        NGF = n_ng * NG
        g3 = cm.from_lanes3(lamg_l)                    # (B, n_ng, 2NG)
        lam_g_f = jnp.concatenate(
            [g3[..., :NG].reshape(B, NGF),
             g3[..., NG:].reshape(B, NGF)], 1)
        g3t = cm.from_lanes3(tg_l)
        t_g_f = jnp.concatenate(
            [g3t[..., :NG].reshape(B, NGF),
             g3t[..., NG:].reshape(B, NGF)], 1)
        rqL = ngh.ct_add_lanes(
            rqL, ngh.fold_g(-ngh.sgn_g * lam_g_f) * ngh.mgF)
        czn = ngh.cz_of(z_l)
        rd_g = (ngh.dg_cat - cm.cat2(czn) + ngh.sgn_g * t_g_f) * ngh.mg2
        rm_g = lam_g_f * t_g_f * ngh.mg2
        mu_sum = mu_sum + jnp.sum(rm_g, axis=1)
    else:
        rd_g = jnp.zeros((B, 0), dt)
    mu_res = mu_sum * mu_scal

    inf_norm_res = jnp.stack([
        absmax_l(rqL), absmax_l(rbL),
        jnp.maximum(absmax_l(rdL), absmax_f(rd_g)), mu_res,
    ], axis=1)

    mu = mu_t.reshape(B)
    kk = kk_t.reshape(B).astype(jnp.int32)
    frozen = frz_t.reshape(B) > 0.0
    status = jnp.where(
        frozen, 2, jnp.where(mu <= mu_tol, 0, 1)
    ).astype(jnp.int32)

    lam_b_s = cm.from_lanes3(lam_l).reshape(B, Np1, 2, NB)
    t_b_s = cm.from_lanes3(t_l).reshape(B, Np1, 2, NB)
    stat = jnp.transpose(stat_l, (0, 3, 4, 1, 2)).reshape(
        B, int(cfg.k_max), 5)

    lam_g_s = jnp.zeros((B, Np1, 2, NG), dt)
    t_g_s = jnp.ones((B, Np1, 2, NG), dt)
    if n_ng:
        for j, n in enumerate(ng_stages):
            lam_g_s = lam_g_s.at[:, n, 0].set(g3[:, j, :NG])
            lam_g_s = lam_g_s.at[:, n, 1].set(g3[:, j, NG:])
            t_g_s = t_g_s.at[:, n, 0].set(g3t[:, j, :NG])
            t_g_s = t_g_s.at[:, n, 1].set(g3t[:, j, NG:])

    return _ipm.IPMSolution(
        z=cm.from_lanes3(z_l),
        pi=cm.from_lanes3(pi_l),
        lam_b=lam_b_s, t_b=t_b_s,
        lam_g=lam_g_s, t_g=t_g_s,
        kk=kk, status=status, stat=stat,
        inf_norm_res=inf_norm_res,
    )
