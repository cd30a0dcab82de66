"""Lanes-resident batched IPM — the all-kernel TPU throughput engine.

Same two-phase Mehrotra predictor-corrector as :mod:`.ipm` /
:mod:`.ipm_fast` (``mpc_solvers/d_ip2_res_hard.c:116``), with the ENTIRE
loop state held in the Pallas kernels' native lanes layout
(``(nb, N+1, k, 8, 128)`` — instances in the vector lanes, one (8, 128)
tile per slot per stage).  Where :mod:`.ipm_fast` keeps ``(B, flat)``
state and pays, per iteration,

  * ~8 HIGHEST-precision 0/1 selection-matrix matmuls for the box
    gather/scatters (~6 MXU passes each),
  * two lanes transposes per Riccati sweep call (g/b in, z/pi out),
  * ~30 XLA elementwise passes + reductions over the slack streams,

here every step phase is one Pallas kernel from :mod:`..ops.step_kernel`
(the reference's arch-vectorized IPM step primitives,
``mpc_solvers/avx/d_aux_ip_hard_lib4.c``, as TPU kernels), the sweeps run
with ``lanes_io=True`` (no boundary transposes), and XLA keeps only the
per-instance scalar math (alpha/mu/sigma), the tiny general-constraint
streams, the gating and the trace.

State dtype == kernel dtype (f32 on TPU; f64 works in interpret mode for
parity tests).  Warm start (``z0``/``pi0`` seeding) is supported, as are
``state0`` hot continuation and ``iter_ref`` mu-gated Newton refinement
(the reference ITER_REF, ``d_ip2_res_hard.c:48,1086-1163``) — the
two-stage parity route's stage 2 runs HERE, with the refinement
residuals assembled as pure elementwise lanes ops (the stage-coupling
terms are contiguous slice-adds in this layout — no selection matmuls)
and the correction re-solves in :func:`~..ops.stage_kernel.solve_flat_pb`
(Pb recomputed in-kernel).  Mixed precision stays on :mod:`.ipm_fast`;
custom KKT factories (tree) are not supported here.
Dispatched from :func:`hpmpc_tpu.parallel.batch.solve_batched` when
``HPMPC_LANES_LOOP=1`` (hardware A/B knob, like ``HPMPC_FUSED_SWEEPS``).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ocp import OCPDims, OCPQP
from . import ipm as _ipm


def _mega_sweeps() -> bool:
    """HPMPC_MEGA_SWEEPS routes each half-iteration through ONE
    mega-sweep pallas_call (ops/mega_kernel.py: prep+sv+fwd+alpha /
    corr+trs+fwd+alpha).  Default ON (hardware-validated: 481k vs 416k
    solves/s for the 6-kernel lanes loop on v5e); set =0 to A/B.
    Read per trace, like the other A/B knobs."""
    return os.environ.get("HPMPC_MEGA_SWEEPS", "1") == "1"


def _ipm_fast_knob() -> bool:
    from . import ipm_fast as _ipf

    return _ipf._fused_sweeps()



def make_ng_lanes(dims, qp, ng_stages, dt, B):
    """General-constraint machinery over lanes-resident z streams.

    The ng streams are a few (B, NG) vectors on a few stages, so they run
    as tiny XLA einsums (exactly ipm_fast's scheme) while everything else
    lives in kernels.  Shared by the hard and soft lanes engines."""
    import types

    from ..ops import stage_kernel as sk

    NG, NZ = dims.NG, dims.NZ
    n_ng = len(ng_stages)
    NGF = n_ng * NG
    NT = sk._sym_nt(NZ)
    nb_blk = B // sk.BI
    HI = jax.lax.Precision.HIGHEST

    def stage_flat(zl, n):
        x = jnp.transpose(zl[:, n], (0, 2, 3, 1))
        return x.reshape(B, -1)

    ns = types.SimpleNamespace(n_ng=n_ng, NGF=NGF)
    if not n_ng:
        # the zero barrier-term stream for the ng-less kernels; only this
        # path ever consumes it (ngl_of covers n_ng > 0)
        ns.ngl0 = jnp.zeros((nb_blk, 1, NT, sk.SUBS, sk.LANES), dt)
        ns.ngadd0 = jnp.zeros((nb_blk, 1, NZ, sk.SUBS, sk.LANES), dt)
        ns.mgF = ns.dg_cat = ns.mg2 = ns.sgn_g = jnp.zeros((B, 0), dt)
        ns.cz_of = lambda zl: jnp.zeros((B, 0), dt)
        ns.ct_add_lanes = lambda gl, v: gl
        ns.fold_g = lambda v: v
        ns.ngl_of = lambda Qx_g: ns.ngl0
        ns.ct_lanes_stream = lambda v: ns.ngadd0
        return ns
    ns.ngl0 = None

    C_act = [qp.C[:, n] for n in ng_stages]            # each (B, NG, NZ)
    Ct1, Ct2 = sk.sym_pair_streams(
        jnp.stack(C_act, 1).astype(jnp.float32), NZ
    )
    # loop-invariant C rows as a lanes stream (the fused refine pass's
    # in-kernel barrier-gradient fold reads these per active stage)
    ns.Cl_lanes = sk._to_lanes(jnp.stack(C_act, 1).astype(dt), B)
    ns.mgF = jnp.concatenate([qp.ng_mask[:, n] for n in ng_stages], 1)
    dg_lo = jnp.concatenate([qp.d_lg[:, n] for n in ng_stages], 1)
    dg_up = jnp.concatenate([qp.d_ug[:, n] for n in ng_stages], 1)
    ns.dg_cat = jnp.concatenate([dg_lo, dg_up], 1)
    ns.mg2 = jnp.concatenate([ns.mgF, ns.mgF], 1)
    ns.sgn_g = jnp.concatenate(
        [jnp.ones((1, NGF), dt), -jnp.ones((1, NGF), dt)], 1
    )

    def cz_of(zl):
        outs = [
            jnp.einsum("bgz,bz->bg", C_act[k], stage_flat(zl, n))
            for k, n in enumerate(ng_stages)
        ]
        return jnp.concatenate(outs, 1)

    def ct_add_lanes(gl, v):
        """gl[:, n] += lanes(C_n' v_n) on the active stages."""
        for k, n in enumerate(ng_stages):
            contrib = jnp.einsum(
                "bg,bgz->bz", v[:, k * NG : (k + 1) * NG], C_act[k]
            )
            cl = jnp.transpose(
                contrib.reshape(nb_blk, sk.SUBS, sk.LANES, NZ),
                (0, 3, 1, 2),
            )
            gl = gl.at[:, n].add(cl)
        return gl

    def ngl_of(Qx_g):
        Qg = Qx_g.reshape(B, n_ng, NG).astype(jnp.float32)
        ngt = jnp.einsum("bngt,bng,bngt->bnt", Ct1, Qg, Ct2, precision=HI)
        return sk._to_lanes_flat(
            ngt.reshape(B, -1).astype(dt), B, (n_ng, NT)
        )

    def ct_lanes_stream(v):
        """(B, NGF) -> per-active-stage C' v contributions as an
        (nb, n_ng, NZ, 8, 128) stream (the mega kernels' ngadd input)."""
        outs = []
        for k, n in enumerate(ng_stages):
            contrib = jnp.einsum(
                "bg,bgz->bz", v[:, k * NG : (k + 1) * NG], C_act[k]
            )
            outs.append(jnp.transpose(
                contrib.reshape(nb_blk, sk.SUBS, sk.LANES, NZ),
                (0, 3, 1, 2),
            ))
        return jnp.stack(outs, 1)

    ns.cz_of = cz_of
    ns.ct_add_lanes = ct_add_lanes
    ns.ct_lanes_stream = ct_lanes_stream
    ns.fold_g = lambda v: v[:, :NGF] + v[:, NGF:]
    ns.ngl_of = ngl_of
    return ns



def make_lanes_common(dims, qp, cfg, z0=None, pi0=None):
    """Shared scaffolding of the lanes-resident engines (hard and soft):
    layout helpers, SMEM index table, box constant streams, the
    d_init_var box initialization, state gating, and the alpha/mu-sum
    finisher.  One copy so a fix cannot land in one engine only.

    ``z0``/``pi0`` with ``cfg.warm_start`` seed the iterate streams
    (``d_ip2_res_hard.c:116`` arg 6); the d_init_var box-violation
    correction branch still applies to the seeded iterate."""
    import types

    from ..ops import stage_kernel as sk

    dt = qp.dtype
    N, NU, NZ, NB = dims.N, dims.NU, dims.NZ, dims.NB
    Np1 = N + 1
    B = qp.b.shape[0]
    nb_blk = B // sk.BI
    ns = types.SimpleNamespace(B=B, nb_blk=nb_blk, dt=dt)

    # ---- layout helpers (the canonical stage_kernel transposes) ---------
    ns.to_lanes3 = lambda x: sk._to_lanes(x, B)
    ns.from_lanes3 = lambda y: sk._from_lanes(y, B)
    ns.sc_l = lambda x: x.reshape(nb_blk, sk.SUBS, sk.LANES)
    ns.sc_B = lambda y: y.reshape(B)
    ns.cat2 = lambda v: jnp.concatenate([v, v], 1)

    def min_ratio(a, v, dv, m):
        if v.shape[1] == 0:
            return a
        pred = (dv < 0.0) & (m > 0.0)
        ratio = jnp.where(pred, -v / jnp.where(pred, dv, -1.0), jnp.inf)
        return jnp.minimum(a, jnp.min(ratio, axis=1))

    ns.min_ratio = min_ratio

    def gate(m, new, old):
        m_l = ns.sc_l(m)
        out = []
        for f, a, b in zip(new._fields, new, old):
            if f == "stat":
                mm = m[None, None, :]
            elif a.ndim >= 4:
                mm = m_l.reshape(
                    (nb_blk,) + (1,) * (a.ndim - 3) + (sk.SUBS, sk.LANES)
                )
            else:
                mm = m.reshape((B,) + (1,) * (a.ndim - 1))
            out.append(jnp.where(mm, a, b))
        return type(new)(*out)

    ns.gate = gate

    def bcast5(a2, like):
        return ns.sc_l(a2).reshape(
            (nb_blk,) + (1,) * (like.ndim - 3) + (sk.SUBS, sk.LANES)
        )

    ns.bcast5 = bcast5

    kiota = jnp.arange(cfg.k_max, dtype=jnp.int32)

    def stat_update(stat, kk, row):
        mask = kiota[None, :, None] == kk[None, None, :]
        return jnp.where(mask, row[:, None, :], stat)

    ns.stat_update = stat_update

    def finish_alpha_sums(outs, ngh, lam_g, t_g, dtg, dlg):
        """Combine the step kernel's per-stage (amin, s0, s1, s2) partials
        (last four entries of ``outs``) with the tiny ng contributions."""
        amin_l, s0_l, s1_l, s2_l = outs[-4:]
        amin = ns.sc_B(jnp.min(amin_l, axis=1))
        s0 = ns.sc_B(jnp.sum(s0_l, axis=1))
        s1 = ns.sc_B(jnp.sum(s1_l, axis=1))
        s2 = ns.sc_B(jnp.sum(s2_l, axis=1))
        if ngh.n_ng:
            amin = min_ratio(amin, lam_g, dlg, ngh.mg2)
            amin = min_ratio(amin, t_g, dtg, ngh.mg2)
            s0 = s0 + jnp.sum(lam_g * t_g * ngh.mg2, axis=1)
            s1 = s1 + jnp.sum(lam_g * dtg + t_g * dlg, axis=1)
            s2 = s2 + jnp.sum(dlg * dtg, axis=1)
        alpha = jnp.minimum(jnp.ones((B,), dt), amin)
        return alpha, s0, s1, s2

    ns.finish_alpha_sums = finish_alpha_sums

    # ---- SMEM box index table + one-time init selection -----------------
    idx_np = np.zeros((Np1, NB), np.int32)
    sel_np = np.zeros((Np1, NZ, NB), np.float32)
    for n in range(Np1):
        nun = dims.nu[n]
        for k in range(dims.nb[n]):
            j = int(dims.idxb[n][k])
            jp = j if j < nun else NU + (j - nun)
            idx_np[n, k] = jp
            sel_np[n, jp, k] = 1.0
    ns.idxT = jnp.asarray(idx_np)
    Sel = jnp.asarray(sel_np, dt)

    # ---- box constant streams ------------------------------------------
    mb1 = qp.nb_mask                                   # (B, Np1, NB)
    ns.mb_st = jnp.concatenate([mb1, mb1], -1)         # (B, Np1, 2NB)
    ns.mbL = ns.to_lanes3(ns.mb_st)
    ns.dcatL = ns.to_lanes3(jnp.concatenate([qp.d_lb, qp.d_ub], -1))
    ns.gL = ns.to_lanes3(qp.g * qp.z_mask)
    reg = jnp.asarray(cfg.reg_eps, dt)
    ns.pdregL = ns.to_lanes3(qp.pad_diag + reg)
    ns.bL = ns.to_lanes3(qp.b)
    ns.Hl = sk._to_lanes(sk.sym_compress(qp.H.astype(dt)), B)
    ns.Fl = sk._to_lanes(qp.F.astype(dt), B)

    # ---- init (exact reference branching; ipm.init_vars twin) ------------
    thr0 = jnp.asarray(0.1, dt)
    mu0 = jnp.asarray(cfg.mu0, dt)
    HIP = jax.lax.Precision.HIGHEST
    d_lb3, d_ub3 = qp.d_lb, qp.d_ub
    if getattr(cfg, "warm_start", False) and z0 is not None:
        z_in = jnp.asarray(z0, dt) * qp.z_mask         # (B, Np1, NZ)
        zb0 = jnp.einsum("bnz,nzk->bnk", z_in, Sel, precision=HIP)
    else:
        z_in = jnp.zeros((B, Np1, NZ), dt)
        zb0 = jnp.zeros((B, Np1, NB), dt)              # gather of z0 = 0
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
    z0_full = (
        z_in * (1.0 - jnp.einsum("bnk,nzk->bnz", changed, Sel, precision=HIP))
        + jnp.einsum("bnk,nzk->bnz", changed * z_corr, Sel, precision=HIP)
    )
    t_b0 = jnp.concatenate([t_lo, t_up], -1)
    t_b0 = jnp.where(ns.mb_st > 0, t_b0, 1.0)
    lam_b0 = jnp.where(ns.mb_st > 0, mu0 / t_b0, 0.0)
    ns.zL0 = ns.to_lanes3(z0_full)
    ns.lamL0 = ns.to_lanes3(lam_b0)
    ns.tL0 = ns.to_lanes3(t_b0)
    if getattr(cfg, "warm_start", False) and pi0 is not None:
        ns.piL0 = ns.to_lanes3(jnp.asarray(pi0, dt) * qp.x_mask[:, 1:])
    else:
        ns.piL0 = None

    def ng_init(ngh):
        """Slack/multiplier init for the general-constraint streams."""
        if not ngh.n_ng:
            return (jnp.zeros((B, 0), dt), jnp.ones((B, 0), dt))
        czv = ngh.cz_of(ns.zL0)
        t_g0 = jnp.maximum(
            thr0, ngh.sgn_g * (ns.cat2(czv) - ngh.dg_cat)
        )
        t_g0 = jnp.where(ngh.mg2 > 0, t_g0, 1.0)
        lam_g0 = jnp.where(ngh.mg2 > 0, mu0 / t_g0, 0.0)
        return lam_g0, t_g0

    ns.ng_init = ng_init
    return ns


class _LState(NamedTuple):
    zL: jax.Array      # (nb, N+1, NZ, 8, 128)
    piL: jax.Array     # (nb, N, NX, 8, 128)
    lamL: jax.Array    # (nb, N+1, 2NB, 8, 128)  per stage [lower; upper]
    tL: jax.Array      # (nb, N+1, 2NB, 8, 128)
    lam_g: jax.Array   # (B, 2*NGF) flat (tiny; XLA)
    t_g: jax.Array     # (B, 2*NGF)
    mu: jax.Array      # (B,)
    alpha: jax.Array   # (B,)
    kk: jax.Array      # (B,) int32
    stat: jax.Array    # (5, k_max, B)
    lam_ref: jax.Array  # (B,) cumulative-guard anchor (ipm.anchor_lam_ref)


class _LRes(NamedTuple):
    rqL: jax.Array     # (nb, N+1, NZ, 8, 128)
    rbL: jax.Array     # (nb, N, NX, 8, 128)
    rdL: jax.Array     # (nb, N+1, 2NB, 8, 128)
    rmL: jax.Array     # (nb, N+1, 2NB, 8, 128)
    rd_g: jax.Array    # (B, 2*NGF)
    rm_g: jax.Array    # (B, 2*NGF)
    mu: jax.Array      # (B,)


def solve_batched_lanes(dims: OCPDims, qp: OCPQP, cfg,
                        z0=None, pi0=None, state0=None) -> _ipm.IPMSolution:
    """Batch-level lanes-resident solve (same contract as
    :func:`.ipm_fast.solve_batched_flat`, incl. the warm-start ``z0``/
    ``pi0`` seeding, ``state0`` hot continuation and ``iter_ref``
    mu-gated refinement; requires NB > 0, static idxb)."""
    with jax.default_matmul_precision("float32"):
        return _impl(dims, qp, cfg, z0=z0, pi0=pi0, state0=state0)


def _impl(dims: OCPDims, qp: OCPQP, cfg, z0=None, pi0=None,
          state0=None) -> _ipm.IPMSolution:
    from ..ops import stage_kernel as sk
    from ..ops import step_kernel as stk

    dt = qp.dtype
    N, NU, NX, NZ, NB, NG = dims.N, dims.NU, dims.NX, dims.NZ, dims.NB, dims.NG
    Np1 = N + 1
    B = qp.b.shape[0]
    assert B % sk.BI == 0, "lanes path requires batch % 1024 == 0"
    assert NB > 0, "lanes path requires box constraints (NB > 0)"
    assert dims.idxb is not None, "lanes path requires static dims.idxb"
    n_constr = dims.n_constr
    nb_blk = B // sk.BI
    HI = jax.lax.Precision.HIGHEST

    ng_stages = tuple(n for n in range(Np1) if dims.ng[n] > 0)
    n_ng = len(ng_stages)
    NGF = n_ng * NG

    # ---- shared scaffolding (one copy for hard and soft engines) --------
    cm = make_lanes_common(dims, qp, cfg, z0=z0, pi0=pi0)
    to_lanes3, from_lanes3 = cm.to_lanes3, cm.from_lanes3
    sc_l, sc_B, cat2, min_ratio = cm.sc_l, cm.sc_B, cm.cat2, cm.min_ratio
    gate, bcast5, stat_update = cm.gate, cm.bcast5, cm.stat_update
    idxT = cm.idxT
    mbL, dcatL, gL, pdregL, bL = cm.mbL, cm.dcatL, cm.gL, cm.pdregL, cm.bL
    Hl, Fl = cm.Hl, cm.Fl
    zmaskL = to_lanes3(qp.z_mask)
    xmaskL = to_lanes3(qp.x_mask[:, 1:])

    # general constraints (tiny flat XLA streams, as in ipm_fast)
    ngh = make_ng_lanes(dims, qp, ng_stages, dt, B)
    mgF, dg_cat, mg2, sgn_g = ngh.mgF, ngh.dg_cat, ngh.mg2, ngh.sgn_g
    cz_of, ct_add_lanes, fold_g, ngl_of = (
        ngh.cz_of, ngh.ct_add_lanes, ngh.fold_g, ngh.ngl_of
    )
    ngl0 = ngh.ngl0

    mu_scal = jnp.asarray(1.0 / n_constr, dt)
    mu_tol = jnp.asarray(cfg.mu_tol, dt)
    mu_tol_low = jnp.asarray(max(cfg.mu_tol, cfg.mu_switch), dt)
    alpha_min = jnp.asarray(cfg.alpha_min, dt)
    k_max = cfg.k_max
    mu0 = jnp.asarray(cfg.mu0, dt)

    fused = _ipm_fast_knob()
    iter_ref = int(getattr(cfg, "iter_ref", 0))
    ref_thr = float(getattr(cfg, "iter_ref_mu_thr", 0.0))

    def kkt_factor_solve(dvecL, ngl, geffL, rhsL):
        if fused:
            return sk.factor_solve_folded_flat_fused(
                Hl, dvecL, ngl, ng_stages, geffL, Fl, rhsL,
                NU, NZ, NX, lanes_io=True,
            )
        return sk.factor_solve_folded_flat(
            Hl, dvecL, ngl, ng_stages, geffL, Fl, rhsL,
            NU, NZ, NX, want_pi=False, lanes_io=True,
        )

    def kkt_resolve(fstate, geffL, rhsL):
        Ll_l, Lxx_l, Pb_l = fstate[:3]
        fn = sk.solve_flat_fused if fused else sk.solve_flat
        return fn(Ll_l, Lxx_l, Pb_l, geffL, Fl, rhsL, NU, NZ, NX,
                  lanes_io=True)

    # fused refinement pass (resid + trs + fwd + update in ONE
    # pallas_call; rq/rb/dz/dpi never exist in HBM) — the stage-2
    # throughput lever; =0 A/Bs the 3-kernel composite
    fused_refine = os.environ.get("HPMPC_FUSED_REFINE", "1") == "1"
    ClR = ngh.Cl_lanes if n_ng else None

    def newton_refine_lanes(Ll_l, Lxx_l, dvecL, Qx_g, geffL, rhsL,
                            zc, pic, do_ref):
        """Lanes twin of :func:`.ipm_fast.newton_refine` (reference
        ITER_REF, ``d_ip2_res_hard.c:48,1086-1163``): full-precision
        residuals of the CURRENT effective Newton system, assembled from
        the lanes matvec kernel plus pure elementwise lanes ops — the
        stage-coupling terms (pi fold, x shift) are contiguous slice-adds
        in this layout, where the flat engine pays selection matmuls —
        then a correction re-solve with the retained lanes factor (Pb
        recomputed in-kernel).  With ``HPMPC_FUSED_REFINE=1`` (default)
        the whole pass is ONE pallas_call (``sk.refine_flat_fused``).

        ``do_ref`` (scalar bool): mu-gated refinement, one lax.cond over
        the whole pass, exactly as in the flat engine."""
        qxgl = (sk._to_lanes_flat(Qx_g, B, (n_ng, NG))
                if (n_ng and fused_refine) else None)

        def refine(zp):
            z, pi = zp
            for _ in range(iter_ref):
                if fused_refine:
                    z, pi = sk.refine_flat_fused(
                        Hl, dvecL, ClR, qxgl, ng_stages, geffL, Fl,
                        rhsL, z, pi, Ll_l, Lxx_l, NU, NZ, NX)
                    continue
                hz_l, fz_l, fpi_l = sk.resid_terms_flat(
                    Hl, Fl, z, pi, NZ, NX, lanes_io=True)
                rq = geffL + hz_l + dvecL * z
                if n_ng:
                    rq = ct_add_lanes(rq, Qx_g * mgF * cz_of(z))
                rq = rq.at[:, :N].add(fpi_l[:, :N])
                rq = rq.at[:, 1:, NU:NU + NX].add(-pi)
                rb = rhsL + fz_l[:, :N] - z[:, 1:, NU:NU + NX]
                dz, dpi = sk.solve_flat_pb(
                    Ll_l, Lxx_l, rq, Fl, rb, NU, NZ, NX, lanes_io=True)
                z = z + dz
                pi = pi + dpi
            return z, pi

        if do_ref is None:
            return refine((zc, pic))
        return lax.cond(do_ref, refine, lambda zp: zp, (zc, pic))

    gate_res = gate  # generic over NamedTuples

    # mega folds prep/corr + sweep + alpha into one pallas_call per half
    # iteration, but its forward phase is pi-less and the effective
    # gradient/diagonal never exist in HBM — refinement needs both, so
    # iter_ref>0 runs the 6-kernel sequence (the refinement re-solves
    # dominate the half cost there anyway).
    mega = _mega_sweeps() and iter_ref == 0
    if mega:
        from ..ops import mega_kernel as mk

    def affine_half(lamL, tL, A_L, M_L, baseL, rhsL, qx_g, Qx_g, ngl,
                    phase2, do_ref=None):
        """prep + factor + affine solve + affine alpha/sums: ONE
        mega pallas_call when HPMPC_MEGA_SWEEPS=1, else the 3-kernel
        sequence.  Returns (dzL, fstate, aff) with aff's last four
        entries the per-stage alpha/sum partials."""
        if mega:
            ngaddl = ngh.ct_lanes_stream(qx_g) if n_ng else ngh.ngadd0
            z_l, fstate, dt_l, dl_l, amin, s0, s1, s2 = (
                mk.factor_solve_mega(
                    idxT, lamL, tL, A_L, M_L, mbL, baseL, pdregL, Hl,
                    ngl, ngaddl, ng_stages, Fl, rhsL,
                    NB=NB, NU=NU, NZ=NZ, NX=NX, phase2=phase2,
                )
            )
            return z_l, fstate, (dt_l, dl_l, amin, s0, s1, s2)
        dvecL, geffL = stk.prep_flat(
            idxT, lamL, tL, A_L, M_L, mbL, baseL, pdregL,
            NB=NB, NZ=NZ, phase2=phase2,
        )
        if n_ng:
            geffL = ct_add_lanes(geffL, qx_g)
        if iter_ref:
            dzL, dpiL, fstate3 = sk.factor_solve_folded_flat(
                Hl, dvecL, ngl, ng_stages, geffL, Fl, rhsL,
                NU, NZ, NX, want_pi=True, lanes_io=True,
            )
            dzL, dpiL = newton_refine_lanes(
                fstate3[0], fstate3[1], dvecL, Qx_g, geffL, rhsL,
                dzL, dpiL, do_ref,
            )
            fstate = fstate3 + (dvecL, Qx_g)
        else:
            dzL, _, fstate = kkt_factor_solve(dvecL, ngl, geffL, rhsL)
        aff = stk.alpha_sums_flat(
            idxT, dzL, lamL, tL, A_L, M_L, None, mbL,
            NB=NB, NZ=NZ, phase2=phase2,
        )
        return dzL, fstate, aff

    def corr_half(lamL, tL, A_L, M_L, fstate, aff, smL, baseL, rhsL,
                  qx_g2, phase2, do_ref=None):
        """corrector gradient + resolve + corrector alpha/sums (one
        mega pallas_call or the 3-kernel sequence).  Returns
        (dz2L, dpi2L, corr)."""
        if mega:
            ngadd2 = ngh.ct_lanes_stream(qx_g2) if n_ng else ngh.ngadd0
            outs = mk.solve_mega(
                idxT, fstate, lamL, tL, A_L, M_L, mbL, aff[0], aff[1],
                smL, baseL, ngadd2, ng_stages, Fl, rhsL,
                NB=NB, NU=NU, NZ=NZ, NX=NX, phase2=phase2,
            )
            z2_l, pi2_l = outs[0], outs[1]
            return z2_l, pi2_l, outs[2:]
        geff2L, coL = stk.corr_geff_flat(
            idxT, lamL, tL, A_L, M_L, aff[0], aff[1], smL, baseL, mbL,
            NB=NB, NZ=NZ, phase2=phase2,
        )
        if n_ng:
            geff2L = ct_add_lanes(geff2L, qx_g2)
        dz2L, dpi2L = kkt_resolve(fstate, geff2L, rhsL)
        if iter_ref:
            Ll_l, Lxx_l, _, dvecL, Qx_g = fstate
            dz2L, dpi2L = newton_refine_lanes(
                Ll_l, Lxx_l, dvecL, Qx_g, geff2L, rhsL,
                dz2L, dpi2L, do_ref,
            )
        corr = stk.alpha_sums_flat(
            idxT, dz2L, lamL, tL, A_L,
            coL if phase2 else None,
            coL if not phase2 else None, mbL,
            NB=NB, NZ=NZ, phase2=phase2,
        )
        return dz2L, dpi2L, corr

    # ---- init (exact reference branching; ipm.init_vars twin, in cm) -----
    lam_g0, t_g0 = cm.ng_init(ngh)

    s0_state = _LState(
        zL=cm.zL0,
        piL=(cm.piL0 if cm.piL0 is not None
             else jnp.zeros((nb_blk, N, NX, sk.SUBS, sk.LANES), dt)),
        lamL=cm.lamL0, tL=cm.tL0,
        lam_g=lam_g0, t_g=t_g0,
        mu=jnp.full((B,), mu0, dt),
        alpha=jnp.ones((B,), dt),
        kk=jnp.zeros((B,), jnp.int32),
        stat=jnp.zeros((5, k_max, B), dt),
        lam_ref=jnp.full((B,), jnp.inf, dt),
    )
    if state0 is not None:
        # hot continuation (ipm_fast state0 twin): seed the FULL
        # primal-dual state from a prior stage's IPMSolution
        # (structured -> lanes), with kk and the stat trace carried so
        # iteration budgets and per-iteration rows stay exact across the
        # two-stage handoff (parallel.batch.solve_batched dispatch).
        lam_st = jnp.concatenate(
            [state0.lam_b[:, :, 0].astype(dt),
             state0.lam_b[:, :, 1].astype(dt)], -1)
        t_st = jnp.concatenate(
            [state0.t_b[:, :, 0].astype(dt),
             state0.t_b[:, :, 1].astype(dt)], -1)
        t_st = jnp.where(cm.mb_st > 0, t_st, 1.0)
        lam_st = jnp.where(cm.mb_st > 0, lam_st, 0.0)
        if n_ng:
            def _gcat(a, side):
                return jnp.concatenate(
                    [a[:, n, side].astype(dt) for n in ng_stages], 1)

            lam_g0c = jnp.concatenate(
                [_gcat(state0.lam_g, 0), _gcat(state0.lam_g, 1)], 1)
            t_g0c = jnp.concatenate(
                [_gcat(state0.t_g, 0), _gcat(state0.t_g, 1)], 1)
            t_g0c = jnp.where(mg2 > 0, t_g0c, 1.0)
            lam_g0c = jnp.where(mg2 > 0, lam_g0c, 0.0)
        else:
            lam_g0c = jnp.zeros((B, 0), dt)
            t_g0c = jnp.ones((B, 0), dt)
        lamL_c = to_lanes3(lam_st)
        tL_c = to_lanes3(t_st)
        mu_c = sc_B(jnp.sum(lamL_c * tL_c * mbL, axis=(1, 2)))
        if n_ng:
            mu_c = mu_c + jnp.sum(lam_g0c * t_g0c * mg2, axis=1)
        mu_c = mu_c * mu_scal
        s0_state = _LState(
            zL=to_lanes3(state0.z.astype(dt) * qp.z_mask),
            piL=to_lanes3(state0.pi.astype(dt) * qp.x_mask[:, 1:]),
            lamL=lamL_c, tL=tL_c, lam_g=lam_g0c, t_g=t_g0c,
            mu=mu_c,
            alpha=jnp.ones((B,), dt),
            kk=state0.kk.astype(jnp.int32),
            stat=jnp.transpose(state0.stat.astype(dt), (2, 1, 0)),
            lam_ref=jnp.full((B,), jnp.inf, dt),
        )

    def finish_alpha_sums(outs, lam_g, t_g, dtg, dlg):
        return cm.finish_alpha_sums(outs, ngh, lam_g, t_g, dtg, dlg)

    # ---- phase 1 (delta formulation) -------------------------------------

    def _lam_inst_max(lamL_, lam_g_):
        """Per-instance max |dual| (step_ok dual-explosion guard):
        lanes-layout box duals + flat general duals."""
        m = sc_B(jnp.max(jnp.abs(lamL_), axis=(1, 2)))
        if lam_g_.shape[1]:
            m = jnp.maximum(m, jnp.max(jnp.abs(lam_g_), axis=1))
        return m

    def phase1_body(s):
        if n_ng:
            t_inv_g = jnp.where(mg2 > 0, 1.0 / s.t_g, 0.0)
            lamt_g = s.lam_g * t_inv_g
            Qx_g = fold_g(lamt_g) * mgF
            qx_g = fold_g(-sgn_g * s.lam_g - lamt_g * dg_cat) * mgF
            ngl = ngl_of(Qx_g)
        else:
            t_inv_g = lamt_g = jnp.zeros((B, 0), dt)
            ngl = ngl0

        do_ref = (jnp.min(s.mu) < ref_thr) if ref_thr > 0 else None
        qx_g_cur = qx_g if n_ng else None
        Qx_g_cur = Qx_g if n_ng else None
        dzL, fstate, aff = affine_half(
            s.lamL, s.tL, dcatL, None, gL, bL, qx_g_cur, Qx_g_cur, ngl,
            False, do_ref=do_ref,
        )
        if n_ng:
            czn = cz_of(dzL)
            dtg = (sgn_g * (cat2(czn) - dg_cat) - s.t_g) * mg2
            dlg = (-lamt_g * dtg - s.lam_g) * mg2
        else:
            dtg = dlg = jnp.zeros((B, 0), dt)
        alpha_aff, a0, a1, a2c = finish_alpha_sums(
            aff, s.lam_g, s.t_g, dtg, dlg
        )
        a = 0.995 * alpha_aff
        mu_aff = (a0 + a * a1 + a * a * a2c) * mu_scal
        sigma = (mu_aff / s.mu) ** 3
        sm = sigma * s.mu

        if n_ng:
            dl2g = t_inv_g * (sm[:, None] - dlg * dtg) * mg2
            qx_g2 = qx_g + fold_g(-sgn_g * dl2g) * mgF
        else:
            qx_g2 = None
        dz2L, dpi2L, corr = corr_half(
            s.lamL, s.tL, dcatL, None, fstate, aff, sc_l(sm)[:, None],
            gL, bL, qx_g2, False, do_ref=do_ref,
        )
        if n_ng:
            czn2 = cz_of(dz2L)
            dtg2 = (sgn_g * (cat2(czn2) - dg_cat) - s.t_g) * mg2
            dlg2 = (dl2g - lamt_g * dtg2 - s.lam_g) * mg2
        else:
            dtg2 = dlg2 = jnp.zeros((B, 0), dt)
        alpha2, b0, b1, b2 = finish_alpha_sums(
            corr, s.lam_g, s.t_g, dtg2, dlg2
        )
        a2 = 0.995 * alpha2
        mu_new = (b0 + a2 * b1 + a2 * a2 * b2) * mu_scal

        a2z = bcast5(a2, s.zL)
        z_new = s.zL + a2z * (dz2L - s.zL)
        pi_new = s.piL + bcast5(a2, s.piL) * (dpi2L - s.piL)
        lam_n = s.lamL + bcast5(a2, s.lamL) * corr[1]
        t_n = s.tL + bcast5(a2, s.tL) * corr[0]
        lam_g_n = s.lam_g + a2[:, None] * dlg2
        t_g_n = s.t_g + a2[:, None] * dtg2

        row = jnp.stack([sigma, alpha_aff, mu_aff, alpha2, mu_new])
        lmx_new = _lam_inst_max(lam_n, lam_g_n)
        s_new = _LState(
            zL=z_new, piL=pi_new, lamL=lam_n, tL=t_n,
            lam_g=lam_g_n, t_g=t_g_n,
            mu=mu_new, alpha=alpha2 * 0.995, kk=s.kk + 1,
            stat=stat_update(s.stat, s.kk, row),
            lam_ref=_ipm.anchor_lam_ref(s.lam_ref, s.mu, mu_new, lmx_new),
        )
        ok = _ipm.step_ok(mu_new, s.mu, lmx_new,
                          _lam_inst_max(s.lamL, s.lam_g),
                          lam_ref=s.lam_ref)
        return gate(ok, s_new, s._replace(alpha=jnp.zeros_like(s.alpha)))

    def phase1_pred_b(s):
        return (s.kk < k_max) & (s.mu > mu_tol_low) & (s.alpha >= alpha_min)

    def gated1(s):
        return gate(phase1_pred_b(s), phase1_body(s), s)

    s1 = lax.while_loop(lambda s: jnp.any(phase1_pred_b(s)), gated1, s0_state)

    # ---- residuals (S6 + tiny ng XLA) ------------------------------------
    def residuals(zL, piL, lamL, tL, lam_g, t_g):
        rqL, rbL, rdL, rmL, musumL = stk.resid_full_flat(
            idxT, Hl, Fl, zL, piL, gL, bL, lamL, tL, dcatL, mbL,
            zmaskL, xmaskL, NB=NB, NU=NU, NZ=NZ, NX=NX,
        )
        rbL = rbL[:, :N]
        mu = sc_B(jnp.sum(musumL, axis=1))
        if n_ng:
            rqL = ct_add_lanes(rqL, fold_g(-sgn_g * lam_g) * mgF)
            czn = cz_of(zL)
            rd_g = (dg_cat - cat2(czn) + sgn_g * t_g) * mg2
            rm_g = lam_g * t_g * mg2
            mu = mu + jnp.sum(rm_g, axis=1)
        else:
            rd_g = rm_g = jnp.zeros((B, 0), dt)
        return _LRes(rqL, rbL, rdL, rmL, rd_g, rm_g, mu * mu_scal)

    res1 = residuals(s1.zL, s1.piL, s1.lamL, s1.tL, s1.lam_g, s1.t_g)
    s1 = s1._replace(mu=res1.mu)

    # ---- phase 2 (full-residual formulation) ------------------------------
    def phase2_body(carry):
        s, res = carry
        if n_ng:
            t_inv_g = jnp.where(mg2 > 0, 1.0 / s.t_g, 0.0)
            lamt_g = s.lam_g * t_inv_g
            Qx_g = fold_g(lamt_g) * mgF
            ngl = ngl_of(Qx_g)

            def qxg_from(rm_g):
                return fold_g(
                    sgn_g * t_inv_g * rm_g - lamt_g * res.rd_g
                ) * mgF

            qx_g = qxg_from(res.rm_g)
        else:
            t_inv_g = lamt_g = jnp.zeros((B, 0), dt)
            ngl = ngl0

        do_ref = (jnp.min(s.mu) < ref_thr) if ref_thr > 0 else None
        qx_g_cur = qx_g if n_ng else None
        Qx_g_cur = Qx_g if n_ng else None
        dzL, fstate, aff = affine_half(
            s.lamL, s.tL, res.rdL, res.rmL, res.rqL, res.rbL,
            qx_g_cur, Qx_g_cur, ngl, True, do_ref=do_ref,
        )
        if n_ng:
            cdz = cz_of(dzL)
            dtg = sgn_g * (cat2(cdz) - res.rd_g) * mg2
            dlg = -t_inv_g * (s.lam_g * dtg + res.rm_g) * mg2
        else:
            dtg = dlg = jnp.zeros((B, 0), dt)
        alpha_aff, a0, a1, a2c = finish_alpha_sums(
            aff, s.lam_g, s.t_g, dtg, dlg
        )
        a = 0.995 * alpha_aff
        mu_aff = (a0 + a * a1 + a * a * a2c) * mu_scal
        sigma = (mu_aff / s.mu) ** 3
        sm = sigma * s.mu

        if n_ng:
            rm_g2 = res.rm_g + (dtg * dlg - sm[:, None]) * mg2
            qx_g2 = qxg_from(rm_g2)
        else:
            qx_g2 = None
        dz2L, dpi2L, corr = corr_half(
            s.lamL, s.tL, res.rdL, res.rmL, fstate, aff,
            sc_l(sm)[:, None], res.rqL, res.rbL, qx_g2, True,
            do_ref=do_ref,
        )
        if n_ng:
            cdz2 = cz_of(dz2L)
            dtg2 = sgn_g * (cat2(cdz2) - res.rd_g) * mg2
            dlg2 = -t_inv_g * (s.lam_g * dtg2 + rm_g2) * mg2
        else:
            dtg2 = dlg2 = jnp.zeros((B, 0), dt)
        alpha2, _, _, _ = finish_alpha_sums(
            corr, s.lam_g, s.t_g, dtg2, dlg2
        )
        a2 = 0.995 * alpha2

        z_new = s.zL + bcast5(a2, s.zL) * dz2L
        pi_new = s.piL + bcast5(a2, s.piL) * dpi2L
        lam_n = s.lamL + bcast5(a2, s.lamL) * corr[1]
        t_n = s.tL + bcast5(a2, s.tL) * corr[0]
        lam_g_n = s.lam_g + a2[:, None] * dlg2
        t_g_n = s.t_g + a2[:, None] * dtg2

        res_new = residuals(z_new, pi_new, lam_n, t_n, lam_g_n, t_g_n)
        mu_new = res_new.mu
        row = jnp.stack([sigma, alpha_aff, mu_aff, alpha2, mu_new])
        lmx_new = _lam_inst_max(lam_n, lam_g_n)
        s_new = _LState(
            zL=z_new, piL=pi_new, lamL=lam_n, tL=t_n,
            lam_g=lam_g_n, t_g=t_g_n,
            mu=mu_new, alpha=alpha2 * 0.995, kk=s.kk + 1,
            stat=stat_update(s.stat, s.kk, row),
            lam_ref=_ipm.anchor_lam_ref(s.lam_ref, s.mu, mu_new, lmx_new),
        )
        ok = _ipm.step_ok(mu_new, s.mu, lmx_new,
                          _lam_inst_max(s.lamL, s.lam_g),
                          lam_ref=s.lam_ref)
        s_new = gate(ok, s_new, s._replace(alpha=jnp.zeros_like(s.alpha)))
        res_new = gate_res(ok, res_new, res)
        return (s_new, res_new)

    def phase2_pred_b(carry):
        s, _ = carry
        return (s.kk < k_max) & (s.mu > mu_tol) & (s.alpha >= alpha_min)

    def gated2(c):
        s_new, r_new = phase2_body(c)
        m = phase2_pred_b(c)
        return (gate(m, s_new, c[0]), gate_res(m, r_new, c[1]))

    s2, res_f = lax.while_loop(
        lambda c: jnp.any(phase2_pred_b(c)), gated2, (s1, res1)
    )

    status = jnp.where(
        s2.mu <= mu_tol, 0, jnp.where(s2.kk >= k_max, 1, 2)
    ).astype(jnp.int32)

    def absmax_l(y):
        return sc_B(jnp.max(jnp.abs(y), axis=tuple(range(1, y.ndim - 2))))

    def absmax_f(x):
        if x.shape[1] == 0:
            return jnp.zeros((B,), dt)
        return jnp.max(jnp.abs(x), axis=1)

    inf_norm_res = jnp.stack([
        absmax_l(res_f.rqL),
        absmax_l(res_f.rbL),
        jnp.maximum(absmax_l(res_f.rdL), absmax_f(res_f.rd_g)),
        res_f.mu,
    ], axis=1)

    # ---- structured outputs (IPMSolution contract) ------------------------
    z = from_lanes3(s2.zL)
    pi = from_lanes3(s2.piL)
    lam_b_s = from_lanes3(s2.lamL).reshape(B, Np1, 2, NB)
    t_b_s = from_lanes3(s2.tL).reshape(B, Np1, 2, NB)
    lam_g_s = jnp.zeros((B, Np1, 2, NG), dt)
    t_g_s = jnp.ones((B, Np1, 2, NG), dt)
    for k, n in enumerate(ng_stages):
        sl = slice(k * NG, (k + 1) * NG)
        lam_g_s = lam_g_s.at[:, n, 0].set(s2.lam_g[:, sl])
        lam_g_s = lam_g_s.at[:, n, 1].set(s2.lam_g[:, NGF:][:, sl])
        t_g_s = t_g_s.at[:, n, 0].set(s2.t_g[:, sl])
        t_g_s = t_g_s.at[:, n, 1].set(s2.t_g[:, NGF:][:, sl])

    return _ipm.IPMSolution(
        z=z, pi=pi,
        lam_b=lam_b_s, t_b=t_b_s, lam_g=lam_g_s, t_g=t_g_s,
        kk=s2.kk, status=status,
        stat=jnp.transpose(s2.stat, (2, 1, 0)),
        inf_norm_res=inf_norm_res,
    )
