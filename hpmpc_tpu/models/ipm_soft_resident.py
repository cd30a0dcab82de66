"""Solver-resident batched SOFT IPM (the 4th-generation engine for the
soft-constraint family).

Wraps :func:`..ops.resident_kernel.ipm_resident` with ``NS > 0`` — the
ENTIRE soft Mehrotra loop of ``d_ip2_mpc_soft_tv``
(``mpc_solvers/d_ip2_soft.c:83``) in ONE pallas_call: the soft-slack
Schur elimination, the 4-slack corrector gradient and alpha/mu
contributions (helper cores shared with :mod:`..ops.step_kernel`'s
``soft_*`` kernels) run in-kernel per stage, every piece of loop state
VMEM-resident across iterations.

Unlike the hard resident engine there is NO semantics caveat: the soft
reference solver is single-phase (no residual mode), so this engine's
contract is exactly the soft engine ladder's for any ``iter_ref == 0``
config.  Iterate-parity with the soft lanes engine is asserted by
tests/test_soft_resident.py (interpret) and
tools/check_resident_tpu.py --soft (real Mosaic).

Dispatched from :func:`hpmpc_tpu.parallel.batch.solve_batched_soft`
(``HPMPC_RESIDENT`` knob, default ON where it fits).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ocp import OCPDims, OCPQP
from . import ipm_soft as _soft


def solve_batched_soft_resident(
    dims: OCPDims, qp: OCPQP, soft, cfg, idxbs_static,
    exact_mehrotra_soft: bool = True,
) -> _soft.SoftSolution:
    """Batch-level soft-resident solve (same contract as
    :func:`.ipm_soft_fast.solve_batched_flat`)."""
    with jax.default_matmul_precision("float32"):
        return _impl(dims, qp, soft, cfg, idxbs_static,
                     exact_mehrotra_soft)


def _impl(dims, qp, soft, cfg, idxbs_static, exact):
    from ..ops import resident_kernel as rk
    from ..ops import stage_kernel as sk
    from .ipm_lanes import make_lanes_common, make_ng_lanes

    dt = qp.dtype
    N, NU, NX, NZ, NB, NG = (dims.N, dims.NU, dims.NX, dims.NZ,
                             dims.NB, dims.NG)
    Np1 = N + 1
    B = qp.b.shape[0]
    assert B % sk.BI == 0, "resident path requires batch % 1024 == 0"
    assert NB > 0 and dims.idxb is not None
    assert dt == jnp.float32, "resident engine is f32-only"
    assert int(getattr(cfg, "iter_ref", 0)) == 0
    NS = soft.ns_mask.shape[-1]
    assert NS > 0
    ng_stages = tuple(n for n in range(Np1) if dims.ng[n] > 0)
    n_ng = len(ng_stages)

    cm = make_lanes_common(dims, qp, cfg)
    nb_blk = cm.nb_blk
    pi0l = jnp.zeros((nb_blk, N, NX, sk.SUBS, sk.LANES), dt)

    idxS = jnp.asarray(
        np.asarray(idxbs_static, np.int32).reshape(Np1, NS))

    ms1 = soft.ns_mask                                   # (B, Np1, NS)
    ms4_st = jnp.concatenate([ms1] * 4, -1)
    softcL = cm.to_lanes3(jnp.concatenate([
        soft.d_lbs, soft.d_ubs,
        soft.Z[:, :, 0], soft.Z[:, :, 1],
        soft.z_lin[:, :, 0], soft.z_lin[:, :, 1],
    ], -1))
    msL = cm.to_lanes3(ms1)
    t_s0 = jnp.ones((B, Np1, 4 * NS), dt)
    lam_s0 = jnp.where(ms4_st > 0, jnp.asarray(cfg.mu0, dt), 0.0)

    # per-instance duality scaling (2 nb + 2 ng + 4 ns slack products)
    n_hard = 2 * sum(dims.nb) + 2 * sum(dims.ng)
    mu_scal_vec = 1.0 / (
        n_hard + 4.0 * jnp.sum(ms1.reshape(B, -1), axis=1))
    muscL = cm.sc_l(mu_scal_vec.astype(dt))[:, None]

    ngh = make_ng_lanes(dims, qp, ng_stages, dt, B)
    ng_kw = {}
    if n_ng:
        NGF = n_ng * NG

        def g_lanes(flat):
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
        mu_scal=0.0,  # unused when NS > 0 (muscL carries it per lane)
        mu_tol=float(cfg.mu_tol),
        alpha_min=float(cfg.alpha_min), mu0=float(cfg.mu0),
        NS=NS, exact=bool(exact), idxs_tab=idxS,
        lams0=cm.to_lanes3(lam_s0), ts0=cm.to_lanes3(t_s0),
        softc=softcL, msk=msL, musc=muscL,
        **ng_kw,
    )
    pos = 8 + (2 if n_ng else 0)
    z_l, pi_l, lam_l, t_l, mu_t, kk_t, frz_t, stat_l = outs[:8]
    if n_ng:
        lamg_l, tg_l = outs[8:10]
    lams_l, ts_l = outs[pos:pos + 2]

    mu = mu_t.reshape(B)
    kk = kk_t.reshape(B).astype(jnp.int32)
    frozen = frz_t.reshape(B) > 0.0
    status = jnp.where(
        frozen, 2, jnp.where(mu <= float(cfg.mu_tol), 0, 1)
    ).astype(jnp.int32)

    lam_b_s = cm.from_lanes3(lam_l).reshape(B, Np1, 2, NB)
    t_b_s = cm.from_lanes3(t_l).reshape(B, Np1, 2, NB)
    lam_s_s = cm.from_lanes3(lams_l).reshape(B, Np1, 4, NS)
    t_s_s = cm.from_lanes3(ts_l).reshape(B, Np1, 4, NS)
    stat = jnp.transpose(stat_l, (0, 3, 4, 1, 2)).reshape(
        B, int(cfg.k_max), 5)

    lam_g_s = jnp.zeros((B, Np1, 2, NG), dt)
    t_g_s = jnp.ones((B, Np1, 2, NG), dt)
    if n_ng:
        g3 = cm.from_lanes3(lamg_l)
        g3t = cm.from_lanes3(tg_l)
        for j, n in enumerate(ng_stages):
            lam_g_s = lam_g_s.at[:, n, 0].set(g3[:, j, :NG])
            lam_g_s = lam_g_s.at[:, n, 1].set(g3[:, j, NG:])
            t_g_s = t_g_s.at[:, n, 0].set(g3t[:, j, :NG])
            t_g_s = t_g_s.at[:, n, 1].set(g3t[:, j, NG:])

    return _soft.SoftSolution(
        z=cm.from_lanes3(z_l),
        pi=cm.from_lanes3(pi_l),
        lam_b=lam_b_s, t_b=t_b_s, lam_g=lam_g_s, t_g=t_g_s,
        lam_s=lam_s_s, t_s=t_s_s,
        kk=kk, status=status, stat=stat,
    )
