"""Solver-resident Pallas kernel: the ENTIRE box-constrained IPM in ONE
pallas_call (4th engine generation; latency mode).

The mega kernels (:mod:`.mega_kernel`) fold each half-iteration into one
pallas_call but still cross HBM + XLA glue twice per iteration (state
streams out, alpha reductions and sigma in XLA, state streams back in).
For a single deployment-latency solve (``parallel.batch.solve_single``)
those crossings dominate.  Here the WHOLE phase-1 Mehrotra loop runs
inside one kernel:

  * grid ``(nb, k_max + 1, 4 * (N+1))``: minor axis sweeps the four
    phases of one iteration (affine backward, affine forward, corrector
    backward, corrector forward), middle axis the iterations (+1
    epilogue), sequential on TPU;
  * ALL loop state (iterate z, multipliers/slacks lam/t, pi, the split
    Riccati factor, direction streams) lives in VMEM scratch slabs for
    the whole call — per-iteration HBM traffic is zero;
  * the fraction-to-boundary / duality-sum reductions are PER-LANE
    (instances live in the 8x128 tile lanes), so alpha, mu_aff, sigma
    and the state-update step length are computed in-kernel with
    elementwise VPU ops — no cross-lane work, no XLA glue;
  * the state update z += a2 (dz2 - z) needs the corrector alpha, known
    only after the last forward step — it is left PENDING and applied
    stage-by-stage at the start of the NEXT iteration's affine backward
    sweep (which touches every stage anyway); a final epilogue
    iteration (it == k_max) applies the last pending update and the
    every-step output writes flush the final state.

Semantics: the reference's legacy no-residual solver (``d_ip2_hard.c``,
the ``mu_switch=0`` degeneracy of ``d_ip2_res_hard.c``) — pure phase-1
delta formulation to ``mu_tol``/``k_max``, per-lane NaN freeze
(status=2 analogue via the ``frozen`` output) and per-lane early-stop
(updates gate off once a lane converges; compute stops entirely once
the whole batch is done).  General constraints supported: the (static)
active stages' barrier fold, corrector rows and alpha contributions run
in-kernel from C tiles, value-masked by stage id.  Iterate-parity with
the lanes engine at ``mu_switch = mu_tol`` is asserted by
tests/test_resident.py.

Dispatched from :mod:`..models.ipm_resident` (knob ``HPMPC_RESIDENT``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stage_kernel import (
    LANES, SUBS, pcall, _cat_slab, _dinv_ll, _folded_bwd_core_fb,
    _root_x0, _pi_of_x, _sym_idx, _sym_nt, _trs_stage, _u_of_x,
    _x_next_of,
)
from .step_kernel import (
    _alpha_cands, _corr_co_qx, _dt_dlam, _qx_fold, _scatter_add_box,
    _t_inv_lamt,
)

_BIG = 3.0e38  # fraction-to-boundary "no blocking row" sentinel


def resident_vmem_bytes(NX: int, NU: int, NB: int, N: int) -> int:
    """VMEM footprint of the resident engine: ALL per-stage streams
    (inputs, loop state, factor, direction slabs) live simultaneously."""
    NZ = NX + NU
    NT = _sym_nt(NZ)
    NB2 = 2 * NB
    inputs = (N + 1) * (4 * NB2 + 3 * NZ + NT) + N * (NZ * NX + 2 * NX)
    scratch = ((N + 1) * (2 * NZ + 7 * NB2 + NZ * NU + NU + NX + NX * NX)
               + N * 3 * NX + 2 * NX * NX + 4 * NZ + 17)
    return (inputs + scratch) * 4 * SUBS * LANES


def resident_fits(NX: int, NU: int, NB: int, N: int) -> bool:
    from .stage_kernel import _vmem_cap

    return resident_vmem_bytes(NX, NU, NB, N) <= int(0.85 * _vmem_cap())


def resident_soft_vmem_bytes(NX: int, NU: int, NB: int, N: int,
                             NS: int) -> int:
    """Soft variant: hard footprint + per-stage soft streams (inputs
    lam_s0/t_s0/softc/ms = 15 NS; scratch slabs = 7 x 4 NS)."""
    return (resident_vmem_bytes(NX, NU, NB, N)
            + (N + 1) * (15 + 28) * NS * 4 * SUBS * LANES)


def resident_soft_fits(NX: int, NU: int, NB: int, N: int,
                       NS: int) -> bool:
    from .stage_kernel import _vmem_cap

    return resident_soft_vmem_bytes(NX, NU, NB, N, NS) <= int(
        0.85 * _vmem_cap())


def _row(ref, k):
    """(1, Np1, X, S, L) input block -> (X, S, L) array of stage k."""
    return ref[0, pl.ds(k, 1)][0]


def _slab_row(slab, k, count):
    """(Np1, count*S, L) scratch -> list of count (S, L) tiles."""
    r = slab[pl.ds(k, 1), :, :]
    return [r[0, i * SUBS : (i + 1) * SUBS, :] for i in range(count)]


def _gather_list(z_tiles, idx_ref, NB, row):
    """Gathered box values from a LIST of z tiles via the SMEM table.

    The table is static per stage only in content, not index — but the
    tile list is a Python list indexed by a TRACED table value, so we
    select with a where-chain over the NZ slots (NZ is small and this
    runs once per stage per phase)."""
    out = []
    for k in range(NB):
        j = idx_ref[row, k]
        acc = z_tiles[0]
        for cand in range(1, len(z_tiles)):
            acc = jnp.where(j == cand, z_tiles[cand], acc)
        out.append(acc)
    return jnp.concatenate([o[None] for o in out], axis=0)


def _gs_row(slab, j, count):
    """(n_ng, count*S, L) scratch, STATIC row j -> list of tiles."""
    return [slab[j, i * SUBS : (i + 1) * SUBS, :] for i in range(count)]


def _resident_kernel(NB, NU, NX, NZ, N, K, NG, ng_stage_ids, NS, exact,
                     mu_scal, mu_tol, alpha_min, mu0, *refs):
    NB2 = 2 * NB
    NG2 = 2 * NG
    NS4 = 4 * NS
    n_ng = len(ng_stage_ids)
    NT = _sym_nt(NZ)
    Np1 = N + 1
    it = pl.program_id(1)
    s4 = pl.program_id(2)
    phase = s4 // Np1
    s = s4 % Np1
    k = N - s  # stage for the backward phases

    n_in_ng = 5 if n_ng else 0
    n_in_s = 6 if NS else 0
    pos = 12 + n_in_ng + n_in_s
    (idx_ref, lam0_ref, t0_ref, z0_ref, pi0_ref, base_ref, pd_ref,
     H_ref, F_ref, b_ref, A_ref, mb_ref) = refs[:12]
    if n_ng:
        C_ref, dg_ref, mg_ref, lamg0_ref, tg0_ref = refs[12:17]
    if NS:
        (idxs_ref, lams0_ref, ts0_ref, softc_ref, ms_ref,
         musc_ref) = refs[12 + n_in_ng:12 + n_in_ng + 6]
    n_out = 8 + (2 if n_ng else 0) + (2 if NS else 0)
    (z_out, pi_out, lam_out, t_out, mu_out, kk_out, frz_out,
     stat_out) = refs[pos:pos + 8]
    if n_ng:
        lamg_out, tg_out = refs[pos + 8:pos + 10]
    if NS:
        lams_out, ts_out = refs[pos + 8 + (2 if n_ng else 0):
                                pos + 10 + (2 if n_ng else 0)]
    scr = refs[pos + n_out:]
    (zs, pis, lams, ts, dz2s, dpi2s, dt2s, dl2s, dtas, dlas, cos,
     lls, eus, pxs, lxxs, pbs,
     Lxx_c, px_c, x_c, ge_s,
     a2p_s, mu_s, sm_s, frz_s, kk_s, amin_s, s0_s, s1_s, s2_s,
     aa_s, muaff_s, sg_s, stat_c) = scr[:33]
    n_scr_ng = 7 if n_ng else 0
    if n_ng:
        (lamg_s, tg_s, dtag_s, dlag_s, cog_s, dt2g_s, dl2g_s) = scr[33:40]
    if NS:
        (lsofts, tsofts, dtass, dlass, dl2cs, dt2ss, dl2ss) = \
            scr[33 + n_scr_ng:40 + n_scr_ng]
    lamref_s = scr[33 + n_scr_ng + (7 if NS else 0)]

    dt = zs.dtype
    one = jnp.ones((SUBS, LANES), dt)
    zero = jnp.zeros((SUBS, LANES), dt)
    # soft path: mu scaling is per-instance (4 ns slacks per instance
    # enter the duality sum, d_ip2_soft.c:268-271) — a lanes tile input
    musc = musc_ref[0, 0] if NS else mu_scal

    def _soft_stage_schur(n):
        """Soft Schur dict + (lam_s, t_s, ms) stacks of stage n."""
        from .step_kernel import _soft_schur

        lam_s = jnp.concatenate(
            [v[None] for v in _slab_row(lsofts, n, NS4)], axis=0)
        t_s = jnp.concatenate(
            [v[None] for v in _slab_row(tsofts, n, NS4)], axis=0)
        ms = _row(ms_ref, n)
        c = _row(softc_ref, n)
        return _soft_schur(NS, lam_s, t_s, ms, c), lam_s, t_s, ms

    # ---- one-time init (first grid step) --------------------------------
    @pl.when((it == 0) & (s4 == 0))
    def _():
        for n in range(Np1):
            zs[pl.ds(n, 1), :, :] = _cat_slab(
                [_row(z0_ref, n)[i] for i in range(NZ)])
            lams[pl.ds(n, 1), :, :] = _cat_slab(
                [_row(lam0_ref, n)[i] for i in range(NB2)])
            ts[pl.ds(n, 1), :, :] = _cat_slab(
                [_row(t0_ref, n)[i] for i in range(NB2)])
            dz2s[pl.ds(n, 1), :, :] = jnp.zeros((1, NZ * SUBS, LANES), dt)
            dt2s[pl.ds(n, 1), :, :] = jnp.zeros((1, NB2 * SUBS, LANES), dt)
            dl2s[pl.ds(n, 1), :, :] = jnp.zeros((1, NB2 * SUBS, LANES), dt)
        for e in range(N):
            pis[pl.ds(e, 1), :, :] = _cat_slab(
                [_row(pi0_ref, e)[i] for i in range(NX)])
            dpi2s[pl.ds(e, 1), :, :] = jnp.zeros((1, NX * SUBS, LANES), dt)
        for j in range(n_ng):
            lamg_s[j, :, :] = jnp.concatenate(
                [lamg0_ref[0, j, i] for i in range(NG2)], axis=0)
            tg_s[j, :, :] = jnp.concatenate(
                [tg0_ref[0, j, i] for i in range(NG2)], axis=0)
            dt2g_s[j, :, :] = jnp.zeros((NG2 * SUBS, LANES), dt)
            dl2g_s[j, :, :] = jnp.zeros((NG2 * SUBS, LANES), dt)
        if NS:
            for n in range(Np1):
                lsofts[pl.ds(n, 1), :, :] = _cat_slab(
                    [_row(lams0_ref, n)[i] for i in range(NS4)])
                tsofts[pl.ds(n, 1), :, :] = _cat_slab(
                    [_row(ts0_ref, n)[i] for i in range(NS4)])
                dt2ss[pl.ds(n, 1), :, :] = jnp.zeros(
                    (1, NS4 * SUBS, LANES), dt)
                dl2ss[pl.ds(n, 1), :, :] = jnp.zeros(
                    (1, NS4 * SUBS, LANES), dt)
        a2p_s[...] = zero
        mu_s[...] = jnp.full((SUBS, LANES), mu0, dt)
        lamref_s[...] = jnp.full((SUBS, LANES), _BIG, dt)
        frz_s[...] = zero
        kk_s[...] = zero
        sm_s[...] = zero
        for r in range(5):
            stat_c[r] = zero

    live = (frz_s[...] == 0.0) & (mu_s[...] > mu_tol)
    # batch-liveness skip: once every lane is converged/frozen the
    # remaining grid steps do only the (cheap) state-update/output work —
    # a deployment tick at mu_tol > 0 stops paying for dead iterations
    alive = jnp.any(live)

    # ---- phase 0: apply pending update (stage k), prep + factor ---------
    @pl.when(phase == 0)
    def _():
        # NaN-SAFE pending update: a frozen iteration leaves a2p = 0
        # but its direction slabs may hold NaN (the breakdown that froze
        # it) — arithmetic masking (0 * NaN = NaN) would corrupt the
        # frozen state, so every update is a lane-select, exactly like
        # the engines' where-gating
        a2 = a2p_s[...]
        upd = a2 > 0.0
        z_old = _slab_row(zs, k, NZ)
        dz2 = _slab_row(dz2s, k, NZ)
        z_new = [jnp.where(upd, z_old[i] + a2 * (dz2[i] - z_old[i]),
                           z_old[i]) for i in range(NZ)]
        zs[pl.ds(k, 1), :, :] = _cat_slab(z_new)
        lam_old = _slab_row(lams, k, NB2)
        dl2 = _slab_row(dl2s, k, NB2)
        lam_new = [jnp.where(upd, lam_old[i] + a2 * dl2[i], lam_old[i])
                   for i in range(NB2)]
        lams[pl.ds(k, 1), :, :] = _cat_slab(lam_new)
        t_old = _slab_row(ts, k, NB2)
        dt2 = _slab_row(dt2s, k, NB2)
        t_new = [jnp.where(upd, t_old[i] + a2 * dt2[i], t_old[i])
                 for i in range(NB2)]
        ts[pl.ds(k, 1), :, :] = _cat_slab(t_new)
        if NS:
            ls_old = _slab_row(lsofts, k, NS4)
            dls2 = _slab_row(dl2ss, k, NS4)
            lsofts[pl.ds(k, 1), :, :] = _cat_slab(
                [jnp.where(upd, ls_old[i] + a2 * dls2[i], ls_old[i])
                 for i in range(NS4)])
            ts_old = _slab_row(tsofts, k, NS4)
            dts2 = _slab_row(dt2ss, k, NS4)
            tsofts[pl.ds(k, 1), :, :] = _cat_slab(
                [jnp.where(upd, ts_old[i] + a2 * dts2[i], ts_old[i])
                 for i in range(NS4)])

        @pl.when(k >= 1)
        def _():
            e = k - 1
            pi_old = _slab_row(pis, e, NX)
            dpi2 = _slab_row(dpi2s, e, NX)
            pis[pl.ds(e, 1), :, :] = _cat_slab(
                [jnp.where(upd, pi_old[i] + a2 * (dpi2[i] - pi_old[i]),
                           pi_old[i]) for i in range(NX)])

        # ng state rides the same pending update, once, at its stage
        for j, stg in enumerate(ng_stage_ids):
            @pl.when(k == stg)
            def _(j=j):
                lg = _gs_row(lamg_s, j, NG2)
                tg = _gs_row(tg_s, j, NG2)
                dlg = _gs_row(dl2g_s, j, NG2)
                dtg = _gs_row(dt2g_s, j, NG2)
                lamg_s[j, :, :] = jnp.concatenate(
                    [jnp.where(upd, lg[i] + a2 * dlg[i], lg[i])
                     for i in range(NG2)], axis=0)
                tg_s[j, :, :] = jnp.concatenate(
                    [jnp.where(upd, tg[i] + a2 * dtg[i], tg[i])
                     for i in range(NG2)], axis=0)

        # pending update consumed after the last stage (stage 0): a
        # liveness-skipped iteration must not re-apply it (the convex
        # z += a2 (dz2 - z) step is not idempotent)
        @pl.when(s == N)
        def _():
            a2p_s[...] = zero

        # epilogue major step: update only, no factor work
        @pl.when((it < K) & alive)
        def _():
            lam = jnp.concatenate([x[None] for x in lam_new], axis=0)
            tt = jnp.concatenate([x[None] for x in t_new], axis=0)
            A = _row(A_ref, k)
            mb = _row(mb_ref, k)
            Qx_f, qx_f = _qx_fold(NB, False, lam, tt, mb, A, None)
            ge_s[:] = _row(pd_ref, k)
            _scatter_add_box(ge_s, idx_ref, Qx_f, NB, k)
            if NS:
                from .step_kernel import _soft_qx

                S_s, _, _, ms_k = _soft_stage_schur(k)
                Qx_s, qx_s = _soft_qx(NS, ms_k, S_s)
                _scatter_add_box(ge_s, idxs_ref, Qx_s, NS, k)
            Hk = _row(H_ref, k)
            Hp = [Hk[t] for t in range(NT)]
            for i in range(NZ):
                di = _sym_idx(i, i)
                Hp[di] = Hp[di] + ge_s[i]
            ge_s[:] = _row(base_ref, k)
            _scatter_add_box(ge_s, idx_ref, qx_f, NB, k)
            if NS:
                _scatter_add_box(ge_s, idxs_ref, qx_s, NS, k)
            # general-constraint barrier: Hp += C' diag(Qxg) C and
            # ge += C' qxg on the (static) active stages, value-masked
            for j, stg in enumerate(ng_stage_ids):
                mtc = (k == stg)
                lamg = jnp.concatenate(
                    [v[None] for v in _gs_row(lamg_s, j, NG2)], axis=0)
                tgv = jnp.concatenate(
                    [v[None] for v in _gs_row(tg_s, j, NG2)], axis=0)
                mg = jnp.concatenate(
                    [mg_ref[0, j, i][None] for i in range(NG2)], axis=0)
                dg = jnp.concatenate(
                    [dg_ref[0, j, i][None] for i in range(NG2)], axis=0)
                Qxg, qxg = _qx_fold(NG, False, lamg, tgv, mg, dg, None)
                Cj = [[C_ref[0, j, g, i] for i in range(NZ)]
                      for g in range(NG)]
                for i in range(NZ):
                    for jj in range(i + 1):
                        acc = None
                        for g in range(NG):
                            tt_ = Cj[g][i] * Qxg[g] * Cj[g][jj]
                            acc = tt_ if acc is None else acc + tt_
                        ti = _sym_idx(i, jj)
                        Hp[ti] = Hp[ti] + jnp.where(mtc, acc, 0.0)
                for i in range(NZ):
                    acc = None
                    for g in range(NG):
                        tt_ = Cj[g][i] * qxg[g]
                        acc = tt_ if acc is None else acc + tt_
                    ge_s[i] = ge_s[i] + jnp.where(mtc, acc, 0.0)
            g = [ge_s[i] for i in range(NZ)]
            ke = jnp.minimum(k, N - 1)
            Fk = _row(F_ref, ke)
            F = [[Fk[i, j] for j in range(NX)] for i in range(NZ)]
            bk = _row(b_ref, ke)
            bb = [bk[i] for i in range(NX)]
            Lf, eu, px, Pb = _folded_bwd_core_fb(
                NU, NX, NZ, s, Hp, g, F, bb, Lxx_c, px_c)
            lls[pl.ds(k, 1), :, :] = _cat_slab(
                [Lf[i][j] for i in range(NZ) for j in range(NU)])
            lxxs[pl.ds(k, 1), :, :] = _cat_slab(
                [Lf[NU + i][NU + j] for i in range(NX) for j in range(NX)])
            eus[pl.ds(k, 1), :, :] = _cat_slab(eu)
            pxs[pl.ds(k, 1), :, :] = _cat_slab(px)
            pbs[pl.ds(jnp.minimum(k, N - 1), 1), :, :] = _cat_slab(Pb)

    # ---- phase 1: affine forward recovery + alpha/sum partials ----------
    @pl.when((phase == 1) & (it < K) & alive)
    def _():
        @pl.when(s == 0)
        def _():
            amin_s[...] = jnp.full((SUBS, LANES), _BIG, dt)
            s0_s[...] = zero
            s1_s[...] = zero
            s2_s[...] = zero
            Lxx0 = _slab_row(lxxs, 0, NX * NX)
            Lxx0m = [[Lxx0[i * NX + j] for j in range(NX)]
                     for i in range(NX)]
            px0 = _slab_row(pxs, 0, NX)
            x0 = _root_x0(Lxx0m, px0, NX)
            for i in range(NX):
                x_c[i] = x0[i]

        ll = _slab_row(lls, s, NZ * NU)
        Ll = [[ll[i * NU + j] for j in range(NU)] for i in range(NZ)]
        eu = _slab_row(eus, s, NU)
        Dinv_u = _dinv_ll(Ll, NU)
        x = [x_c[i] for i in range(NX)]
        u = _u_of_x(NU, NX, Ll, Dinv_u, eu, x)
        z_tiles = u + x

        se = jnp.minimum(s, N - 1)
        Fk = _row(F_ref, se)
        F = [[Fk[i, j] for j in range(NX)] for i in range(NZ)]
        bk = _row(b_ref, se)
        xn = _x_next_of(NU, NX, F, [bk[i] for i in range(NX)], u, x)
        for j in range(NX):
            x_c[j] = xn[j]

        zb = _gather_list(z_tiles, idx_ref, NB, s)
        lam = jnp.concatenate(
            [v[None] for v in _slab_row(lams, s, NB2)], axis=0)
        tt = jnp.concatenate(
            [v[None] for v in _slab_row(ts, s, NB2)], axis=0)
        A = _row(A_ref, s)
        mb = _row(mb_ref, s)
        dt_b, dl_b = _dt_dlam(NB, False, lam, tt, mb, A, None, zb, 0.0)
        dtas[pl.ds(s, 1), :, :] = _cat_slab(
            [dt_b[i] for i in range(NB2)])
        dlas[pl.ds(s, 1), :, :] = _cat_slab(
            [dl_b[i] for i in range(NB2)])
        cand = jnp.minimum(_alpha_cands(lam, dl_b, mb),
                           _alpha_cands(tt, dt_b, mb))
        amin_s[...] = jnp.minimum(amin_s[...], jnp.min(cand, axis=0))
        s0_s[...] = s0_s[...] + jnp.sum(lam * tt * mb, axis=0)
        s1_s[...] = s1_s[...] + jnp.sum(lam * dt_b + tt * dl_b, axis=0)
        s2_s[...] = s2_s[...] + jnp.sum(dl_b * dt_b, axis=0)

        if NS:
            from .step_kernel import _soft_dt_dls

            S_s, lam_s, t_s, ms_s = _soft_stage_schur(s)
            zsv = _gather_list(z_tiles, idxs_ref, NS, s) * ms_s
            dt_ss, dl_ss = _soft_dt_dls(
                NS, lam_s, t_s, ms_s, S_s, zsv, 0.0,
                S_s["zl0"], S_s["zl1"])
            dtass[pl.ds(s, 1), :, :] = _cat_slab(
                [dt_ss[i] for i in range(NS4)])
            dlass[pl.ds(s, 1), :, :] = _cat_slab(
                [dl_ss[i] for i in range(NS4)])
            ms4 = S_s["ms4"]
            cs = jnp.minimum(_alpha_cands(lam_s, dl_ss, ms4),
                             _alpha_cands(t_s, dt_ss, ms4))
            amin_s[...] = jnp.minimum(amin_s[...], jnp.min(cs, axis=0))
            s0_s[...] = s0_s[...] + jnp.sum(lam_s * t_s * ms4, axis=0)
            s1_s[...] = s1_s[...] + jnp.sum(
                lam_s * dt_ss + t_s * dl_ss, axis=0)
            s2_s[...] = s2_s[...] + jnp.sum(dl_ss * dt_ss, axis=0)

        # general-constraint rows at the (static) active stages
        for j, stg in enumerate(ng_stage_ids):
            mtc = (s == stg)
            lamg = jnp.concatenate(
                [v[None] for v in _gs_row(lamg_s, j, NG2)], axis=0)
            tgv = jnp.concatenate(
                [v[None] for v in _gs_row(tg_s, j, NG2)], axis=0)
            mg = jnp.concatenate(
                [mg_ref[0, j, i][None] for i in range(NG2)], axis=0)
            dg = jnp.concatenate(
                [dg_ref[0, j, i][None] for i in range(NG2)], axis=0)
            cz = jnp.concatenate([
                sum(C_ref[0, j, g, i] * z_tiles[i]
                    for i in range(NZ))[None]
                for g in range(NG)], axis=0)
            dtg, dlg = _dt_dlam(NG, False, lamg, tgv, mg, dg, None,
                                cz, 0.0)

            @pl.when(mtc)
            def _(j=j, dtg=dtg, dlg=dlg):
                dtag_s[j, :, :] = jnp.concatenate(
                    [dtg[i] for i in range(NG2)], axis=0)
                dlag_s[j, :, :] = jnp.concatenate(
                    [dlg[i] for i in range(NG2)], axis=0)

            cg = jnp.minimum(_alpha_cands(lamg, dlg, mg),
                             _alpha_cands(tgv, dtg, mg))
            cgm = jnp.min(cg, axis=0)
            amin_s[...] = jnp.minimum(
                amin_s[...], jnp.where(mtc, cgm, _BIG))
            s0_s[...] = s0_s[...] + jnp.where(
                mtc, jnp.sum(lamg * tgv * mg, axis=0), 0.0)
            s1_s[...] = s1_s[...] + jnp.where(
                mtc, jnp.sum(lamg * dtg + tgv * dlg, axis=0), 0.0)
            s2_s[...] = s2_s[...] + jnp.where(
                mtc, jnp.sum(dlg * dtg, axis=0), 0.0)

        @pl.when(s == N)
        def _():
            alpha_aff = jnp.minimum(one, amin_s[...])
            a = 0.995 * alpha_aff
            mu_aff = (s0_s[...] + a * s1_s[...]
                      + a * a * s2_s[...]) * musc
            mu = mu_s[...]
            ratio = mu_aff / jnp.where(mu > 0, mu, 1.0)
            sg_s[...] = ratio * ratio * ratio
            sm_s[...] = sg_s[...] * mu
            aa_s[...] = alpha_aff
            muaff_s[...] = mu_aff

    # ---- phase 2: corrector gradient + retained-factor trs --------------
    @pl.when((phase == 2) & (it < K) & alive)
    def _():
        lam = jnp.concatenate(
            [v[None] for v in _slab_row(lams, k, NB2)], axis=0)
        tt = jnp.concatenate(
            [v[None] for v in _slab_row(ts, k, NB2)], axis=0)
        A = _row(A_ref, k)
        mb = _row(mb_ref, k)
        dta = jnp.concatenate(
            [v[None] for v in _slab_row(dtas, k, NB2)], axis=0)
        dla = jnp.concatenate(
            [v[None] for v in _slab_row(dlas, k, NB2)], axis=0)
        co, qx_f = _corr_co_qx(NB, False, lam, tt, mb, A, None,
                               dta, dla, sm_s[...])
        cos[pl.ds(k, 1), :, :] = _cat_slab([co[i] for i in range(NB2)])
        ge_s[:] = _row(base_ref, k)
        _scatter_add_box(ge_s, idx_ref, qx_f, NB, k)
        if NS:
            from .step_kernel import _soft4, _soft_qx

            S_s, _, _, ms_k = _soft_stage_schur(k)
            dta_s = jnp.concatenate(
                [v[None] for v in _slab_row(dtass, k, NS4)], axis=0)
            dla_s = jnp.concatenate(
                [v[None] for v in _slab_row(dlass, k, NS4)], axis=0)
            dl2c = S_s["t_inv_s"] * (sm_s[...] - dla_s * dta_s) * \
                S_s["ms4"]
            dl2cs[pl.ds(k, 1), :, :] = _cat_slab(
                [dl2c[i] for i in range(NS4)])
            Qx_s, qx_s = _soft_qx(NS, ms_k, S_s)
            if exact:
                d0, d1, d2, d3 = _soft4(dl2c, NS)
                rqx0c = d0 - S_s["rQx0"] * (d0 + d2) * S_s["Zl0"]
                rqx1c = d1 - S_s["rQx1"] * (d1 + d3) * S_s["Zl1"]
                qx_s2 = qx_s + (rqx1c - rqx0c) * ms_k
            else:  # reference compat (stale-pointer bug, see ipm_soft)
                qx_s2 = qx_s
            _scatter_add_box(ge_s, idxs_ref, qx_s2, NS, k)

        # corrector gradient rows of the (static) active ng stages
        for j, stg in enumerate(ng_stage_ids):
            mtc = (k == stg)
            lamg = jnp.concatenate(
                [v[None] for v in _gs_row(lamg_s, j, NG2)], axis=0)
            tgv = jnp.concatenate(
                [v[None] for v in _gs_row(tg_s, j, NG2)], axis=0)
            mg = jnp.concatenate(
                [mg_ref[0, j, i][None] for i in range(NG2)], axis=0)
            dg = jnp.concatenate(
                [dg_ref[0, j, i][None] for i in range(NG2)], axis=0)
            dtag = jnp.concatenate(
                [v[None] for v in _gs_row(dtag_s, j, NG2)], axis=0)
            dlag = jnp.concatenate(
                [v[None] for v in _gs_row(dlag_s, j, NG2)], axis=0)
            cog, qxg2 = _corr_co_qx(NG, False, lamg, tgv, mg, dg, None,
                                    dtag, dlag, sm_s[...])

            @pl.when(mtc)
            def _(j=j, cog=cog):
                cog_s[j, :, :] = jnp.concatenate(
                    [cog[i] for i in range(NG2)], axis=0)

            for i in range(NZ):
                acc = None
                for g in range(NG):
                    tt_ = C_ref[0, j, g, i] * qxg2[g]
                    acc = tt_ if acc is None else acc + tt_
                ge_s[i] = ge_s[i] + jnp.where(mtc, acc, 0.0)

        ll = _slab_row(lls, k, NZ * NU)
        Ll = [[ll[i * NU + j] for j in range(NU)] for i in range(NZ)]
        Dinv_u = _dinv_ll(Ll, NU)
        ke = jnp.minimum(k, N - 1)
        Fk = _row(F_ref, ke)
        F = [[Fk[i, j] for j in range(NX)] for i in range(NZ)]
        Pb = _slab_row(pbs, ke, NX)
        Pbpx = [Pb[i] + px_c[i] for i in range(NX)]
        eu, px = _trs_stage(NU, NX, NZ, Ll, Dinv_u,
                            [ge_s[i] for i in range(NZ)], F, Pbpx,
                            s == 0)
        eus[pl.ds(k, 1), :, :] = _cat_slab(eu)
        pxs[pl.ds(k, 1), :, :] = _cat_slab(px)
        for i in range(NX):
            px_c[i] = px[i]

    # ---- phase 3: corrector forward + alpha + in-kernel step glue -------
    @pl.when((phase == 3) & (it < K) & alive)
    def _():
        @pl.when(s == 0)
        def _():
            amin_s[...] = jnp.full((SUBS, LANES), _BIG, dt)
            s0_s[...] = zero
            s1_s[...] = zero
            s2_s[...] = zero
            Lxx0 = _slab_row(lxxs, 0, NX * NX)
            Lxx0m = [[Lxx0[i * NX + j] for j in range(NX)]
                     for i in range(NX)]
            px0 = _slab_row(pxs, 0, NX)
            x0 = _root_x0(Lxx0m, px0, NX)
            for i in range(NX):
                x_c[i] = x0[i]

        ll = _slab_row(lls, s, NZ * NU)
        Ll = [[ll[i * NU + j] for j in range(NU)] for i in range(NZ)]
        eu = _slab_row(eus, s, NU)
        px = _slab_row(pxs, s, NX)
        Dinv_u = _dinv_ll(Ll, NU)
        x = [x_c[i] for i in range(NX)]
        u = _u_of_x(NU, NX, Ll, Dinv_u, eu, x)
        z_tiles = u + x
        dz2s[pl.ds(s, 1), :, :] = _cat_slab(z_tiles)

        lxx = _slab_row(lxxs, s, NX * NX)
        Lxx = [[lxx[i * NX + j] for j in range(NX)] for i in range(NX)]
        pi2 = _pi_of_x(NX, Lxx, px, x)
        dpi2s[pl.ds(jnp.maximum(s - 1, 0), 1), :, :] = _cat_slab(pi2)

        se = jnp.minimum(s, N - 1)
        Fk = _row(F_ref, se)
        F = [[Fk[i, j] for j in range(NX)] for i in range(NZ)]
        bk = _row(b_ref, se)
        xn = _x_next_of(NU, NX, F, [bk[i] for i in range(NX)], u, x)
        for j in range(NX):
            x_c[j] = xn[j]

        zb = _gather_list(z_tiles, idx_ref, NB, s)
        lam = jnp.concatenate(
            [v[None] for v in _slab_row(lams, s, NB2)], axis=0)
        tt = jnp.concatenate(
            [v[None] for v in _slab_row(ts, s, NB2)], axis=0)
        A = _row(A_ref, s)
        mb = _row(mb_ref, s)
        co = jnp.concatenate(
            [v[None] for v in _slab_row(cos, s, NB2)], axis=0)
        dt_b, dl_b = _dt_dlam(NB, False, lam, tt, mb, A, None, zb, co)
        dt2s[pl.ds(s, 1), :, :] = _cat_slab(
            [dt_b[i] for i in range(NB2)])
        dl2s[pl.ds(s, 1), :, :] = _cat_slab(
            [dl_b[i] for i in range(NB2)])
        cand = jnp.minimum(_alpha_cands(lam, dl_b, mb),
                           _alpha_cands(tt, dt_b, mb))
        amin_s[...] = jnp.minimum(amin_s[...], jnp.min(cand, axis=0))
        s0_s[...] = s0_s[...] + jnp.sum(lam * tt * mb, axis=0)
        s1_s[...] = s1_s[...] + jnp.sum(lam * dt_b + tt * dl_b, axis=0)
        s2_s[...] = s2_s[...] + jnp.sum(dl_b * dt_b, axis=0)

        if NS:
            from .step_kernel import _soft4, _soft_dt_dls

            S_s, lam_s, t_s, ms_s = _soft_stage_schur(s)
            zsv2 = _gather_list(z_tiles, idxs_ref, NS, s) * ms_s
            dl2c = jnp.concatenate(
                [v[None] for v in _slab_row(dl2cs, s, NS4)], axis=0)
            d0, d1, d2, d3 = _soft4(dl2c, NS)
            dt_s2, dl_s2 = _soft_dt_dls(
                NS, lam_s, t_s, ms_s, S_s, zsv2, dl2c,
                S_s["zl0"] + d0 + d2, S_s["zl1"] + d1 + d3)
            dt2ss[pl.ds(s, 1), :, :] = _cat_slab(
                [dt_s2[i] for i in range(NS4)])
            dl2ss[pl.ds(s, 1), :, :] = _cat_slab(
                [dl_s2[i] for i in range(NS4)])
            ms4 = S_s["ms4"]
            cs = jnp.minimum(_alpha_cands(lam_s, dl_s2, ms4),
                             _alpha_cands(t_s, dt_s2, ms4))
            amin_s[...] = jnp.minimum(amin_s[...], jnp.min(cs, axis=0))
            s0_s[...] = s0_s[...] + jnp.sum(lam_s * t_s * ms4, axis=0)
            s1_s[...] = s1_s[...] + jnp.sum(
                lam_s * dt_s2 + t_s * dl_s2, axis=0)
            s2_s[...] = s2_s[...] + jnp.sum(dl_s2 * dt_s2, axis=0)

        # corrector rows of the (static) active ng stages
        for j, stg in enumerate(ng_stage_ids):
            mtc = (s == stg)
            lamg = jnp.concatenate(
                [v[None] for v in _gs_row(lamg_s, j, NG2)], axis=0)
            tgv = jnp.concatenate(
                [v[None] for v in _gs_row(tg_s, j, NG2)], axis=0)
            mg = jnp.concatenate(
                [mg_ref[0, j, i][None] for i in range(NG2)], axis=0)
            dg = jnp.concatenate(
                [dg_ref[0, j, i][None] for i in range(NG2)], axis=0)
            cz2 = jnp.concatenate([
                sum(C_ref[0, j, g, i] * z_tiles[i]
                    for i in range(NZ))[None]
                for g in range(NG)], axis=0)
            cogv = jnp.concatenate(
                [v[None] for v in _gs_row(cog_s, j, NG2)], axis=0)
            dtg2, dlg2 = _dt_dlam(NG, False, lamg, tgv, mg, dg, None,
                                  cz2, cogv)

            @pl.when(mtc)
            def _(j=j, dtg2=dtg2, dlg2=dlg2):
                dt2g_s[j, :, :] = jnp.concatenate(
                    [dtg2[i] for i in range(NG2)], axis=0)
                dl2g_s[j, :, :] = jnp.concatenate(
                    [dlg2[i] for i in range(NG2)], axis=0)

            cg = jnp.minimum(_alpha_cands(lamg, dlg2, mg),
                             _alpha_cands(tgv, dtg2, mg))
            cgm = jnp.min(cg, axis=0)
            amin_s[...] = jnp.minimum(
                amin_s[...], jnp.where(mtc, cgm, _BIG))
            s0_s[...] = s0_s[...] + jnp.where(
                mtc, jnp.sum(lamg * tgv * mg, axis=0), 0.0)
            s1_s[...] = s1_s[...] + jnp.where(
                mtc, jnp.sum(lamg * dtg2 + tgv * dlg2, axis=0), 0.0)
            s2_s[...] = s2_s[...] + jnp.where(
                mtc, jnp.sum(dlg2 * dtg2, axis=0), 0.0)

        @pl.when(s == N)
        def _():
            alpha2 = jnp.minimum(one, amin_s[...])
            a2 = 0.995 * alpha2
            mu_new = (s0_s[...] + a2 * s1_s[...]
                      + a2 * a2 * s2_s[...]) * musc
            # per-instance max |dual| of the would-be update (one pass
            # over the lam + corrector-direction slabs; a2 is known
            # here, so this is EXACTLY the post-update max the lanes
            # engine's guard sees)
            lmx_old = zero
            lmx_new = zero
            for n in range(Np1):
                lamn = _slab_row(lams, n, NB2)
                dln = _slab_row(dl2s, n, NB2)
                for i in range(NB2):
                    lmx_old = jnp.maximum(lmx_old, jnp.abs(lamn[i]))
                    lmx_new = jnp.maximum(
                        lmx_new, jnp.abs(lamn[i] + a2 * dln[i]))
            for j in range(n_ng):
                lgn = _gs_row(lamg_s, j, NG2)
                dlgn = _gs_row(dl2g_s, j, NG2)
                for i in range(NG2):
                    lmx_old = jnp.maximum(lmx_old, jnp.abs(lgn[i]))
                    lmx_new = jnp.maximum(
                        lmx_new, jnp.abs(lgn[i] + a2 * dlgn[i]))
            # NaN-safe finiteness (x == x rejects NaN; bound rejects inf)
            # + the f32 divergence/dual-explosion freeze (models/ipm.
            # step_ok: mu growing >10x, or max |lam| growing >30x, from
            # below 1e-3 = breakdown; keep the last good state)
            floor = mu_s[...] < 1e-3
            # anchored cumulative twin (models/ipm.anchor_lam_ref):
            # lamref holds max(|lam|, 1) at the first accepted
            # below-floor iterate (_BIG = not yet anchored)
            anchored = lamref_s[...] < _BIG
            ok = ((mu_new == mu_new) & (jnp.abs(mu_new) < _BIG)
                  & ~((mu_new > 10.0 * mu_s[...]) & floor)
                  & ~((lmx_new > 30.0 * jnp.maximum(lmx_old, one))
                      & floor)
                  & ~(anchored & (lmx_new > 30.0 * lamref_s[...])))
            upd = live & ok
            lamref_s[...] = jnp.where(
                upd & ~anchored & (mu_new < 1e-3),
                jnp.maximum(lmx_new, one), lamref_s[...])
            a2p_s[...] = jnp.where(upd, a2, zero)
            mu_s[...] = jnp.where(upd, mu_new, mu_s[...])
            frz_s[...] = jnp.where(
                live & (~ok | (a2 < alpha_min)), one, frz_s[...])
            kk_s[...] = kk_s[...] + jnp.where(upd, one, zero)
            # rows recorded only for APPLIED iterations (the engines'
            # ok-gate drops the breakdown row, incl. its NaN sigma)
            stat_c[0] = jnp.where(upd, sg_s[...], zero)
            stat_c[1] = jnp.where(upd, aa_s[...], zero)
            stat_c[2] = jnp.where(upd, muaff_s[...], zero)
            stat_c[3] = jnp.where(upd, alpha2, zero)
            stat_c[4] = jnp.where(upd, mu_new, zero)

    # ---- every-step output writes (garbage-free progressive flush) ------
    st = jnp.where((phase == 0) | (phase == 2), k, s)
    zt = _slab_row(zs, st, NZ)
    for i in range(NZ):
        z_out[0, 0, i] = zt[i]
    lamt_ = _slab_row(lams, st, NB2)
    tt_ = _slab_row(ts, st, NB2)
    for i in range(NB2):
        lam_out[0, 0, i] = lamt_[i]
        t_out[0, 0, i] = tt_[i]
    e = jnp.maximum(st - 1, 0)
    pit = _slab_row(pis, e, NX)
    for i in range(NX):
        pi_out[0, 0, i] = pit[i]
    mu_out[0, 0] = mu_s[...]
    kk_out[0, 0] = kk_s[...]
    frz_out[0, 0] = frz_s[...]
    for r in range(5):
        stat_out[0, 0, r] = stat_c[r]
    for j in range(n_ng):
        lgt = _gs_row(lamg_s, j, NG2)
        tgt = _gs_row(tg_s, j, NG2)
        for i in range(NG2):
            lamg_out[0, j, i] = lgt[i]
            tg_out[0, j, i] = tgt[i]
    if NS:
        lst = _slab_row(lsofts, st, NS4)
        tst = _slab_row(tsofts, st, NS4)
        for i in range(NS4):
            lams_out[0, 0, i] = lst[i]
            ts_out[0, 0, i] = tst[i]


@functools.partial(
    jax.jit,
    static_argnames=("NB", "NU", "NZ", "NX", "k_max", "mu_scal",
                     "mu_tol", "alpha_min", "mu0", "NG",
                     "ng_stage_ids", "NS", "exact"),
)
def ipm_resident(idx_tab, lam0, t0, z0l, pi0l, base, pdreg, Hl, Fl, bl,
                 dcat, mb, NB, NU, NZ, NX, k_max, mu_scal, mu_tol,
                 alpha_min, mu0, NG=0, ng_stage_ids=(),
                 Cg=None, dgg=None, mgg=None, lamg0=None, tg0=None,
                 NS=0, exact=True, idxs_tab=None, lams0=None, ts0=None,
                 softc=None, msk=None, musc=None):
    """Run the whole phase-1 IPM in one pallas_call.

    All array args are the lanes streams of :func:`make_lanes_common`
    (``models/ipm_lanes.py``).  General constraints: ``ng_stage_ids``
    (static) names the active stages; ``Cg`` (nb, n_ng, NG, NZ, 8, 128),
    ``dgg``/``mgg``/``lamg0``/``tg0`` (nb, n_ng, 2NG, 8, 128).

    SOFT variant (``NS > 0``): the soft-slack Schur elimination, soft
    corrector gradient and the 4-slack alpha/mu contributions of
    ``d_ip2_soft.c`` run in-kernel per stage (helper cores shared with
    :mod:`.step_kernel`'s ``soft_*`` kernels).  Extra streams:
    ``idxs_tab`` (Np1, NS) SMEM soft-coordinate table, ``lams0``/``ts0``
    (nb, Np1, 4NS, 8, 128), ``softc`` (nb, Np1, 6NS, 8, 128) constants
    [d_lbs; d_ubs; Z0; Z1; zl0; zl1], ``msk`` (nb, Np1, NS, 8, 128)
    soft masks, ``musc`` (nb, 1, 8, 128) per-instance 1/n_constr (the
    4-ns slack terms make it instance-dependent).  The soft path IS the
    soft engines' full semantics (the soft solver is single-phase), so
    no legacy caveat applies.  Returns two extra trailing outputs
    (lams_l, ts_l).

    Returns (z_l, pi_l, lam_l, t_l, mu, kk, frozen, stat[, lamg_l,
    tg_l][, lams_l, ts_l]) in lanes form, with mu/kk/frozen as
    (nb, 1, 8, 128) tiles and stat (nb, k_max, 5, 8, 128)."""
    nb, Np1 = lam0.shape[0], lam0.shape[1]
    N = Np1 - 1
    dt = lam0.dtype
    NB2 = 2 * NB
    NG2 = 2 * NG
    NS4 = 4 * NS
    n_ng = len(ng_stage_ids)
    NT = _sym_nt(NZ)

    def whole(shape):
        nd = len(shape)
        return pl.BlockSpec(
            (1,) + shape,
            lambda bb, it, s4, _nd=nd: (bb,) + (0,) * _nd,
            memory_space=pltpu.VMEM,
        )

    idx_spec = pl.BlockSpec((Np1, NB), lambda bb, it, s4: (0, 0),
                            memory_space=pltpu.SMEM)

    in_specs = [
        idx_spec,
        whole((Np1, NB2, SUBS, LANES)),   # lam0
        whole((Np1, NB2, SUBS, LANES)),   # t0
        whole((Np1, NZ, SUBS, LANES)),    # z0
        whole((N, NX, SUBS, LANES)),      # pi0
        whole((Np1, NZ, SUBS, LANES)),    # base g
        whole((Np1, NZ, SUBS, LANES)),    # pad_diag + reg
        whole((Np1, NT, SUBS, LANES)),    # H packed
        whole((N, NZ, NX, SUBS, LANES)),  # F
        whole((N, NX, SUBS, LANES)),      # b
        whole((Np1, NB2, SUBS, LANES)),   # d_cat
        whole((Np1, NB2, SUBS, LANES)),   # mb
    ]
    args = [idx_tab, lam0, t0, z0l, pi0l, base, pdreg, Hl, Fl, bl,
            dcat, mb]
    if n_ng:
        in_specs += [
            whole((n_ng, NG, NZ, SUBS, LANES)),   # C rows
            whole((n_ng, NG2, SUBS, LANES)),      # dg_cat
            whole((n_ng, NG2, SUBS, LANES)),      # mg
            whole((n_ng, NG2, SUBS, LANES)),      # lam_g0
            whole((n_ng, NG2, SUBS, LANES)),      # t_g0
        ]
        args += [Cg, dgg, mgg, lamg0, tg0]
    if NS:
        idxs_spec = pl.BlockSpec((Np1, NS), lambda bb, it, s4: (0, 0),
                                 memory_space=pltpu.SMEM)
        in_specs += [
            idxs_spec,                            # soft coordinate table
            whole((Np1, NS4, SUBS, LANES)),       # lam_s0
            whole((Np1, NS4, SUBS, LANES)),       # t_s0
            whole((Np1, 6 * NS, SUBS, LANES)),    # soft constants
            whole((Np1, NS, SUBS, LANES)),        # ns mask
            whole((1, SUBS, LANES)),              # per-instance mu scal
        ]
        args += [idxs_tab, lams0, ts0, softc, msk, musc]

    def st_map(bb, it, s4):
        Np1_ = N + 1
        phase = s4 // Np1_
        s = s4 % Np1_
        st = jnp.where((phase == 0) | (phase == 2), N - s, s)
        return (bb, st, 0, 0, 0)

    def pi_map(bb, it, s4):
        Np1_ = N + 1
        phase = s4 // Np1_
        s = s4 % Np1_
        st = jnp.where((phase == 0) | (phase == 2), N - s, s)
        return (bb, jnp.clip(st - 1, 0, N - 1), 0, 0, 0)

    def sc_map(bb, it, s4):
        return (bb, 0, 0, 0)

    def stat_map(bb, it, s4):
        return (bb, jnp.minimum(it, k_max - 1), 0, 0, 0)

    out_specs = [
        pl.BlockSpec((1, 1, NZ, SUBS, LANES), st_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, SUBS, LANES), pi_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NB2, SUBS, LANES), st_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NB2, SUBS, LANES), st_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, SUBS, LANES), sc_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, SUBS, LANES), sc_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, SUBS, LANES), sc_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 5, SUBS, LANES), stat_map,
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, N, NX, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, NB2, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, NB2, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, 1, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, 1, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, 1, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, k_max, 5, SUBS, LANES), dt),
    ]
    if n_ng:
        ng_out = pl.BlockSpec(
            (1, n_ng, NG2, SUBS, LANES),
            lambda bb, it, s4: (bb, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_specs += [ng_out, ng_out]
        out_shape += [
            jax.ShapeDtypeStruct((nb, n_ng, NG2, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, n_ng, NG2, SUBS, LANES), dt),
        ]
    if NS:
        s_out = pl.BlockSpec((1, 1, NS4, SUBS, LANES), st_map,
                             memory_space=pltpu.VMEM)
        out_specs += [s_out, s_out]
        out_shape += [
            jax.ShapeDtypeStruct((nb, Np1, NS4, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NS4, SUBS, LANES), dt),
        ]

    def sv(count, rows=None):
        return pltpu.VMEM(((Np1 if rows is None else rows),
                           count * SUBS, LANES), dt)

    def tile():
        return pltpu.VMEM((SUBS, LANES), dt)

    scratch = [
        sv(NZ),            # zs
        sv(NX, N),         # pis
        sv(NB2),           # lams
        sv(NB2),           # ts
        sv(NZ),            # dz2s
        sv(NX, N),         # dpi2s
        sv(NB2),           # dt2s
        sv(NB2),           # dl2s
        sv(NB2),           # dtas
        sv(NB2),           # dlas
        sv(NB2),           # cos
        sv(NZ * NU),       # lls
        sv(NU),            # eus
        sv(NX),            # pxs
        sv(NX * NX),       # lxxs
        sv(NX, N),         # pbs
        pltpu.VMEM((NX, NX, SUBS, LANES), dt),  # Lxx carry
        pltpu.VMEM((NX, SUBS, LANES), dt),      # px carry
        pltpu.VMEM((NX, SUBS, LANES), dt),      # x carry
        pltpu.VMEM((NZ, SUBS, LANES), dt),      # geff scratch
        tile(), tile(), tile(), tile(), tile(),  # a2p mu sm frz kk
        tile(), tile(), tile(), tile(),          # amin s0 s1 s2
        tile(), tile(), tile(),                  # alpha_aff mu_aff sigma
        pltpu.VMEM((5, SUBS, LANES), dt),        # stat row
    ]
    if n_ng:
        scratch += [
            pltpu.VMEM((n_ng, NG2 * SUBS, LANES), dt) for _ in range(7)
        ]  # lamg tg dtag dlag cog dt2g dl2g
    if NS:
        scratch += [sv(NS4) for _ in range(7)]
        # lsofts tsofts dtass dlass dl2cs dt2ss dl2ss
    scratch += [tile()]  # lamref (cumulative-guard anchor)

    kernel = functools.partial(
        _resident_kernel, NB, NU, NX, NZ, N, k_max, NG,
        tuple(ng_stage_ids), NS, exact, mu_scal, mu_tol, alpha_min, mu0,
    )
    return pcall(
        kernel,
        grid=(nb, k_max + 1, 4 * Np1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(*args)
