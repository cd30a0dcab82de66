"""Flat-state batched SOFT IPM — the TPU throughput engine for
:mod:`.ipm_soft` (``d_ip2_mpc_soft_tv``, ``mpc_solvers/d_ip2_soft.c:83``).

Same single-loop Mehrotra predictor-corrector and per-iteration slack
Schur elimination as the structured implementation, re-laid-out with the
discipline of :mod:`.ipm_fast`: every piece of loop state is 2-D
``(B, flat)`` (the structured soft layouts tile-pad brutally — the
``(B, N+1, 2, NB)`` multiplier stacks pad ~65x and the ``(B, N+1, 4, NS)``
slack stacks ~64x, and the soft step machinery reads/writes ~10 of them
per iteration), box/soft gathers are 0/1 selection-matrix matmuls on the
MXU, and the KKT factor/solve runs in the fused Pallas stage kernels
(``stage_kernel.factor_solve_folded_flat`` / ``solve_flat``) with the
soft barrier's Schur-eliminated diagonal folded into ``dvec``.

Layouts: box pairs concat ``[lower; upper] (B, 2*NBF)`` with sign vector
``sgn`` (exactly ipm_fast); general pairs ``(B, 2*NGF)`` on the static
ng-active stages; soft 4-family state as four named ``(B, NSF)`` slices
``(lo, up, s_lo, s_up)`` concatenated ``(B, 4*NSF)`` in storage — the
slack formulas are family-asymmetric so named slices beat sign tricks.

Entered from :func:`hpmpc_tpu.parallel.batch.solve_batched_soft` when
``cfg.use_pallas``, the batch is a 1024-multiple, and the box/soft index
layouts are static.  Cross-checked iterate-for-iterate against
``vmap(ipm_soft.solve)`` by tests/test_stage_kernel.py.
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


class _FState(NamedTuple):
    zF: jax.Array      # (B, (N+1)*NZ)
    piF: jax.Array     # (B, N*NX)
    lam_b: jax.Array   # (B, 2*NBF)
    t_b: jax.Array     # (B, 2*NBF)
    lam_g: jax.Array   # (B, 2*NGF)
    t_g: jax.Array     # (B, 2*NGF)
    lam_s: jax.Array   # (B, 4*NSF)  [lo; up; s_lo; s_up]
    t_s: jax.Array     # (B, 4*NSF)
    mu: jax.Array      # (B,)
    alpha: jax.Array   # (B,)
    kk: jax.Array      # (B,) int32
    stat: jax.Array    # (5, k_max, B)


def solve_batched_flat(
    dims: OCPDims, qp: OCPQP, soft, cfg, idxbs_static,
    exact_mehrotra_soft: bool = True,
) -> _soft.SoftSolution:
    """Batch-level flat-state soft solve.  ``idxbs_static`` is the static
    (N+1, NS) tuple-of-tuples of padded-z soft coordinates (the analogue
    of ``dims.idxb`` for the soft set — all instances must share it)."""
    with jax.default_matmul_precision("float32"):
        return _impl(dims, qp, soft, cfg, idxbs_static, exact_mehrotra_soft)


def _impl(dims, qp, soft, cfg, idxbs_static, exact_mehrotra_soft):
    from ..ops import stage_kernel as sk

    dt = qp.dtype
    N, NU, NX, NZ, NB, NG = dims.N, dims.NU, dims.NX, dims.NZ, dims.NB, dims.NG
    B = qp.b.shape[0]
    assert B % sk.BI == 0, "flat path requires batch % 1024 == 0"
    NS = soft.ns_mask.shape[-1]

    ng_stages = tuple(n for n in range(N + 1) if dims.ng[n] > 0)
    n_ng = len(ng_stages)
    NZF = (N + 1) * NZ
    NXF = N * NX
    NBF = (N + 1) * NB
    NGF = n_ng * NG
    NSF = (N + 1) * NS

    # ---- flat constants (box machinery identical to ipm_fast) ----------
    mbF = qp.nb_mask.reshape(B, NBF)
    mb2 = jnp.concatenate([mbF, mbF], 1)
    d_lbF = qp.d_lb.reshape(B, NBF)
    d_ubF = qp.d_ub.reshape(B, NBF)
    d_cat = jnp.concatenate([d_lbF, d_ubF], 1)
    sgn = jnp.concatenate(
        [jnp.ones((1, NBF), dt), -jnp.ones((1, NBF), dt)], 1
    )

    assert dims.idxb is not None, "flat path requires static dims.idxb"
    HI = jax.lax.Precision.HIGHEST
    sel_np = np.zeros((NZF, NBF), np.float32)
    for n in range(N + 1):
        nun = dims.nu[n]
        for k in range(dims.nb[n]):
            j = int(dims.idxb[n][k])
            jp = j if j < nun else NU + (j - nun)
            sel_np[n * NZ + jp, n * NB + k] = 1.0
    SelB = jnp.asarray(sel_np, dt)
    SelBT = jnp.asarray(sel_np.T, dt)

    # soft selection: idxbs are PADDED-z coordinates already
    msF = soft.ns_mask.reshape(B, NSF)
    sels_np = np.zeros((NZF, NSF), np.float32)
    for n in range(N + 1):
        for k in range(NS):
            j = int(idxbs_static[n][k])
            sels_np[n * NZ + j, n * NS + k] = 1.0
    SelS = jnp.asarray(sels_np, dt)
    SelST = jnp.asarray(sels_np.T, dt)

    def gather_box(vF):
        return jnp.dot(vF, SelB, precision=HI)

    def scatter_box(v):
        return jnp.dot(v, SelBT, precision=HI)

    def gather_soft(vF):  # (B, NZF) -> (B, NSF)
        return jnp.dot(vF, SelS, precision=HI) * msF

    def scatter_soft(v):  # (B, NSF) -> (B, NZF)
        return jnp.dot(v * msF, SelST, precision=HI)

    def cat2(v):
        return jnp.concatenate([v, v], 1)

    def fold(v):
        return v[:, :NBF] + v[:, NBF:]

    def split4(v):  # (B, 4*NSF) -> 4 x (B, NSF)
        return v[:, :NSF], v[:, NSF:2*NSF], v[:, 2*NSF:3*NSF], v[:, 3*NSF:]

    def cat4(a, b, c, d):
        return jnp.concatenate([a, b, c, d], 1)

    d_lbsF = soft.d_lbs.reshape(B, NSF)
    d_ubsF = soft.d_ubs.reshape(B, NSF)
    Z0F = soft.Z[:, :, 0].reshape(B, NSF)
    Z1F = soft.Z[:, :, 1].reshape(B, NSF)
    zl0F = soft.z_lin[:, :, 0].reshape(B, NSF)
    zl1F = soft.z_lin[:, :, 1].reshape(B, NSF)
    ms4 = cat4(msF, msF, msF, msF)

    # general constraints (identical machinery to ipm_fast)
    if n_ng:
        C_act = [qp.C[:, n] for n in ng_stages]
        # paired C streams for the packed barrier-term assembly (see
        # ipm_fast: avoids the tile-padded structured ngterm intermediate)
        _HIp = jax.lax.Precision.HIGHEST
        Ct1, Ct2 = sk.sym_pair_streams(jnp.stack(C_act, 1), NZ)
        mgF = jnp.concatenate([qp.ng_mask[:, n] for n in ng_stages], 1)
        dg_lo = jnp.concatenate([qp.d_lg[:, n] for n in ng_stages], 1)
        dg_up = jnp.concatenate([qp.d_ug[:, n] for n in ng_stages], 1)
        dg_cat = jnp.concatenate([dg_lo, dg_up], 1)
        mg2 = jnp.concatenate([mgF, mgF], 1)
        sgn_g = jnp.concatenate(
            [jnp.ones((1, NGF), dt), -jnp.ones((1, NGF), dt)], 1
        )

        def cz_of(zF):
            outs = [
                jnp.einsum(
                    "bgz,bz->bg", C_act[k],
                    lax.slice_in_dim(zF, n * NZ, (n + 1) * NZ, axis=1),
                )
                for k, n in enumerate(ng_stages)
            ]
            return jnp.concatenate(outs, 1)

        def ct_apply(out, v):
            for k, n in enumerate(ng_stages):
                contrib = jnp.einsum(
                    "bg,bgz->bz", v[:, k * NG : (k + 1) * NG], C_act[k]
                )
                out = out.at[:, n * NZ : (n + 1) * NZ].add(contrib)
            return out
    else:
        mg2 = jnp.zeros((B, 0), dt)

        def cz_of(zF):
            return jnp.zeros((B, 0), dt)

        def ct_apply(out, v):
            return out

    gF = (qp.g * qp.z_mask).reshape(B, NZF)
    bF = qp.b.reshape(B, NXF)
    pad_diagF = qp.pad_diag.reshape(B, NZF)

    Hl = sk._to_lanes(sk.sym_compress(qp.H), B)  # packed symmetric stream
    Fl = sk._to_lanes(qp.F, B)
    nb_blk = B // sk.BI

    # mu scaling: 2 nb + 2 ng + 4 ns (d_ip2_soft.c:268-271); ns from the
    # per-instance mask sum
    n_hard = 2 * sum(dims.nb) + 2 * sum(dims.ng)
    mu_scal = 1.0 / (n_hard + 4.0 * jnp.sum(msF, axis=1))
    mu_tol = jnp.asarray(cfg.mu_tol, dt)
    alpha_min = jnp.asarray(cfg.alpha_min, dt)
    k_max = cfg.k_max
    thr0 = jnp.asarray(0.1, dt)
    mu0 = jnp.asarray(cfg.mu0, dt)
    reg = jnp.asarray(cfg.reg_eps, dt)

    def mu_of(lam_b, t_b, lam_g, t_g, lam_s, t_s):
        m = jnp.sum(lam_b * t_b * mb2, axis=1)
        if n_ng:
            m = m + jnp.sum(lam_g * t_g * mg2, axis=1)
        m = m + jnp.sum(lam_s * t_s * ms4, axis=1)
        return m * mu_scal

    def min_ratio(a, v, dv, m):
        if v.shape[1] == 0:
            return a
        pred = (dv < 0.0) & (m > 0.0)
        ratio = jnp.where(pred, -v / jnp.where(pred, dv, -1.0), jnp.inf)
        return jnp.minimum(a, jnp.min(ratio, axis=1))

    def gate(m, new, old):
        out = []
        for f, a, b in zip(_FState._fields, new, old):
            mm = (
                m[None, None, :]
                if f == "stat"
                else m.reshape((B,) + (1,) * (a.ndim - 1))
            )
            out.append(jnp.where(mm, a, b))
        return _FState(*out)

    # ---- init (d_init_var_mpc_soft_tv :38; box part == ipm_fast) --------
    zF0 = jnp.zeros((B, NZF), dt)
    zb = gather_box(zF0)
    t0 = sgn * (cat2(zb) - d_cat)
    t_lo0, t_up0 = t0[:, :NBF], t0[:, NBF:]
    both = (t_lo0 < thr0) & (t_up0 < thr0)
    lo_only = (t_lo0 < thr0) & ~both
    up_only = (t_up0 < thr0) & ~both
    t_lo = jnp.where(both | lo_only, thr0, t_lo0)
    t_up = jnp.where(both | up_only, thr0, t_up0)
    z_corr = jnp.where(
        both, (d_lbF - d_ubF) * 0.5,
        jnp.where(lo_only, d_lbF + thr0,
                  jnp.where(up_only, d_ubF - thr0, zb)),
    )
    changed = ((both | lo_only | up_only) & (mbF > 0)).astype(dt)
    zF0 = zF0 * (1.0 - scatter_box(changed)) + scatter_box(changed * z_corr)

    t_b0 = jnp.concatenate([t_lo, t_up], 1)
    t_b0 = jnp.where(mb2 > 0, t_b0, 1.0)
    lam_b0 = jnp.where(mb2 > 0, mu0 / t_b0, 0.0)
    if n_ng:
        czv = cz_of(zF0)
        t_g0 = jnp.maximum(thr0, sgn_g * (cat2(czv) - dg_cat))
        t_g0 = jnp.where(mg2 > 0, t_g0, 1.0)
        lam_g0 = jnp.where(mg2 > 0, mu0 / t_g0, 0.0)
    else:
        t_g0 = jnp.ones((B, 0), dt)
        lam_g0 = jnp.zeros((B, 0), dt)
    t_s0 = jnp.ones((B, 4 * NSF), dt)
    lam_s0 = jnp.where(ms4 > 0, mu0, 0.0)

    s0 = _FState(
        zF=zF0, piF=jnp.zeros((B, NXF), dt),
        lam_b=lam_b0, t_b=t_b0, lam_g=lam_g0, t_g=t_g0,
        lam_s=lam_s0, t_s=t_s0,
        mu=jnp.full((B,), mu0, dt),
        alpha=jnp.ones((B,), dt),
        kk=jnp.zeros((B,), jnp.int32),
        stat=jnp.zeros((5, k_max, B), dt),
    )

    kiota = jnp.arange(k_max, dtype=jnp.int32)

    def stat_update(stat, kk, row):
        mask = kiota[None, :, None] == kk[None, None, :]
        return jnp.where(mask, row[:, None, :], stat)

    # ---- single loop (d_ip2_mpc_soft_tv; == ipm_soft.body, flat) --------
    def body(s):
        t_inv_b = jnp.where(mb2 > 0, 1.0 / s.t_b, 0.0)
        lamt_b = s.lam_b * t_inv_b
        Qx_b = fold(lamt_b) * mbF
        qx_b = fold(-sgn * s.lam_b - lamt_b * d_cat) * mbF
        if n_ng:
            t_inv_g = jnp.where(mg2 > 0, 1.0 / s.t_g, 0.0)
            lamt_g = s.lam_g * t_inv_g
            Qx_g = (lamt_g[:, :NGF] + lamt_g[:, NGF:]) * mgF
            qx_g = (
                (-sgn_g * s.lam_g - lamt_g * dg_cat)[:, :NGF]
                + (-sgn_g * s.lam_g - lamt_g * dg_cat)[:, NGF:]
            ) * mgF
        else:
            t_inv_g = lamt_g = Qx_g = qx_g = jnp.zeros((B, 0), dt)

        t_inv_s = jnp.where(ms4 > 0, 1.0 / s.t_s, 0.0)
        lamt_s = s.lam_s * t_inv_s
        lts0, lts1, lts2, lts3 = split4(lamt_s)
        ls0, ls1, ls2, ls3 = split4(s.lam_s)

        # soft Schur elimination (d_aux_ip_soft_lib4.c:167 Zl/zl recurrences)
        rQx0 = lts0
        rQx1 = lts1
        rqx0 = ls0 + lts0 * d_lbsF
        rqx1 = ls1 - lts1 * d_ubsF
        Zl0 = jnp.where(msF > 0, 1.0 / (Z0F + rQx0 + lts2), 0.0)
        Zl1 = jnp.where(msF > 0, 1.0 / (Z1F + rQx1 + lts3), 0.0)
        zl0 = -zl0F + rqx0 + ls2
        zl1 = -zl1F + rqx1 + ls3
        rqx0e = rqx0 - rQx0 * zl0 * Zl0
        rqx1e = rqx1 - rQx1 * zl1 * Zl1
        rQx0e = rQx0 - rQx0 * rQx0 * Zl0
        rQx1e = rQx1 - rQx1 * rQx1 * Zl1
        Qx_s = (rQx0e + rQx1e) * msF
        qx_s = (rqx1e - rqx0e) * msF

        # ---- KKT factor+solve in the fused Pallas kernels ----
        dvecF = (
            scatter_box(Qx_b) + scatter_soft(Qx_s) + pad_diagF + reg
        )
        g_eff = gF + scatter_box(qx_b) + scatter_soft(qx_s)
        g_eff = ct_apply(g_eff, qx_g)
        if n_ng:
            Qg = (Qx_g * mgF).reshape(B, n_ng, NG)
            ngt = jnp.einsum(
                "bngt,bng,bngt->bnt", Ct1, Qg, Ct2, precision=_HIp
            )
            ngl = sk._to_lanes_flat(
                ngt.reshape(B, -1), B, (n_ng, sk._sym_nt(NZ))
            )
        else:
            ngl = jnp.zeros(
                (nb_blk, 1, sk._sym_nt(NZ), sk.SUBS, sk.LANES), dt
            )
        # affine dpi is dead (only the corrector's dpi2 is used): skip the
        # pi math and the Lxx forward stream
        dz, dpi, (Ll_l, Lxx_l, Pb_l) = sk.factor_solve_folded_flat(
            Hl, dvecF, ngl, ng_stages, g_eff, Fl, bF, NU, NZ, NX,
            want_pi=False,
        )

        def dt_dlam(dzF, dl0_b, dl0_g, dl0_s, zlo, zlu):
            zbn = gather_box(dzF)
            dtb = (sgn * (cat2(zbn) - d_cat) - s.t_b) * mb2
            dlb = (dl0_b - lamt_b * dtb - s.lam_b) * mb2
            if n_ng:
                czn = cz_of(dzF)
                dtg = (sgn_g * (cat2(czn) - dg_cat) - s.t_g) * mg2
                dlg = (dl0_g - lamt_g * dtg - s.lam_g) * mg2
            else:
                dtg = dlg = jnp.zeros((B, 0), dt)
            zs = gather_soft(dzF)
            ds_lo = (zlo - lts0 * zs) * Zl0
            ds_up = (zlu + lts1 * zs) * Zl1
            dts = cat4(
                ds_lo + zs - d_lbsF - s.t_s[:, :NSF],
                ds_up - zs + d_ubsF - s.t_s[:, NSF:2*NSF],
                ds_lo - s.t_s[:, 2*NSF:3*NSF],
                ds_up - s.t_s[:, 3*NSF:],
            ) * ms4
            dls = (dl0_s - lamt_s * dts - s.lam_s) * ms4
            return dtb, dtg, dts, dlb, dlg, dls

        def alpha_all(dtb, dtg, dts, dlb, dlg, dls):
            a = jnp.ones((B,), dt)
            a = min_ratio(a, s.lam_b, dlb, mb2)
            a = min_ratio(a, s.t_b, dtb, mb2)
            a = min_ratio(a, s.lam_g, dlg, mg2)
            a = min_ratio(a, s.t_g, dtg, mg2)
            a = min_ratio(a, s.lam_s, dls, ms4)
            a = min_ratio(a, s.t_s, dts, ms4)
            return a

        zer_b = jnp.zeros_like(s.lam_b)
        zer_g = jnp.zeros_like(s.lam_g)
        zer_s = jnp.zeros_like(s.lam_s)
        dtb, dtg, dts, dlb, dlg, dls = dt_dlam(dz, zer_b, zer_g, zer_s, zl0, zl1)
        alpha_aff = alpha_all(dtb, dtg, dts, dlb, dlg, dls)
        a = (alpha_aff * 0.995)[:, None]
        mu_aff = mu_of(s.lam_b + a * dlb, s.t_b + a * dtb,
                       s.lam_g + a * dlg, s.t_g + a * dtg,
                       s.lam_s + a * dls, s.t_s + a * dts)
        sigma = (mu_aff / s.mu) ** 3
        sm = (sigma * s.mu)[:, None]

        # corrector gradient update (d_aux_ip_soft_lib4.c:508)
        dl2b = t_inv_b * (sm - dlb * dtb) * mb2
        qx_b2 = qx_b + fold(-sgn * dl2b) * mbF
        if n_ng:
            dl2g = t_inv_g * (sm - dlg * dtg) * mg2
            qx_g2 = qx_g + (
                (-sgn_g * dl2g)[:, :NGF] + (-sgn_g * dl2g)[:, NGF:]
            ) * mgF
        else:
            dl2g = jnp.zeros((B, 0), dt)
            qx_g2 = qx_g
        dl2s = t_inv_s * (sm - dls * dts) * ms4
        d0, d1, d2, d3 = split4(dl2s)
        zl0c = zl0 + d0 + d2
        zl1c = zl1 + d1 + d3
        rqx0c = d0 - rQx0 * (d0 + d2) * Zl0
        rqx1c = d1 - rQx1 * (d1 + d3) * Zl1
        if exact_mehrotra_soft:
            qx_s2 = qx_s + (rqx1c - rqx0c) * msF
        else:  # reference compat (stale-pointer bug, see ipm_soft)
            qx_s2 = qx_s

        g_eff2 = gF + scatter_box(qx_b2) + scatter_soft(qx_s2)
        g_eff2 = ct_apply(g_eff2, qx_g2)
        from . import ipm_fast as _ipf
        resolve_fn = (
            sk.solve_flat_fused if _ipf._fused_sweeps() else sk.solve_flat
        )
        dz2, dpi2 = resolve_fn(
            Ll_l, Lxx_l, Pb_l, g_eff2, Fl, bF, NU, NZ, NX
        )

        dtb, dtg, dts, dlb, dlg, dls = dt_dlam(dz2, dl2b, dl2g, dl2s, zl0c, zl1c)
        alpha2 = alpha_all(dtb, dtg, dts, dlb, dlg, dls)
        a2 = (alpha2 * 0.995)[:, None]

        z_new = s.zF + a2 * (dz2 - s.zF)
        pi_new = s.piF + a2 * (dpi2 - s.piF)
        lam_b_n = s.lam_b + a2 * dlb
        t_b_n = s.t_b + a2 * dtb
        lam_g_n = s.lam_g + a2 * dlg
        t_g_n = s.t_g + a2 * dtg
        lam_s_n = s.lam_s + a2 * dls
        t_s_n = s.t_s + a2 * dts
        mu_new = mu_of(lam_b_n, t_b_n, lam_g_n, t_g_n, lam_s_n, t_s_n)

        row = jnp.stack([sigma, alpha_aff, mu_aff, alpha2, mu_new])
        s_new = _FState(
            zF=z_new, piF=pi_new,
            lam_b=lam_b_n, t_b=t_b_n, lam_g=lam_g_n, t_g=t_g_n,
            lam_s=lam_s_n, t_s=t_s_n,
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

    # ---- structured outputs (SoftSolution contract) ---------------------
    def pair_struct(v, K):  # (B, 2*K*(N+1)-style) -> (B, N+1, 2, K)
        return jnp.stack(
            [v[:, : (N + 1) * K].reshape(B, N + 1, K),
             v[:, (N + 1) * K :].reshape(B, N + 1, K)], axis=2
        )

    lam_b_s = pair_struct(sf.lam_b, NB)
    t_b_s = pair_struct(sf.t_b, NB)
    lam_g_s = jnp.zeros((B, N + 1, 2, NG), dt)
    t_g_s = jnp.ones((B, N + 1, 2, NG), dt)
    for k, n in enumerate(ng_stages):
        sl = slice(k * NG, (k + 1) * NG)
        lam_g_s = lam_g_s.at[:, n, 0].set(sf.lam_g[:, sl])
        lam_g_s = lam_g_s.at[:, n, 1].set(sf.lam_g[:, NGF:][:, sl])
        t_g_s = t_g_s.at[:, n, 0].set(sf.t_g[:, sl])
        t_g_s = t_g_s.at[:, n, 1].set(sf.t_g[:, NGF:][:, sl])
    a_, b_, c_, d_ = split4(sf.lam_s)
    lam_s_s = jnp.stack(
        [x.reshape(B, N + 1, NS) for x in (a_, b_, c_, d_)], axis=2
    )
    a_, b_, c_, d_ = split4(sf.t_s)
    t_s_s = jnp.stack(
        [x.reshape(B, N + 1, NS) for x in (a_, b_, c_, d_)], axis=2
    )

    return _soft.SoftSolution(
        z=sf.zF.reshape(B, N + 1, NZ),
        pi=sf.piF.reshape(B, N, NX),
        lam_b=lam_b_s, t_b=t_b_s, lam_g=lam_g_s, t_g=t_g_s,
        lam_s=lam_s_s, t_s=t_s_s,
        kk=sf.kk, status=status,
        stat=jnp.transpose(sf.stat, (2, 1, 0)),
    )
