"""Mega-sweep Pallas kernels: one pallas_call per IPM half-iteration.

The lanes-resident engine (:mod:`..models.ipm_lanes`) runs six kernels per
iteration (prep, sv+fwd, alpha, corr, trs+fwd, alpha).  The step phases
adjacent to each sweep touch the SAME per-stage streams the sweep reads,
so here they fold into the sweep's two-phase grid:

  * ``factor_solve_mega``: barrier prep (stage N-s) feeds the folded
    backward factorization IN the same grid step (the effective Hessian
    diag and gradient never exist in HBM), and the affine
    fraction-to-boundary/duality-sum pass rides the forward recovery
    (stage s-N-1) reading the just-written iterate block;
  * ``solve_mega``: the centering/corrector gradient (stage N-s) feeds
    the backward substitution in-step (the corrector stream rides a VMEM
    slab to the forward phase), and the corrector alpha pass rides the
    forward recovery.

One phase-1 iteration = 2 pallas_calls + XLA scalar glue.  Everything is
assembled from the shared per-stage bodies (``stage_kernel._folded_bwd_core``
/ ``_trs_stage`` / forward helpers; ``step_kernel._qx_fold`` / ``_dt_dlam``
/ ``_alpha_cands``), so a numeric fix lands in every variant at once.
Hardware-validated default (v5e A/B 2026-08-19: mega 481k vs 416k
solves/s for the 6-kernel lanes loop); ``HPMPC_MEGA_SWEEPS=0`` opts out.

Reference mapping: this is the TPU composition of ``d_ip2_res_hard.c``'s
per-iteration call sequence (update_hessian_gradient -> ric sv ->
compute_alpha; centering_correction/update_gradient -> ric trs ->
compute_alpha) into two fused device passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stage_kernel import (
    LANES, SUBS, pcall, _cat_slab, _dinv_ll, _folded_bwd_core, _mat, _pi_of_x,
    _root_x0, _sym_idx, _sym_nt, _trs_stage, _u_of_x, _vec, _x_next_of,
)
from .step_kernel import (
    _alpha_cands, _alpha_store, _corr_co_qx, _dt_dlam, _gather_box,
    _qx_fold, _scatter_add_box, _soft4, _soft_dt_dls, _soft_qx,
    _soft_schur, _t_inv_lamt,
)


def _alpha_from_out(NB, NZ, phase2, idx_ref, row, z_ref, lam, t, A, M, mb,
                    dl0, dt_ref, dl_ref, amin_ref, s0_ref, s1_ref, s2_ref):
    """The per-stage alpha/sums pass reading the iterate from the
    just-written z output block (same grid step).  ``row`` indexes the
    full-table SMEM index ref (this grid step's stage)."""
    zb = _gather_box(z_ref, idx_ref, NB, row)
    dt_b, dl_b = _dt_dlam(NB, phase2, lam, t, mb, A, M, zb, dl0)
    _alpha_store(lam, t, mb, dt_b, dl_b,
                 dt_ref, dl_ref, amin_ref, s0_ref, s1_ref, s2_ref)


def _sv_mega_kernel(NB, NU, NX, NZ, N, ng_stage_ids, phase2, has_m,
                    *refs):
    """Grid (nb, 2(N+1)).  Steps 0..N: prep(stage N-s) + folded backward
    factorization; steps N+1..2N+1: pi-less forward recovery + affine
    alpha/sums (stage s-N-1)."""
    it = iter(refs)
    idx_ref = next(it)
    lamb_ref, tb_ref, ab_ref = next(it), next(it), next(it)
    mb_b_ref = next(it)
    m_b_ref = m_f_ref = None
    if has_m:
        m_b_ref = next(it)
    base_ref, pd_ref, H_ref, ng_ref, ngadd_ref = (
        next(it), next(it), next(it), next(it), next(it)
    )
    lamf_ref, tf_ref, af_ref, mbf_ref = (
        next(it), next(it), next(it), next(it)
    )
    if has_m:
        m_f_ref = next(it)
    F_ref, b_ref = next(it), next(it)
    # outputs
    (Ll_ref, Lxx_ref, Pb_ref, z_ref, dt_ref, dl_ref,
     amin_ref, s0_ref, s1_ref, s2_ref) = (
        next(it), next(it), next(it), next(it), next(it), next(it),
        next(it), next(it), next(it), next(it)
    )
    # scratch
    (Lxx_c, px_c, ll_s, eu_s, px_s, lxx0_s, x_c, dv_s, ge_s) = (
        next(it), next(it), next(it), next(it), next(it), next(it),
        next(it), next(it), next(it)
    )

    s = pl.program_id(1)
    NT = _sym_nt(NZ)

    @pl.when(s <= N)
    def _():
        # ---- barrier prep for stage N-s (in VMEM scratch) ----
        lam = lamb_ref[0, 0]
        t = tb_ref[0, 0]
        A = ab_ref[0, 0]
        mb = mb_b_ref[0, 0]
        M = m_b_ref[0, 0] if has_m else None
        Qx_f, qx_f = _qx_fold(NB, phase2, lam, t, mb, A, M)
        dv_s[:] = pd_ref[0, 0]
        _scatter_add_box(dv_s, idx_ref, Qx_f, NB, N - s)
        ge_s[:] = base_ref[0, 0]
        _scatter_add_box(ge_s, idx_ref, qx_f, NB, N - s)

        stage_match = None
        for stg in ng_stage_ids:
            m = (s == N - stg)
            stage_match = m if stage_match is None else (stage_match | m)

        if ng_stage_ids:
            @pl.when(stage_match)
            def _():
                ge_s[:] = ge_s[:] + ngadd_ref[0, 0]

        Hp = [H_ref[0, 0, tt] for tt in range(NT)]
        for i in range(NZ):
            di = _sym_idx(i, i)
            Hp[di] = Hp[di] + dv_s[i]
        if ng_stage_ids:
            for tt in range(NT):
                Hp[tt] = Hp[tt] + jnp.where(
                    stage_match, ng_ref[0, 0, tt], 0.0
                )
        g = [ge_s[i] for i in range(NZ)]

        Lf, eu, px, Pb = _folded_bwd_core(
            NU, NX, NZ, s, Hp, g, F_ref, b_ref, Lxx_c, px_c
        )
        for i in range(NX):
            Pb_ref[0, 0, i] = Pb[i]
        for i in range(NZ):
            for j in range(NU):
                Ll_ref[0, 0, i, j] = Lf[i][j]
        for i in range(NX):
            for j in range(NX):
                Lxx_ref[0, 0, i, j] = Lf[NU + i][NU + j]

        k_node = N - s
        ll_s[pl.ds(k_node, 1), :, :] = _cat_slab(
            [Lf[i][j] for i in range(NZ) for j in range(NU)]
        )
        eu_s[pl.ds(k_node, 1), :, :] = _cat_slab(eu)
        px_s[pl.ds(k_node, 1), :, :] = _cat_slab(px)

        @pl.when(s == N)
        def _():
            for i in range(NX):
                for j in range(NX):
                    lxx0_s[i, j] = Lf[NU + i][NU + j]

    @pl.when(s > N)
    def _():
        sb = s - (N + 1)
        lslab = ll_s[pl.ds(sb, 1), :, :]
        Ll = [
            [lslab[0, (i * NU + j) * SUBS : (i * NU + j + 1) * SUBS, :]
             for j in range(NU)]
            for i in range(NZ)
        ]
        eslab = eu_s[pl.ds(sb, 1), :, :]
        eu = [eslab[0, i * SUBS : (i + 1) * SUBS, :] for i in range(NU)]
        pslab = px_s[pl.ds(sb, 1), :, :]
        px = [pslab[0, i * SUBS : (i + 1) * SUBS, :] for i in range(NX)]
        Dinv_u = _dinv_ll(Ll, NU)

        @pl.when(sb == 0)
        def _():
            Lxx0 = [[lxx0_s[i, j] for j in range(NX)] for i in range(NX)]
            x0 = _root_x0(Lxx0, px, NX)
            for i in range(NX):
                x_c[i] = x0[i]

        x = [x_c[i] for i in range(NX)]
        u = _u_of_x(NU, NX, Ll, Dinv_u, eu, x)
        for i in range(NU):
            z_ref[0, 0, i] = u[i]
        for i in range(NX):
            z_ref[0, 0, NU + i] = x[i]

        F = _mat(F_ref, NZ, NX)
        bb = _vec(b_ref, NX)
        xn = _x_next_of(NU, NX, F, bb, u, x)
        for j in range(NX):
            x_c[j] = xn[j]

        _alpha_from_out(
            NB, NZ, phase2, idx_ref, sb, z_ref,
            lamf_ref[0, 0], tf_ref[0, 0], af_ref[0, 0],
            m_f_ref[0, 0] if has_m else None, mbf_ref[0, 0], 0.0,
            dt_ref, dl_ref, amin_ref, s0_ref, s1_ref, s2_ref,
        )


@functools.partial(
    jax.jit,
    static_argnames=("ng_stage_ids", "NB", "NU", "NZ", "NX", "phase2"),
)
def factor_solve_mega(idx_tab, lam, t, A, M, mb, base, pdreg, Hl, ngl,
                      ngaddl, ng_stage_ids, Fl, bl,
                      NB, NU, NZ, NX, phase2):
    """Fused prep + sv + fwd + affine alpha (one pallas_call).

    Inputs are the lanes streams of ipm_lanes (box state, d_cat/rd in A,
    rm in M for phase 2, gradient base g/rq, pad_diag+reg, packed H,
    packed ng barrier term, and the ng gradient add ``ngaddl``
    (nb, max(n_ng,1), NZ, 8, 128) applied on active stages).  Returns
    (z_l, fstate, dt_l, dl_l, amin, s0, s1, s2) with the last four as
    per-stage partials."""
    nb, Np1 = lam.shape[0], lam.shape[1]
    N = Np1 - 1
    dt = lam.dtype
    NB2 = 2 * NB
    NT = _sym_nt(NZ)
    has_m = M is not None

    def bwd(bb, s):
        return (bb, jnp.where(s <= N, N - s, 0), 0, 0, 0)

    def fwd(bb, s):
        return (bb, jnp.where(s > N, jnp.maximum(s - (N + 1), 0), 0),
                0, 0, 0)

    def box_spec(map_fn):
        return pl.BlockSpec((1, 1, NB2, SUBS, LANES), map_fn,
                            memory_space=pltpu.VMEM)

    def z_spec(map_fn):
        return pl.BlockSpec((1, 1, NZ, SUBS, LANES), map_fn,
                            memory_space=pltpu.VMEM)

    def ng_slot(s):
        slot = 0
        for k, stg in enumerate(ng_stage_ids):
            slot = jnp.where((N - s) == stg, k, slot)
        return slot

    idx_spec = pl.BlockSpec(
        (Np1, NB), lambda bb, s: (0, 0), memory_space=pltpu.SMEM,
    )
    r_spec = pl.BlockSpec(
        (1, 1, SUBS, LANES), lambda bb, s: fwd(bb, s)[:2] + (0, 0),
        memory_space=pltpu.VMEM,
    )

    args = [idx_tab, lam, t, A, mb]
    in_specs = [idx_spec, box_spec(bwd), box_spec(bwd), box_spec(bwd),
                box_spec(bwd)]
    if has_m:
        args.append(M)
        in_specs.append(box_spec(bwd))
    args += [base, pdreg, Hl, ngl, ngaddl]
    in_specs += [
        z_spec(bwd), z_spec(bwd),
        pl.BlockSpec((1, 1, NT, SUBS, LANES), bwd,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NT, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(s <= N, ng_slot(s), 0),
                                    0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NZ, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(s <= N, ng_slot(s), 0),
                                    0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args += [lam, t, A, mb]
    in_specs += [box_spec(fwd), box_spec(fwd), box_spec(fwd),
                 box_spec(fwd)]
    if has_m:
        args.append(M)
        in_specs.append(box_spec(fwd))
    args += [Fl, bl]
    in_specs += [
        pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.clip(
                         jnp.where(s <= N, N - s, s - (N + 1)), 0, N - 1
                     ), 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.clip(
                         jnp.where(s <= N, N - s, s - (N + 1)), 0, N - 1
                     ), 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    out_specs = [
        pl.BlockSpec((1, 1, NZ, NU, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(s <= N, N - s, 0),
                                    0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(s <= N, N - s, 0),
                                    0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(
                         s <= N, jnp.clip(N - s, 0, N - 1), 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        z_spec(fwd),
        box_spec(fwd), box_spec(fwd),
        r_spec, r_spec, r_spec, r_spec,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nb, Np1, NZ, NU, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, NX, NX, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, N, NX, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, NB2, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, NB2, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
    ]
    kernel = functools.partial(
        _sv_mega_kernel, NB, NU, NX, NZ, N, tuple(ng_stage_ids),
        phase2, has_m,
    )
    outs = pcall(
        kernel,
        grid=(nb, 2 * Np1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((NX, NX, SUBS, LANES), dt),        # Lxx carry
            pltpu.VMEM((NX, SUBS, LANES), dt),            # px carry
            pltpu.VMEM((Np1, NZ * NU * SUBS, LANES), dt),  # Ll slab
            pltpu.VMEM((Np1, NU * SUBS, LANES), dt),       # eu slab
            pltpu.VMEM((Np1, NX * SUBS, LANES), dt),       # px slab
            pltpu.VMEM((NX, NX, SUBS, LANES), dt),         # root Lxx
            pltpu.VMEM((NX, SUBS, LANES), dt),             # x carry
            pltpu.VMEM((NZ, SUBS, LANES), dt),             # dvec scratch
            pltpu.VMEM((NZ, SUBS, LANES), dt),             # geff scratch
        ],
    )(*args)
    Ll_l, Lxx_l, Pb_l, z_l, dt_l, dl_l, amin, s0, s1, s2 = outs
    return z_l, (Ll_l, Lxx_l, Pb_l), dt_l, dl_l, amin, s0, s1, s2


def _trs_mega_kernel(NB, NU, NX, NZ, N, ng_stage_ids, phase2, has_m,
                     *refs):
    """Grid (nb, 2(N+1)).  Steps 0..N: centering/corrector gradient for
    stage N-s (corrector stream -> VMEM slab) + retained-factor backward
    substitution; steps N+1..2N+1: forward recovery (with pi) + corrector
    alpha/sums."""
    it = iter(refs)
    idx_ref = next(it)
    lamb_ref, tb_ref, ab_ref, mb_b_ref = (
        next(it), next(it), next(it), next(it)
    )
    m_b_ref = next(it) if has_m else None
    dtb_ref, dlb_ref, sm_ref, base_ref, ngadd_ref = (
        next(it), next(it), next(it), next(it), next(it)
    )
    lamf_ref, tf_ref, af_ref, mbf_ref = (
        next(it), next(it), next(it), next(it)
    )
    Ll_in_ref, Lxx_in_ref, Pb_in_ref, F_ref, b_ref = (
        next(it), next(it), next(it), next(it), next(it)
    )
    (z_ref, pi_ref, dt2_ref, dl2_ref,
     amin_ref, s0_ref, s1_ref, s2_ref) = (
        next(it), next(it), next(it), next(it),
        next(it), next(it), next(it), next(it)
    )
    (px_c, ll_s, eu_s, px_s, co_s, x_c, ge_s) = (
        next(it), next(it), next(it), next(it), next(it), next(it),
        next(it)
    )

    s = pl.program_id(1)
    NB2 = 2 * NB

    @pl.when(s <= N)
    def _():
        k = N - s
        lam = lamb_ref[0, 0]
        t = tb_ref[0, 0]
        A = ab_ref[0, 0]
        mb = mb_b_ref[0, 0]
        sm = sm_ref[0, 0]
        dtb = dtb_ref[0, 0]
        dlb = dlb_ref[0, 0]
        co, qx_f = _corr_co_qx(
            NB, phase2, lam, t, mb, A,
            m_b_ref[0, 0] if has_m else None, dtb, dlb, sm,
        )
        co_s[pl.ds(k, 1), :, :] = _cat_slab([co[i] for i in range(NB2)])

        ge_s[:] = base_ref[0, 0]
        _scatter_add_box(ge_s, idx_ref, qx_f, NB, k)
        if ng_stage_ids:
            stage_match = None
            for stg in ng_stage_ids:
                m = (s == N - stg)
                stage_match = m if stage_match is None else (
                    stage_match | m
                )

            @pl.when(stage_match)
            def _():
                ge_s[:] = ge_s[:] + ngadd_ref[0, 0]

        # retained-factor backward substitution (stage k)
        Ll = _mat(Ll_in_ref, NZ, NU)
        Dinv_u = _dinv_ll(Ll, NU)
        g = [ge_s[i] for i in range(NZ)]
        F = _mat(F_ref, NZ, NX)
        Pb = _vec(Pb_in_ref, NX)
        Pbpx = [Pb[i] + px_c[i] for i in range(NX)]
        eu, px = _trs_stage(NU, NX, NZ, Ll, Dinv_u, g, F, Pbpx, s == 0)

        ll_s[pl.ds(k, 1), :, :] = _cat_slab(
            [Ll[i][j] for i in range(NZ) for j in range(NU)]
        )
        eu_s[pl.ds(k, 1), :, :] = _cat_slab(eu)
        px_s[pl.ds(k, 1), :, :] = _cat_slab(px)
        for i in range(NX):
            px_c[i] = px[i]

    @pl.when(s > N)
    def _():
        sb = s - (N + 1)
        lslab = ll_s[pl.ds(sb, 1), :, :]
        Ll = [
            [lslab[0, (i * NU + j) * SUBS : (i * NU + j + 1) * SUBS, :]
             for j in range(NU)]
            for i in range(NZ)
        ]
        eslab = eu_s[pl.ds(sb, 1), :, :]
        eu = [eslab[0, i * SUBS : (i + 1) * SUBS, :] for i in range(NU)]
        pslab = px_s[pl.ds(sb, 1), :, :]
        px = [pslab[0, i * SUBS : (i + 1) * SUBS, :] for i in range(NX)]
        Lxx = _mat(Lxx_in_ref, NX, NX)
        Dinv_u = _dinv_ll(Ll, NU)

        @pl.when(sb == 0)
        def _():
            x0 = _root_x0(Lxx, px, NX)
            for i in range(NX):
                x_c[i] = x0[i]

        x = [x_c[i] for i in range(NX)]
        # pi_{sb-1} (dead write at sb == 0, overwritten before copy-out)
        for i, v in enumerate(_pi_of_x(NX, Lxx, px, x)):
            pi_ref[0, 0, i] = v
        u = _u_of_x(NU, NX, Ll, Dinv_u, eu, x)
        for i in range(NU):
            z_ref[0, 0, i] = u[i]
        for i in range(NX):
            z_ref[0, 0, NU + i] = x[i]

        F = _mat(F_ref, NZ, NX)
        bb = _vec(b_ref, NX)
        xn = _x_next_of(NU, NX, F, bb, u, x)
        for j in range(NX):
            x_c[j] = xn[j]

        cslab = co_s[pl.ds(sb, 1), :, :]
        co = jnp.concatenate(
            [cslab[0, i * SUBS : (i + 1) * SUBS, :][None]
             for i in range(NB2)], axis=0,
        )
        _alpha_from_out(
            NB, NZ, phase2, idx_ref, sb, z_ref,
            lamf_ref[0, 0], tf_ref[0, 0], af_ref[0, 0],
            co if phase2 else None, mbf_ref[0, 0],
            0.0 if phase2 else co,
            dt2_ref, dl2_ref, amin_ref, s0_ref, s1_ref, s2_ref,
        )


@functools.partial(
    jax.jit,
    static_argnames=("ng_stage_ids", "NB", "NU", "NZ", "NX", "phase2"),
)
def solve_mega(idx_tab, fstate, lam, t, A, M, mb, dtb_l, dlb_l, sm_l,
               base, ngaddl, ng_stage_ids, Fl, bl, NB, NU, NZ, NX,
               phase2):
    """Fused corrector-gradient + trs + fwd + corrector alpha.

    ``fstate`` is factor_solve_mega's (Ll_l, Lxx_l, Pb_l); ``dtb_l``/
    ``dlb_l`` the affine direction streams; ``sm_l`` sigma*mu as an
    (nb, 1, 8, 128) lanes scalar.  Returns
    (z2_l, pi2_l, dt2_l, dl2_l, amin, s0, s1, s2)."""
    Ll_l, Lxx_l, Pb_l = fstate
    nb, Np1 = lam.shape[0], lam.shape[1]
    N = Np1 - 1
    dt = lam.dtype
    NB2 = 2 * NB
    has_m = M is not None

    def bwd(bb, s):
        return (bb, jnp.where(s <= N, N - s, 0), 0, 0, 0)

    def fwd(bb, s):
        return (bb, jnp.where(s > N, jnp.maximum(s - (N + 1), 0), 0),
                0, 0, 0)

    def box_spec(map_fn):
        return pl.BlockSpec((1, 1, NB2, SUBS, LANES), map_fn,
                            memory_space=pltpu.VMEM)

    def z_spec(map_fn):
        return pl.BlockSpec((1, 1, NZ, SUBS, LANES), map_fn,
                            memory_space=pltpu.VMEM)

    def ng_slot(s):
        slot = 0
        for k, stg in enumerate(ng_stage_ids):
            slot = jnp.where((N - s) == stg, k, slot)
        return slot

    idx_spec = pl.BlockSpec(
        (Np1, NB), lambda bb, s: (0, 0), memory_space=pltpu.SMEM,
    )
    sm_spec = pl.BlockSpec((1, 1, SUBS, LANES),
                           lambda bb, s: (bb, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec(
        (1, 1, SUBS, LANES),
        lambda bb, s: (bb, jnp.where(s > N, jnp.maximum(s - (N + 1), 0),
                                     0), 0, 0),
        memory_space=pltpu.VMEM,
    )

    args = [idx_tab, lam, t, A, mb]
    in_specs = [idx_spec, box_spec(bwd), box_spec(bwd), box_spec(bwd),
                box_spec(bwd)]
    if has_m:
        args.append(M)
        in_specs.append(box_spec(bwd))
    args += [dtb_l, dlb_l, sm_l, base, ngaddl]
    in_specs += [
        box_spec(bwd), box_spec(bwd), sm_spec, z_spec(bwd),
        pl.BlockSpec((1, 1, NZ, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(s <= N, ng_slot(s), 0),
                                    0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args += [lam, t, A, mb]
    in_specs += [box_spec(fwd), box_spec(fwd), box_spec(fwd),
                 box_spec(fwd)]
    args += [Ll_l, Lxx_l, Pb_l, Fl, bl]
    in_specs += [
        pl.BlockSpec((1, 1, NZ, NU, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(s <= N, N - s, 0),
                                    0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(
                         s > N, jnp.maximum(s - (N + 1), 0), 0),
                         0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(
                         s <= N, jnp.clip(N - s, 0, N - 1), 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.clip(
                         jnp.where(s <= N, N - s, s - (N + 1)), 0, N - 1
                     ), 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(
                         s > N, jnp.clip(s - (N + 1), 0, N - 1), 0),
                         0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        z_spec(fwd),
        pl.BlockSpec((1, 1, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(
                         s > N, jnp.clip(s - (N + 2), 0, N - 1), 0),
                         0, 0, 0),
                     memory_space=pltpu.VMEM),
        box_spec(fwd), box_spec(fwd),
        r_spec, r_spec, r_spec, r_spec,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, N, NX, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, NB2, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, NB2, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
    ]
    kernel = functools.partial(
        _trs_mega_kernel, NB, NU, NX, NZ, N, tuple(ng_stage_ids),
        phase2, has_m,
    )
    outs = pcall(
        kernel,
        grid=(nb, 2 * Np1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((NX, SUBS, LANES), dt),             # px carry
            pltpu.VMEM((Np1, NZ * NU * SUBS, LANES), dt),  # Ll slab
            pltpu.VMEM((Np1, NU * SUBS, LANES), dt),       # eu slab
            pltpu.VMEM((Np1, NX * SUBS, LANES), dt),       # px slab
            pltpu.VMEM((Np1, NB2 * SUBS, LANES), dt),      # corrector slab
            pltpu.VMEM((NX, SUBS, LANES), dt),             # x carry
            pltpu.VMEM((NZ, SUBS, LANES), dt),             # geff scratch
        ],
    )(*args)
    return outs


# ---------------------------------------------------------------------------
# SOFT mega sweeps: the d_ip2_mpc_soft_tv half-iterations as single
# pallas_calls (the mega treatment of models/ipm_soft_lanes.py's 6-kernel
# loop).  Single-loop soft IPM: always phase-1 delta formulation, no M
# streams; the 4-slack-family machinery of
# mpc_solvers/{c99,avx}/d_aux_ip_soft_lib4.c rides the same two-phase grid
# (backward: box fold + slack Schur elimination feed the folded
# factorization in-step; forward: the combined box+soft fraction-to-
# boundary/duality-sum pass reads the just-written iterate block).
# ---------------------------------------------------------------------------


def _soft_alpha_from_out(NB, NS, NZ, idxb_ref, idxs_ref, row, z_ref,
                         lam, t, A, mb, lam_s, t_s, ms, sc,
                         dl0b, dl2s_in,
                         dtb_ref, dlb_ref, dts_ref, dls_ref,
                         amin_ref, s0_ref, s1_ref, s2_ref):
    """Combined box + soft alpha/sums pass on the just-written z block
    (the in-grid twin of step_kernel._soft_alpha_kernel's tail).
    ``dl0b``/``dl2s_in`` are 0.0 for the affine pass or the centering
    corrections for the corrector pass."""
    zb = _gather_box(z_ref, idxb_ref, NB, row)
    dt_b, dl_b = _dt_dlam(NB, False, lam, t, mb, A, None, zb, dl0b)
    dtb_ref[0, 0] = dt_b
    dlb_ref[0, 0] = dl_b

    S = _soft_schur(NS, lam_s, t_s, ms, sc)
    zs = _gather_box(z_ref, idxs_ref, NS, row) * ms
    if dl2s_in is None:
        zl0x, zl1x = S["zl0"], S["zl1"]
        dl0_s = 0.0
    else:
        d0, d1, d2, d3 = _soft4(dl2s_in, NS)
        zl0x = S["zl0"] + d0 + d2
        zl1x = S["zl1"] + d1 + d3
        dl0_s = dl2s_in
    dt_s, dl_s = _soft_dt_dls(NS, lam_s, t_s, ms, S, zs, dl0_s, zl0x, zl1x)
    dts_ref[0, 0] = dt_s
    dls_ref[0, 0] = dl_s

    ms4 = S["ms4"]
    cand = jnp.minimum(
        jnp.minimum(_alpha_cands(lam, dl_b, mb),
                    _alpha_cands(t, dt_b, mb)).min(axis=0),
        jnp.minimum(_alpha_cands(lam_s, dl_s, ms4),
                    _alpha_cands(t_s, dt_s, ms4)).min(axis=0),
    )
    amin_ref[0, 0] = cand
    s0_ref[0, 0] = (jnp.sum(lam * t * mb, axis=0)
                    + jnp.sum(lam_s * t_s * ms4, axis=0))
    s1_ref[0, 0] = (jnp.sum(lam * dt_b + t * dl_b, axis=0)
                    + jnp.sum(lam_s * dt_s + t_s * dl_s, axis=0))
    s2_ref[0, 0] = (jnp.sum(dl_b * dt_b, axis=0)
                    + jnp.sum(dl_s * dt_s, axis=0))


def _soft_sv_mega_kernel(NB, NS, NU, NX, NZ, N, ng_stage_ids, *refs):
    """Grid (nb, 2(N+1)).  Steps 0..N: soft barrier prep (box fold +
    slack Schur, stage N-s) + folded backward factorization; steps
    N+1..2N+1: pi-less forward recovery + affine box+soft alpha/sums."""
    it = iter(refs)
    idxb_ref, idxs_ref = next(it), next(it)
    lamb_ref, tb_ref, ab_ref, mb_b_ref = (
        next(it), next(it), next(it), next(it)
    )
    lams_b_ref, ts_b_ref, sc_b_ref, ms_b_ref = (
        next(it), next(it), next(it), next(it)
    )
    base_ref, pd_ref, H_ref, ng_ref, ngadd_ref = (
        next(it), next(it), next(it), next(it), next(it)
    )
    lamf_ref, tf_ref, af_ref, mbf_ref = (
        next(it), next(it), next(it), next(it)
    )
    lams_f_ref, ts_f_ref, sc_f_ref, ms_f_ref = (
        next(it), next(it), next(it), next(it)
    )
    F_ref, b_ref = next(it), next(it)
    # outputs
    (Ll_ref, Lxx_ref, Pb_ref, z_ref, dtb_ref, dlb_ref, dts_ref, dls_ref,
     amin_ref, s0_ref, s1_ref, s2_ref) = (
        next(it), next(it), next(it), next(it), next(it), next(it),
        next(it), next(it), next(it), next(it), next(it), next(it)
    )
    # scratch
    (Lxx_c, px_c, ll_s, eu_s, px_s, lxx0_s, x_c, dv_s, ge_s) = (
        next(it), next(it), next(it), next(it), next(it), next(it),
        next(it), next(it), next(it)
    )

    s = pl.program_id(1)
    NT = _sym_nt(NZ)

    @pl.when(s <= N)
    def _():
        k = N - s
        lam = lamb_ref[0, 0]
        t = tb_ref[0, 0]
        A = ab_ref[0, 0]
        mb = mb_b_ref[0, 0]
        Qx_f, qx_f = _qx_fold(NB, False, lam, t, mb, A, None)

        S = _soft_schur(NS, lams_b_ref[0, 0], ts_b_ref[0, 0],
                        ms_b_ref[0, 0], sc_b_ref[0, 0])
        Qx_s, qx_s = _soft_qx(NS, ms_b_ref[0, 0], S)

        dv_s[:] = pd_ref[0, 0]
        _scatter_add_box(dv_s, idxb_ref, Qx_f, NB, k)
        _scatter_add_box(dv_s, idxs_ref, Qx_s, NS, k)
        ge_s[:] = base_ref[0, 0]
        _scatter_add_box(ge_s, idxb_ref, qx_f, NB, k)
        _scatter_add_box(ge_s, idxs_ref, qx_s, NS, k)

        stage_match = None
        for stg in ng_stage_ids:
            m = (s == N - stg)
            stage_match = m if stage_match is None else (stage_match | m)

        if ng_stage_ids:
            @pl.when(stage_match)
            def _():
                ge_s[:] = ge_s[:] + ngadd_ref[0, 0]

        Hp = [H_ref[0, 0, tt] for tt in range(NT)]
        for i in range(NZ):
            di = _sym_idx(i, i)
            Hp[di] = Hp[di] + dv_s[i]
        if ng_stage_ids:
            for tt in range(NT):
                Hp[tt] = Hp[tt] + jnp.where(
                    stage_match, ng_ref[0, 0, tt], 0.0
                )
        g = [ge_s[i] for i in range(NZ)]

        Lf, eu, px, Pb = _folded_bwd_core(
            NU, NX, NZ, s, Hp, g, F_ref, b_ref, Lxx_c, px_c
        )
        for i in range(NX):
            Pb_ref[0, 0, i] = Pb[i]
        for i in range(NZ):
            for j in range(NU):
                Ll_ref[0, 0, i, j] = Lf[i][j]
        for i in range(NX):
            for j in range(NX):
                Lxx_ref[0, 0, i, j] = Lf[NU + i][NU + j]

        ll_s[pl.ds(k, 1), :, :] = _cat_slab(
            [Lf[i][j] for i in range(NZ) for j in range(NU)]
        )
        eu_s[pl.ds(k, 1), :, :] = _cat_slab(eu)
        px_s[pl.ds(k, 1), :, :] = _cat_slab(px)

        @pl.when(s == N)
        def _():
            for i in range(NX):
                for j in range(NX):
                    lxx0_s[i, j] = Lf[NU + i][NU + j]

    @pl.when(s > N)
    def _():
        sb = s - (N + 1)
        lslab = ll_s[pl.ds(sb, 1), :, :]
        Ll = [
            [lslab[0, (i * NU + j) * SUBS : (i * NU + j + 1) * SUBS, :]
             for j in range(NU)]
            for i in range(NZ)
        ]
        eslab = eu_s[pl.ds(sb, 1), :, :]
        eu = [eslab[0, i * SUBS : (i + 1) * SUBS, :] for i in range(NU)]
        pslab = px_s[pl.ds(sb, 1), :, :]
        px = [pslab[0, i * SUBS : (i + 1) * SUBS, :] for i in range(NX)]
        Dinv_u = _dinv_ll(Ll, NU)

        @pl.when(sb == 0)
        def _():
            Lxx0 = [[lxx0_s[i, j] for j in range(NX)] for i in range(NX)]
            x0 = _root_x0(Lxx0, px, NX)
            for i in range(NX):
                x_c[i] = x0[i]

        x = [x_c[i] for i in range(NX)]
        u = _u_of_x(NU, NX, Ll, Dinv_u, eu, x)
        for i in range(NU):
            z_ref[0, 0, i] = u[i]
        for i in range(NX):
            z_ref[0, 0, NU + i] = x[i]

        F = _mat(F_ref, NZ, NX)
        bb = _vec(b_ref, NX)
        xn = _x_next_of(NU, NX, F, bb, u, x)
        for j in range(NX):
            x_c[j] = xn[j]

        _soft_alpha_from_out(
            NB, NS, NZ, idxb_ref, idxs_ref, sb, z_ref,
            lamf_ref[0, 0], tf_ref[0, 0], af_ref[0, 0], mbf_ref[0, 0],
            lams_f_ref[0, 0], ts_f_ref[0, 0], ms_f_ref[0, 0],
            sc_f_ref[0, 0], 0.0, None,
            dtb_ref, dlb_ref, dts_ref, dls_ref,
            amin_ref, s0_ref, s1_ref, s2_ref,
        )


@functools.partial(
    jax.jit,
    static_argnames=("ng_stage_ids", "NB", "NS", "NU", "NZ", "NX"),
)
def factor_solve_soft_mega(idxb_tab, idxs_tab, lam, t, A, mb,
                           lam_s, t_s, soft_c, ms, base, pdreg, Hl, ngl,
                           ngaddl, ng_stage_ids, Fl, bl,
                           NB, NS, NU, NZ, NX):
    """Fused soft prep + sv + fwd + affine alpha (one pallas_call).

    The soft twin of :func:`factor_solve_mega`: inputs add the 4-family
    slack streams (lam_s/t_s (nb,N+1,4NS,8,128), the packed soft constants
    soft_c (6NS) and mask ms (NS)) and the soft SMEM index table.  Returns
    (z_l, fstate, dtb, dlb, dts, dls, amin, s0, s1, s2)."""
    nb, Np1 = lam.shape[0], lam.shape[1]
    N = Np1 - 1
    dt = lam.dtype
    NB2 = 2 * NB
    NT = _sym_nt(NZ)

    def bwd(bb, s):
        return (bb, jnp.where(s <= N, N - s, 0), 0, 0, 0)

    def fwd(bb, s):
        return (bb, jnp.where(s > N, jnp.maximum(s - (N + 1), 0), 0),
                0, 0, 0)

    def kspec(K, map_fn):
        return pl.BlockSpec((1, 1, K, SUBS, LANES), map_fn,
                            memory_space=pltpu.VMEM)

    def ng_slot(s):
        slot = 0
        for k, stg in enumerate(ng_stage_ids):
            slot = jnp.where((N - s) == stg, k, slot)
        return slot

    def ispec(K):
        return pl.BlockSpec((Np1, K), lambda bb, s: (0, 0),
                            memory_space=pltpu.SMEM)

    r_spec = pl.BlockSpec(
        (1, 1, SUBS, LANES), lambda bb, s: fwd(bb, s)[:2] + (0, 0),
        memory_space=pltpu.VMEM,
    )

    args = [idxb_tab, idxs_tab,
            lam, t, A, mb, lam_s, t_s, soft_c, ms,
            base, pdreg, Hl, ngl, ngaddl,
            lam, t, A, mb, lam_s, t_s, soft_c, ms,
            Fl, bl]
    in_specs = [
        ispec(NB), ispec(NS),
        kspec(NB2, bwd), kspec(NB2, bwd), kspec(NB2, bwd), kspec(NB2, bwd),
        kspec(4 * NS, bwd), kspec(4 * NS, bwd), kspec(6 * NS, bwd),
        kspec(NS, bwd),
        kspec(NZ, bwd), kspec(NZ, bwd),
        pl.BlockSpec((1, 1, NT, SUBS, LANES), bwd,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NT, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(s <= N, ng_slot(s), 0),
                                    0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NZ, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(s <= N, ng_slot(s), 0),
                                    0, 0, 0),
                     memory_space=pltpu.VMEM),
        kspec(NB2, fwd), kspec(NB2, fwd), kspec(NB2, fwd), kspec(NB2, fwd),
        kspec(4 * NS, fwd), kspec(4 * NS, fwd), kspec(6 * NS, fwd),
        kspec(NS, fwd),
        pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.clip(
                         jnp.where(s <= N, N - s, s - (N + 1)), 0, N - 1
                     ), 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.clip(
                         jnp.where(s <= N, N - s, s - (N + 1)), 0, N - 1
                     ), 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, NZ, NU, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(s <= N, N - s, 0),
                                    0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(s <= N, N - s, 0),
                                    0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(
                         s <= N, jnp.clip(N - s, 0, N - 1), 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        kspec(NZ, fwd),
        kspec(NB2, fwd), kspec(NB2, fwd),
        kspec(4 * NS, fwd), kspec(4 * NS, fwd),
        r_spec, r_spec, r_spec, r_spec,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nb, Np1, NZ, NU, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, NX, NX, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, N, NX, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, NB2, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, NB2, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, 4 * NS, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, 4 * NS, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
    ]
    kernel = functools.partial(
        _soft_sv_mega_kernel, NB, NS, NU, NX, NZ, N, tuple(ng_stage_ids),
    )
    outs = pcall(
        kernel,
        grid=(nb, 2 * Np1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((NX, NX, SUBS, LANES), dt),         # Lxx carry
            pltpu.VMEM((NX, SUBS, LANES), dt),             # px carry
            pltpu.VMEM((Np1, NZ * NU * SUBS, LANES), dt),  # Ll slab
            pltpu.VMEM((Np1, NU * SUBS, LANES), dt),       # eu slab
            pltpu.VMEM((Np1, NX * SUBS, LANES), dt),       # px slab
            pltpu.VMEM((NX, NX, SUBS, LANES), dt),         # root Lxx
            pltpu.VMEM((NX, SUBS, LANES), dt),             # x carry
            pltpu.VMEM((NZ, SUBS, LANES), dt),             # dvec scratch
            pltpu.VMEM((NZ, SUBS, LANES), dt),             # geff scratch
        ],
    )(*args)
    (Ll_l, Lxx_l, Pb_l, z_l, dtb, dlb, dts, dls, amin, s0, s1, s2) = outs
    return z_l, (Ll_l, Lxx_l, Pb_l), dtb, dlb, dts, dls, amin, s0, s1, s2


def _soft_trs_mega_kernel(NB, NS, NU, NX, NZ, N, ng_stage_ids, exact,
                          *refs):
    """Grid (nb, 2(N+1)).  Steps 0..N: box + 4-family centering/corrector
    gradient for stage N-s (corrector streams -> VMEM slabs) +
    retained-factor backward substitution; steps N+1..2N+1: forward
    recovery (with pi) + corrector box+soft alpha/sums."""
    it = iter(refs)
    idxb_ref, idxs_ref = next(it), next(it)
    lamb_ref, tb_ref, ab_ref, mb_b_ref = (
        next(it), next(it), next(it), next(it)
    )
    lams_b_ref, ts_b_ref, sc_b_ref, ms_b_ref = (
        next(it), next(it), next(it), next(it)
    )
    dtb_ref, dlb_ref, dts_in_ref, dls_in_ref, sm_ref, base_ref, ngadd_ref = (
        next(it), next(it), next(it), next(it), next(it), next(it), next(it)
    )
    lamf_ref, tf_ref, af_ref, mbf_ref = (
        next(it), next(it), next(it), next(it)
    )
    lams_f_ref, ts_f_ref, sc_f_ref, ms_f_ref = (
        next(it), next(it), next(it), next(it)
    )
    Ll_in_ref, Lxx_in_ref, Pb_in_ref, F_ref, b_ref = (
        next(it), next(it), next(it), next(it), next(it)
    )
    (z_ref, pi_ref, dt2b_ref, dl2b_ref, dt2s_ref, dl2s_ref,
     amin_ref, s0_ref, s1_ref, s2_ref) = (
        next(it), next(it), next(it), next(it), next(it), next(it),
        next(it), next(it), next(it), next(it)
    )
    (px_c, ll_s, eu_s, px_s, cob_s, cos_s, x_c, ge_s) = (
        next(it), next(it), next(it), next(it), next(it), next(it),
        next(it), next(it)
    )

    s = pl.program_id(1)
    NB2 = 2 * NB
    NS4 = 4 * NS

    @pl.when(s <= N)
    def _():
        k = N - s
        lam = lamb_ref[0, 0]
        t = tb_ref[0, 0]
        A = ab_ref[0, 0]
        mb = mb_b_ref[0, 0]
        sm = sm_ref[0, 0]
        # box centering correction (d_aux_ip_soft_lib4.c corrector)
        t_inv, lamt = _t_inv_lamt(lam, t, mb)
        dl2b = t_inv * (sm - dlb_ref[0, 0] * dtb_ref[0, 0]) * mb
        cob_s[pl.ds(k, 1), :, :] = _cat_slab([dl2b[i] for i in range(NB2)])
        _, qx0 = _qx_fold(NB, False, lam, t, mb, A, None)
        qx_f = qx0 + (dl2b[NB:] - dl2b[:NB]) * mb[:NB]

        ms = ms_b_ref[0, 0]
        S = _soft_schur(NS, lams_b_ref[0, 0], ts_b_ref[0, 0], ms,
                        sc_b_ref[0, 0])
        Qx_s, qx_s = _soft_qx(NS, ms, S)
        dl2s = S["t_inv_s"] * (
            sm - dls_in_ref[0, 0] * dts_in_ref[0, 0]
        ) * S["ms4"]
        cos_s[pl.ds(k, 1), :, :] = _cat_slab([dl2s[i] for i in range(NS4)])
        if exact:
            d0, d1, d2, d3 = _soft4(dl2s, NS)
            rqx0c = d0 - S["rQx0"] * (d0 + d2) * S["Zl0"]
            rqx1c = d1 - S["rQx1"] * (d1 + d3) * S["Zl1"]
            qx_s2 = qx_s + (rqx1c - rqx0c) * ms
        else:  # reference compat (stale-pointer bug, see ipm_soft)
            qx_s2 = qx_s

        ge_s[:] = base_ref[0, 0]
        _scatter_add_box(ge_s, idxb_ref, qx_f, NB, k)
        _scatter_add_box(ge_s, idxs_ref, qx_s2, NS, k)
        if ng_stage_ids:
            stage_match = None
            for stg in ng_stage_ids:
                m = (s == N - stg)
                stage_match = m if stage_match is None else (
                    stage_match | m
                )

            @pl.when(stage_match)
            def _():
                ge_s[:] = ge_s[:] + ngadd_ref[0, 0]

        # retained-factor backward substitution (stage k)
        Ll = _mat(Ll_in_ref, NZ, NU)
        Dinv_u = _dinv_ll(Ll, NU)
        g = [ge_s[i] for i in range(NZ)]
        F = _mat(F_ref, NZ, NX)
        Pb = _vec(Pb_in_ref, NX)
        Pbpx = [Pb[i] + px_c[i] for i in range(NX)]
        eu, px = _trs_stage(NU, NX, NZ, Ll, Dinv_u, g, F, Pbpx, s == 0)

        ll_s[pl.ds(k, 1), :, :] = _cat_slab(
            [Ll[i][j] for i in range(NZ) for j in range(NU)]
        )
        eu_s[pl.ds(k, 1), :, :] = _cat_slab(eu)
        px_s[pl.ds(k, 1), :, :] = _cat_slab(px)
        for i in range(NX):
            px_c[i] = px[i]

    @pl.when(s > N)
    def _():
        sb = s - (N + 1)
        lslab = ll_s[pl.ds(sb, 1), :, :]
        Ll = [
            [lslab[0, (i * NU + j) * SUBS : (i * NU + j + 1) * SUBS, :]
             for j in range(NU)]
            for i in range(NZ)
        ]
        eslab = eu_s[pl.ds(sb, 1), :, :]
        eu = [eslab[0, i * SUBS : (i + 1) * SUBS, :] for i in range(NU)]
        pslab = px_s[pl.ds(sb, 1), :, :]
        px = [pslab[0, i * SUBS : (i + 1) * SUBS, :] for i in range(NX)]
        Lxx = _mat(Lxx_in_ref, NX, NX)
        Dinv_u = _dinv_ll(Ll, NU)

        @pl.when(sb == 0)
        def _():
            x0 = _root_x0(Lxx, px, NX)
            for i in range(NX):
                x_c[i] = x0[i]

        x = [x_c[i] for i in range(NX)]
        # pi_{sb-1} (dead write at sb == 0, overwritten before copy-out)
        for i, v in enumerate(_pi_of_x(NX, Lxx, px, x)):
            pi_ref[0, 0, i] = v
        u = _u_of_x(NU, NX, Ll, Dinv_u, eu, x)
        for i in range(NU):
            z_ref[0, 0, i] = u[i]
        for i in range(NX):
            z_ref[0, 0, NU + i] = x[i]

        F = _mat(F_ref, NZ, NX)
        bb = _vec(b_ref, NX)
        xn = _x_next_of(NU, NX, F, bb, u, x)
        for j in range(NX):
            x_c[j] = xn[j]

        cbslab = cob_s[pl.ds(sb, 1), :, :]
        dl2b = jnp.concatenate(
            [cbslab[0, i * SUBS : (i + 1) * SUBS, :][None]
             for i in range(NB2)], axis=0,
        )
        csslab = cos_s[pl.ds(sb, 1), :, :]
        dl2s = jnp.concatenate(
            [csslab[0, i * SUBS : (i + 1) * SUBS, :][None]
             for i in range(NS4)], axis=0,
        )
        _soft_alpha_from_out(
            NB, NS, NZ, idxb_ref, idxs_ref, sb, z_ref,
            lamf_ref[0, 0], tf_ref[0, 0], af_ref[0, 0], mbf_ref[0, 0],
            lams_f_ref[0, 0], ts_f_ref[0, 0], ms_f_ref[0, 0],
            sc_f_ref[0, 0], dl2b, dl2s,
            dt2b_ref, dl2b_ref, dt2s_ref, dl2s_ref,
            amin_ref, s0_ref, s1_ref, s2_ref,
        )


@functools.partial(
    jax.jit,
    static_argnames=("ng_stage_ids", "NB", "NS", "NU", "NZ", "NX",
                     "exact"),
)
def solve_soft_mega(idxb_tab, idxs_tab, fstate, lam, t, A, mb,
                    lam_s, t_s, soft_c, ms, dtb_l, dlb_l, dts_l, dls_l,
                    sm_l, base, ngaddl, ng_stage_ids, Fl, bl,
                    NB, NS, NU, NZ, NX, exact):
    """Fused soft corrector-gradient + trs + fwd + corrector alpha.

    The soft twin of :func:`solve_mega`.  ``dtb_l/dlb_l/dts_l/dls_l`` are
    factor_solve_soft_mega's affine direction streams.  Returns
    (z2_l, pi2_l, dt2b, dl2b, dt2s, dl2s, amin, s0, s1, s2)."""
    Ll_l, Lxx_l, Pb_l = fstate
    nb, Np1 = lam.shape[0], lam.shape[1]
    N = Np1 - 1
    dt = lam.dtype
    NB2 = 2 * NB
    NS4 = 4 * NS

    def bwd(bb, s):
        return (bb, jnp.where(s <= N, N - s, 0), 0, 0, 0)

    def fwd(bb, s):
        return (bb, jnp.where(s > N, jnp.maximum(s - (N + 1), 0), 0),
                0, 0, 0)

    def kspec(K, map_fn):
        return pl.BlockSpec((1, 1, K, SUBS, LANES), map_fn,
                            memory_space=pltpu.VMEM)

    def ng_slot(s):
        slot = 0
        for k, stg in enumerate(ng_stage_ids):
            slot = jnp.where((N - s) == stg, k, slot)
        return slot

    def ispec(K):
        return pl.BlockSpec((Np1, K), lambda bb, s: (0, 0),
                            memory_space=pltpu.SMEM)

    sm_spec = pl.BlockSpec((1, 1, SUBS, LANES),
                           lambda bb, s: (bb, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec(
        (1, 1, SUBS, LANES), lambda bb, s: fwd(bb, s)[:2] + (0, 0),
        memory_space=pltpu.VMEM,
    )

    args = [idxb_tab, idxs_tab,
            lam, t, A, mb, lam_s, t_s, soft_c, ms,
            dtb_l, dlb_l, dts_l, dls_l, sm_l, base, ngaddl,
            lam, t, A, mb, lam_s, t_s, soft_c, ms,
            Ll_l, Lxx_l, Pb_l, Fl, bl]
    in_specs = [
        ispec(NB), ispec(NS),
        kspec(NB2, bwd), kspec(NB2, bwd), kspec(NB2, bwd), kspec(NB2, bwd),
        kspec(4 * NS, bwd), kspec(4 * NS, bwd), kspec(6 * NS, bwd),
        kspec(NS, bwd),
        kspec(NB2, bwd), kspec(NB2, bwd), kspec(NS4, bwd), kspec(NS4, bwd),
        sm_spec, kspec(NZ, bwd),
        pl.BlockSpec((1, 1, NZ, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(s <= N, ng_slot(s), 0),
                                    0, 0, 0),
                     memory_space=pltpu.VMEM),
        kspec(NB2, fwd), kspec(NB2, fwd), kspec(NB2, fwd), kspec(NB2, fwd),
        kspec(4 * NS, fwd), kspec(4 * NS, fwd), kspec(6 * NS, fwd),
        kspec(NS, fwd),
        pl.BlockSpec((1, 1, NZ, NU, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(s <= N, N - s, 0),
                                    0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(
                         s > N, jnp.maximum(s - (N + 1), 0), 0),
                         0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(
                         s <= N, jnp.clip(N - s, 0, N - 1), 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.clip(
                         jnp.where(s <= N, N - s, s - (N + 1)), 0, N - 1
                     ), 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(
                         s > N, jnp.clip(s - (N + 1), 0, N - 1), 0),
                         0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        kspec(NZ, fwd),
        pl.BlockSpec((1, 1, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(
                         s > N, jnp.clip(s - (N + 2), 0, N - 1), 0),
                         0, 0, 0),
                     memory_space=pltpu.VMEM),
        kspec(NB2, fwd), kspec(NB2, fwd),
        kspec(NS4, fwd), kspec(NS4, fwd),
        r_spec, r_spec, r_spec, r_spec,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, N, NX, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, NB2, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, NB2, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, NS4, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, NS4, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
    ]
    kernel = functools.partial(
        _soft_trs_mega_kernel, NB, NS, NU, NX, NZ, N,
        tuple(ng_stage_ids), exact,
    )
    outs = pcall(
        kernel,
        grid=(nb, 2 * Np1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((NX, SUBS, LANES), dt),             # px carry
            pltpu.VMEM((Np1, NZ * NU * SUBS, LANES), dt),  # Ll slab
            pltpu.VMEM((Np1, NU * SUBS, LANES), dt),       # eu slab
            pltpu.VMEM((Np1, NX * SUBS, LANES), dt),       # px slab
            pltpu.VMEM((Np1, NB2 * SUBS, LANES), dt),      # box corr slab
            pltpu.VMEM((Np1, NS4 * SUBS, LANES), dt),      # soft corr slab
            pltpu.VMEM((NX, SUBS, LANES), dt),             # x carry
            pltpu.VMEM((NZ, SUBS, LANES), dt),             # geff scratch
        ],
    )(*args)
    return outs
