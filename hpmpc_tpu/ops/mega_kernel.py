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
    LANES, SUBS, _cat_slab, _dinv_ll, _folded_bwd_core, _mat, _pi_of_x,
    _root_x0, _sym_idx, _sym_nt, _trs_stage, _u_of_x, _vec, _x_next_of,
)
from .step_kernel import (
    _alpha_store, _corr_co_qx, _dt_dlam, _gather_box, _qx_fold,
    _scatter_add_box,
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
    outs = pl.pallas_call(
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
    outs = pl.pallas_call(
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
