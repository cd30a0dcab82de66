"""Pallas TPU kernels for the IPM step primitives (box-constraint streams).

The reference vectorizes the elementwise-over-constraints IPM work as a
family of AVX/NEON primitives (``mpc_solvers/avx/d_aux_ip_hard_lib4.c:248``,
portable twins in ``mpc_solvers/c99/``; census ``include/mpc_aux.h:33-103``):
``d_update_hessian_gradient_res_*`` (barrier diag/gradient from slacks),
``d_compute_alpha_res_*`` (fraction-to-boundary line search),
``d_compute_centering_correction_res_*`` / ``d_update_gradient_res_*``
(corrector rhs), ``d_update_var_res_*`` (damped iterate update) and
``d_res_res_mpc_hard_tv`` (exact KKT residuals,
``mpc_solvers/{c99,avx}/d_res_ip_res_hard.c:39``).

Here the same step phases run as Pallas kernels over the LANES-RESIDENT
loop state of :mod:`hpmpc_tpu.models.ipm_lanes`: every (B, k) stream lives
as ``(nb, N+1, k, 8, 128)`` tiles (instances in the vector lanes, one
(8,128) tile per constraint slot per stage), so

  * the box gather/scatter between z-space and constraint-space is a
    handful of *dynamic tile indexes* from an SMEM index table (the flat
    engine's 0/1 selection-matrix matmuls at HIGHEST precision cost ~6
    MXU passes each; a tile index is free);
  * the ~30 elementwise passes + reductions XLA runs per iteration fuse
    into one VMEM-resident pass per phase;
  * the fraction-to-boundary min-reduction and the duality-gap sums are
    accumulated per stage in-kernel and finished on (nb, N+1, 8, 128)
    partials by XLA (tiny).

General (ng) constraint streams are NOT handled here: at realistic sizes
they are a few (B, NG) vectors on a few stages — the XLA einsum path in
``ipm_lanes`` costs nothing and keeps these kernels single-purpose.

Layout invariants (shared with ops/stage_kernel.py):
  - box streams are stage-major: slot k in [0, NB) is the LOWER bound of
    box constraint k, slot NB + k the UPPER bound (the flat engine's
    [lower-all; upper-all] split becomes per-stage [lower; upper]);
  - ``idx_tab[n, k]`` (int32, SMEM) is the z-slot of box variable k at
    stage n in [0, NZ); padded constraints point at slot 0 and carry a
    zero mask, so their scattered contribution is exactly 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stage_kernel import LANES, SUBS, pcall

# ---------------------------------------------------------------------------
# shared in-kernel box math (trace-time helpers on (k, 8, 128) bulk arrays)
# ---------------------------------------------------------------------------


def _t_inv_lamt(lam, t, mb):
    """Masked 1/t and lam/t (the reference's Qx diagonal pieces)."""
    rec = 1.0 / jnp.where(mb > 0, t, 1.0)
    t_inv = rec * mb
    return t_inv, lam * t_inv


def _qx_fold(NB, phase2, lam, t, mb, A, M):
    """(Qx_fold, qx_fold) per box variable, both (NB, 8, 128), masked.

    Phase 1 (delta formulation, A = d_cat):
        qx = fold(-sgn*lam - lamt*d_cat)
    Phase 2 (residual formulation, A = rd, M = rm):
        qx = fold(sgn*t_inv*rm - lamt*rd)
    sgn is +1 on the lower half, -1 on the upper half; fold = lo + up.
    """
    t_inv, lamt = _t_inv_lamt(lam, t, mb)
    if phase2:
        q_lo = t_inv[:NB] * M[:NB] - lamt[:NB] * A[:NB]
        q_up = -t_inv[NB:] * M[NB:] - lamt[NB:] * A[NB:]
    else:
        q_lo = -lam[:NB] - lamt[:NB] * A[:NB]
        q_up = lam[NB:] - lamt[NB:] * A[NB:]
    mbl = mb[:NB]
    return (lamt[:NB] + lamt[NB:]) * mbl, (q_lo + q_up) * mbl


def _gather_box(ref, idx_ref, NB, row=0):
    """z-space block ref (1, 1, NZ, 8, 128) -> (NB, 8, 128) gathered via
    the SMEM index table (dynamic tile loads).  ``idx_ref`` holds the FULL
    (N+1, NB) table (Mosaic requires whole-array SMEM blocks when the row
    count isn't a sublane multiple); ``row`` selects this grid step's
    stage."""
    rows = [ref[0, 0, pl.ds(idx_ref[row, k], 1)] for k in range(NB)]
    return jnp.concatenate(rows, axis=0)


def _scatter_add_box(ref, idx_ref, v, NB, row=0):
    """ref slots += v[k] (dynamic tile RMW) — ref is a (1, 1, NZ, 8, 128)
    output block or a (NZ, 8, 128) VMEM scratch.  Padded constraints
    carry v[k] == 0 and point at slot 0 (harmless).  ``row`` as in
    :func:`_gather_box`."""
    blocked = len(ref.shape) > 3
    for k in range(NB):
        sl = pl.ds(idx_ref[row, k], 1)
        if blocked:
            ref[0, 0, sl] = ref[0, 0, sl] + v[k : k + 1]
        else:
            ref[sl] = ref[sl] + v[k : k + 1]


def _dt_dlam(NB, phase2, lam, t, mb, A, M, zb, dl0):
    """Box (dt, dlam) for a direction whose gathered z-values are ``zb``
    (phase 1: the full affine/corrector iterate; phase 2: the delta).

    Phase 1: dt = (sgn*(zb2 - d_cat) - t) * mb ; dlam = (dl0 - lamt*dt - lam) * mb
    Phase 2: dt = sgn*(zb2 - rd) * mb          ; dlam = -t_inv*(lam*dt + M) * mb
    (``M`` is rm/rm2 in phase 2; ``dl0`` is 0 or the phase-1 centering
    correction dl2.)"""
    t_inv, lamt = _t_inv_lamt(lam, t, mb)
    if phase2:
        dt_lo = (zb - A[:NB]) * mb[:NB]
        dt_up = (A[NB:] - zb) * mb[NB:]
        dt = jnp.concatenate([dt_lo, dt_up], axis=0)
        dlam = -t_inv * (lam * dt + M) * mb
    else:
        dt_lo = ((zb - A[:NB]) - t[:NB]) * mb[:NB]
        dt_up = ((A[NB:] - zb) - t[NB:]) * mb[NB:]
        dt = jnp.concatenate([dt_lo, dt_up], axis=0)
        dlam = (dl0 - lamt * dt - lam) * mb
    return dt, dlam


def _alpha_cands(v, dv, mb):
    """Fraction-to-boundary candidates: -v/dv where dv < 0 (masked)."""
    pred = (dv < 0.0) & (mb > 0.0)
    return jnp.where(pred, -v / jnp.where(pred, dv, -1.0), jnp.inf)


def _alpha_store(lam, t, mb, dt_b, dl_b,
                 dt_ref, dl_ref, amin_ref, s0_ref, s1_ref, s2_ref):
    """Store the direction streams and the per-stage alpha/mu-sum
    partials (shared tail of the alpha kernels and the mega twins)."""
    dt_ref[0, 0] = dt_b
    dl_ref[0, 0] = dl_b
    cand = jnp.minimum(
        _alpha_cands(lam, dl_b, mb), _alpha_cands(t, dt_b, mb)
    )
    amin_ref[0, 0] = jnp.min(cand, axis=0)
    # mu(alpha) = (S0 + a*S1 + a^2*S2) / n_constr, accumulated masked:
    s0_ref[0, 0] = jnp.sum(lam * t * mb, axis=0)
    s1_ref[0, 0] = jnp.sum(lam * dt_b + t * dl_b, axis=0)
    s2_ref[0, 0] = jnp.sum(dl_b * dt_b, axis=0)


def _corr_co_qx(NB, phase2, lam, t, mb, A, M, dtb, dlb, sm):
    """Centering/corrector stream + corrected gradient fold (shared by
    _corr_kernel and the mega trs twin).  Returns (co, qx_f)."""
    t_inv, lamt = _t_inv_lamt(lam, t, mb)
    if phase2:
        # rm2 = rm + (dt*dl - sigma*mu); qx2 = fold(sgn*t_inv*rm2 - lamt*rd)
        co = (M + (dtb * dlb - sm)) * mb
        _, qx_f = _qx_fold(NB, True, lam, t, mb, A, co)
    else:
        # dl2 = t_inv*(sigma*mu - dl*dt); qx2 = qx + fold(-sgn*dl2)
        co = t_inv * (sm - dlb * dtb) * mb
        _, qx0 = _qx_fold(NB, False, lam, t, mb, A, None)
        qx_f = qx0 + (co[NB:] - co[:NB]) * mb[:NB]
    return co, qx_f


# ---------------------------------------------------------------------------
# S1: barrier diag + effective gradient (d_update_hessian_gradient_res_*)
# ---------------------------------------------------------------------------


def _prep_kernel(NB, NZ, phase2, has_m,
                 idx_ref, lam_ref, t_ref, a_ref, *rest):
    if has_m:
        m_ref, base_ref, pd_ref, mb_ref, dvec_ref, geff_ref = rest
        M = m_ref[0, 0]
    else:
        base_ref, pd_ref, mb_ref, dvec_ref, geff_ref = rest
        M = None
    lam = lam_ref[0, 0]
    t = t_ref[0, 0]
    A = a_ref[0, 0]
    mb = mb_ref[0, 0]

    Qx_f, qx_f = _qx_fold(NB, phase2, lam, t, mb, A, M)

    row = pl.program_id(1)
    dvec_ref[0, 0] = pd_ref[0, 0]
    _scatter_add_box(dvec_ref, idx_ref, Qx_f, NB, row)
    geff_ref[0, 0] = base_ref[0, 0]
    _scatter_add_box(geff_ref, idx_ref, qx_f, NB, row)


@functools.partial(jax.jit, static_argnames=("NB", "NZ", "phase2"))
def prep_flat(idx_tab, lam, t, A, M, mb, base, pdreg, NB, NZ, phase2):
    """Barrier Hessian diag (z-space) + effective gradient, one pass.

    lam/t/A/M/mb: (nb, N+1, 2NB, 8, 128) stage-major box streams
    (A = d_cat phase 1, rd phase 2; M = rm, phase 2 only, else None);
    base: (nb, N+1, NZ, 8, 128) gradient base (g or rq);
    pdreg: pad_diag + reg, same shape.  Returns (dvec_l, geff_l)."""
    nb, Np1 = lam.shape[0], lam.shape[1]
    dt = lam.dtype
    NB2 = 2 * NB

    box_spec = pl.BlockSpec((1, 1, NB2, SUBS, LANES),
                            lambda bb, s: (bb, s, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    z_spec = pl.BlockSpec((1, 1, NZ, SUBS, LANES),
                          lambda bb, s: (bb, s, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((Np1, NB), lambda bb, s: (0, 0),
                            memory_space=pltpu.SMEM)

    has_m = M is not None
    args = [idx_tab, lam, t, A] + ([M] if has_m else []) + [base, pdreg, mb]
    in_specs = [idx_spec, box_spec, box_spec, box_spec] + \
        ([box_spec] if has_m else []) + [z_spec, z_spec, box_spec]

    kernel = functools.partial(_prep_kernel, NB, NZ, phase2, has_m)
    dvec_l, geff_l = pcall(
        kernel,
        grid=(nb, Np1),
        in_specs=in_specs,
        out_specs=[z_spec, z_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
        ],
    )(*args)
    return dvec_l, geff_l


# ---------------------------------------------------------------------------
# S2/S4: direction slack/multiplier steps, alpha, and the duality-gap sums
# (d_compute_alpha_res_* + d_compute_mu_res_* expanded in alpha)
# ---------------------------------------------------------------------------


def _alpha_kernel(NB, NZ, phase2, has_m, has_dl0,
                  idx_ref, dz_ref, lam_ref, t_ref, a_ref, *rest):
    rest = list(rest)
    M = rest.pop(0)[0, 0] if has_m else None
    dl0 = rest.pop(0)[0, 0] if has_dl0 else 0.0
    mb_ref, dt_ref, dl_ref, amin_ref, s0_ref, s1_ref, s2_ref = rest
    lam = lam_ref[0, 0]
    t = t_ref[0, 0]
    A = a_ref[0, 0]
    mb = mb_ref[0, 0]

    zb = _gather_box(dz_ref, idx_ref, NB, pl.program_id(1))
    dt_b, dl_b = _dt_dlam(NB, phase2, lam, t, mb, A, M, zb, dl0)
    _alpha_store(lam, t, mb, dt_b, dl_b,
                 dt_ref, dl_ref, amin_ref, s0_ref, s1_ref, s2_ref)


@functools.partial(
    jax.jit, static_argnames=("NB", "NZ", "phase2")
)
def alpha_sums_flat(idx_tab, dz_l, lam, t, A, M, dl0, mb, NB, NZ, phase2):
    """Box (dt, dlam) streams for direction ``dz_l`` plus the per-stage
    fraction-to-boundary minima and duality-gap sum partials.

    Returns (dt_l, dl_l, amin, s0, s1, s2) with the last four shaped
    (nb, N+1, 8, 128); callers finish with a min/sum over stage axis 1 and
    ``mu(a) = (s0 + a*s1 + a^2*s2) / n_constr``.  ``dl0`` is the phase-1
    centering-correction stream (corrector pass) or None; ``M`` is the
    rm/rm2 stream in phase 2."""
    nb, Np1 = lam.shape[0], lam.shape[1]
    dt = lam.dtype
    NB2 = 2 * NB

    box_spec = pl.BlockSpec((1, 1, NB2, SUBS, LANES),
                            lambda bb, s: (bb, s, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    z_spec = pl.BlockSpec((1, 1, NZ, SUBS, LANES),
                          lambda bb, s: (bb, s, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((1, 1, SUBS, LANES),
                          lambda bb, s: (bb, s, 0, 0),
                          memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((Np1, NB), lambda bb, s: (0, 0),
                            memory_space=pltpu.SMEM)

    has_m = M is not None
    has_dl0 = dl0 is not None
    args = [idx_tab, dz_l, lam, t, A]
    in_specs = [idx_spec, z_spec, box_spec, box_spec, box_spec]
    if has_m:
        args.append(M)
        in_specs.append(box_spec)
    if has_dl0:
        args.append(dl0)
        in_specs.append(box_spec)
    args.append(mb)
    in_specs.append(box_spec)

    kernel = functools.partial(
        _alpha_kernel, NB, NZ, phase2, has_m, has_dl0
    )
    outs = pcall(
        kernel,
        grid=(nb, Np1),
        in_specs=in_specs,
        out_specs=[box_spec, box_spec, r_spec, r_spec, r_spec, r_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nb, Np1, NB2, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NB2, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
        ],
    )(*args)
    return outs


# ---------------------------------------------------------------------------
# S3: centering/corrector gradient (d_compute_centering_correction_res_* +
# d_update_gradient_res_*): corrector stream + second effective gradient
# ---------------------------------------------------------------------------


def _corr_kernel(NB, NZ, phase2, has_m,
                 idx_ref, lam_ref, t_ref, a_ref, *rest):
    rest = list(rest)
    M = rest.pop(0)[0, 0] if has_m else None
    (dtb_ref, dlb_ref, sm_ref, base_ref, mb_ref,
     geff_ref, co_ref) = rest
    lam = lam_ref[0, 0]
    t = t_ref[0, 0]
    A = a_ref[0, 0]
    mb = mb_ref[0, 0]
    dtb = dtb_ref[0, 0]
    dlb = dlb_ref[0, 0]
    sm = sm_ref[0, 0]  # (8, 128), broadcasts over slots

    co, qx_f = _corr_co_qx(NB, phase2, lam, t, mb, A, M, dtb, dlb, sm)
    co_ref[0, 0] = co

    geff_ref[0, 0] = base_ref[0, 0]
    _scatter_add_box(geff_ref, idx_ref, qx_f, NB, pl.program_id(1))


@functools.partial(jax.jit, static_argnames=("NB", "NZ", "phase2"))
def corr_geff_flat(idx_tab, lam, t, A, M, dtb_l, dlb_l, sm_l, base, mb,
                   NB, NZ, phase2):
    """Corrector stream + second effective gradient in one pass.

    Returns (geff2_l, co_l): ``co_l`` is the phase-1 centering correction
    dl2 or the phase-2 corrected complementarity residual rm2 (both
    consumed by the corrector ``alpha_sums_flat`` pass).  ``sm_l`` is
    sigma*mu as an (nb, 1, 8, 128) lanes scalar."""
    nb, Np1 = lam.shape[0], lam.shape[1]
    dt = lam.dtype
    NB2 = 2 * NB

    box_spec = pl.BlockSpec((1, 1, NB2, SUBS, LANES),
                            lambda bb, s: (bb, s, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    z_spec = pl.BlockSpec((1, 1, NZ, SUBS, LANES),
                          lambda bb, s: (bb, s, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    sm_spec = pl.BlockSpec((1, 1, SUBS, LANES),
                           lambda bb, s: (bb, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((Np1, NB), lambda bb, s: (0, 0),
                            memory_space=pltpu.SMEM)

    has_m = M is not None
    args = [idx_tab, lam, t, A] + ([M] if has_m else []) + \
        [dtb_l, dlb_l, sm_l, base, mb]
    in_specs = [idx_spec, box_spec, box_spec, box_spec] + \
        ([box_spec] if has_m else []) + \
        [box_spec, box_spec, sm_spec, z_spec, box_spec]

    kernel = functools.partial(_corr_kernel, NB, NZ, phase2, has_m)
    geff2_l, co_l = pcall(
        kernel,
        grid=(nb, Np1),
        in_specs=in_specs,
        out_specs=[z_spec, box_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NB2, SUBS, LANES), dt),
        ],
    )(*args)
    return geff2_l, co_l


# ---------------------------------------------------------------------------
# S6: full KKT residual assembly (d_res_res_mpc_hard_tv twin,
# mpc_solvers/{c99,avx}/d_res_ip_res_hard.c:39) on lanes streams
# ---------------------------------------------------------------------------


def _resid_kernel(NB, NU, NX, NZ, N,
                  idx_ref, H_ref, F_ref, z_ref, zn_ref, pi_ref, pip_ref,
                  g_ref, b_ref, lam_ref, t_ref, dcat_ref, mb_ref,
                  zm_ref, xm_ref,
                  rq_ref, rb_ref, rd_ref, rm_ref, musum_ref):
    from .stage_kernel import _mat, _mat_sym, _vec

    s = pl.program_id(1)
    interior = (s < N).astype(z_ref.dtype)  # fpi / rb only for n < N

    H = _mat_sym(H_ref, NZ)
    F = _mat(F_ref, NZ, NX)
    z = _vec(z_ref, NZ)
    piv = _vec(pi_ref, NX)
    pip = _vec(pip_ref, NX)
    g = _vec(g_ref, NZ)

    not_first = (s > 0).astype(z_ref.dtype)
    rq = []
    for i in range(NZ):
        acc = g[i]
        for j in range(NZ):
            acc = acc + H[i][j] * z[j]
        fpi = F[i][0] * piv[0]
        for x in range(1, NX):
            fpi = fpi + F[i][x] * piv[x]
        acc = acc + interior * fpi
        if i >= NU:
            acc = acc - not_first * pip[i - NU]
        rq.append(acc)
    for i in range(NZ):
        rq_ref[0, 0, i] = rq[i]

    lam = lam_ref[0, 0]
    mb = mb_ref[0, 0]
    lam_f = (lam[NB:] - lam[:NB]) * mb[:NB]  # fold(-sgn*lam)
    _scatter_add_box(rq_ref, idx_ref, lam_f, NB, s)
    rq_ref[0, 0] = rq_ref[0, 0] * zm_ref[0, 0]

    # rb_n = (b_n + F_n' z_n - x_{n+1}) * x_mask  (garbage written at the
    # dead stage-N slot; callers slice [:, :N])
    bb = _vec(b_ref, NX)
    xm = _vec(xm_ref, NX)
    for x in range(NX):
        acc = F[0][x] * z[0]
        for j in range(1, NZ):
            acc = acc + F[j][x] * z[j]
        rb_ref[0, 0, x] = (bb[x] + acc - zn_ref[0, 0, NU + x]) * xm[x]

    # box slack/complementarity residuals + the mu partial sum
    t_b = t_ref[0, 0]
    dcat = dcat_ref[0, 0]
    zb = _gather_box(z_ref, idx_ref, NB, s)
    zb2 = jnp.concatenate([zb, zb], axis=0)
    sg = jnp.concatenate(
        [jnp.ones_like(zb), -jnp.ones_like(zb)], axis=0
    )
    rd = (dcat - zb2 + sg * t_b) * mb
    rm = lam * t_b * mb
    rd_ref[0, 0] = rd
    rm_ref[0, 0] = rm
    musum_ref[0, 0] = jnp.sum(rm, axis=0)


@functools.partial(jax.jit, static_argnames=("NB", "NU", "NZ", "NX"))
def resid_full_flat(idx_tab, Hl, Fl, z_l, pi_l, gl, bl, lam, t, dcat, mb,
                    zmask_l, xmask_l, NB, NU, NZ, NX):
    """Exact KKT residuals, assembled fully in-kernel on lanes streams.

    Returns (rq_l, rb_l, rd_l, rm_l, musum) — rb_l is (nb, N+1, NX, 8, 128)
    with a garbage stage-N slot (slice [:, :N]); musum is the per-stage
    complementarity sum (finish with sum over stage axis / n_constr, plus
    any general-constraint terms).  The general-constraint contributions
    to rq (C' fold) are added by the caller on the lanes layout."""
    nb, Np1 = lam.shape[0], lam.shape[1]
    N = Np1 - 1
    dt = lam.dtype
    NB2 = 2 * NB
    NT = Hl.shape[2]

    box_spec = pl.BlockSpec((1, 1, NB2, SUBS, LANES),
                            lambda bb, s: (bb, s, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    z_spec = pl.BlockSpec((1, 1, NZ, SUBS, LANES),
                          lambda bb, s: (bb, s, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    zn_spec = pl.BlockSpec((1, 1, NZ, SUBS, LANES),
                           lambda bb, s: (bb, jnp.clip(s + 1, 0, N), 0, 0, 0),
                           memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, 1, NX, SUBS, LANES),
                          lambda bb, s: (bb, jnp.clip(s, 0, N - 1), 0, 0, 0),
                          memory_space=pltpu.VMEM)
    xp_spec = pl.BlockSpec((1, 1, NX, SUBS, LANES),
                           lambda bb, s: (bb, jnp.clip(s - 1, 0, N - 1), 0, 0, 0),
                           memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((1, 1, NT, SUBS, LANES),
                          lambda bb, s: (bb, s, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES),
                          lambda bb, s: (bb, jnp.clip(s, 0, N - 1), 0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((1, 1, SUBS, LANES),
                          lambda bb, s: (bb, s, 0, 0),
                          memory_space=pltpu.VMEM)
    rbo_spec = pl.BlockSpec((1, 1, NX, SUBS, LANES),
                            lambda bb, s: (bb, s, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((Np1, NB), lambda bb, s: (0, 0),
                            memory_space=pltpu.SMEM)

    kernel = functools.partial(_resid_kernel, NB, NU, NX, NZ, N)
    rq_l, rb_l, rd_l, rm_l, musum = pcall(
        kernel,
        grid=(nb, Np1),
        in_specs=[idx_spec, h_spec, f_spec, z_spec, zn_spec, x_spec,
                  xp_spec, z_spec, x_spec, box_spec, box_spec, box_spec,
                  box_spec, z_spec, x_spec],
        out_specs=[z_spec, rbo_spec, box_spec, box_spec, r_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NX, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NB2, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NB2, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
        ],
    )(idx_tab, Hl, Fl, z_l, z_l, pi_l, pi_l, gl, bl, lam, t, dcat, mb,
      zmask_l, xmask_l)
    return rq_l, rb_l, rd_l, rm_l, musum


# ---------------------------------------------------------------------------
# SOFT-constraint step kernels (d_ip2_mpc_soft_tv twins: the 4-slack-family
# step primitives of mpc_solvers/{c99,avx}/d_aux_ip_soft_lib4.c, including
# the per-iteration slack Schur elimination at :167 and the corrector
# gradient at :508).  The soft Schur quantities (Zl, zl, lamt families) are
# cheap elementwise functions of the state and constants, so every kernel
# RECOMPUTES them instead of streaming them between kernels.
#
# Extra layout invariants:
#   - soft streams are stage-major 4-family blocks (nb, N+1, 4*NS, 8, 128)
#     ordered [lo; up; s_lo; s_up];
#   - soft constants pack as ONE (nb, N+1, 6*NS, 8, 128) stream ordered
#     [d_lbs; d_ubs; Z0; Z1; zlin0; zlin1];
#   - ``idxs_tab[n, k]`` is the PADDED-z coordinate of soft variable k at
#     stage n (the engine's idxbs_static); padded entries point at 0 with
#     a zero ms mask.
# ---------------------------------------------------------------------------


def _soft4(a, NS):
    return a[:NS], a[NS : 2 * NS], a[2 * NS : 3 * NS], a[3 * NS :]


def _soft_schur(NS, lam_s, t_s, ms, c):
    """Per-stage soft slack Schur elimination; returns the dict of every
    quantity the step formulas consume."""
    dlbs = c[:NS]
    dubs = c[NS : 2 * NS]
    Z0 = c[2 * NS : 3 * NS]
    Z1 = c[3 * NS : 4 * NS]
    zl0F = c[4 * NS : 5 * NS]
    zl1F = c[5 * NS :]
    ms4 = jnp.concatenate([ms, ms, ms, ms], axis=0)
    rec = 1.0 / jnp.where(ms4 > 0, t_s, 1.0)
    t_inv_s = rec * ms4
    lamt_s = lam_s * t_inv_s
    lts0, lts1, lts2, lts3 = _soft4(lamt_s, NS)
    ls0, ls1, ls2, ls3 = _soft4(lam_s, NS)
    rQx0, rQx1 = lts0, lts1
    rqx0 = ls0 + lts0 * dlbs
    rqx1 = ls1 - lts1 * dubs
    Zl0 = jnp.where(ms > 0, 1.0 / jnp.where(ms > 0, Z0 + rQx0 + lts2, 1.0),
                    0.0)
    Zl1 = jnp.where(ms > 0, 1.0 / jnp.where(ms > 0, Z1 + rQx1 + lts3, 1.0),
                    0.0)
    zl0 = -zl0F + rqx0 + ls2
    zl1 = -zl1F + rqx1 + ls3
    return dict(
        ms4=ms4, t_inv_s=t_inv_s, lamt_s=lamt_s,
        lts=(lts0, lts1, lts2, lts3),
        rQx0=rQx0, rQx1=rQx1, rqx0=rqx0, rqx1=rqx1,
        Zl0=Zl0, Zl1=Zl1, zl0=zl0, zl1=zl1,
        dlbs=dlbs, dubs=dubs,
    )


def _soft_qx(NS, ms, S):
    """(Qx_s, qx_s) per soft variable from the Schur dict."""
    rqx0e = S["rqx0"] - S["rQx0"] * S["zl0"] * S["Zl0"]
    rqx1e = S["rqx1"] - S["rQx1"] * S["zl1"] * S["Zl1"]
    rQx0e = S["rQx0"] - S["rQx0"] * S["rQx0"] * S["Zl0"]
    rQx1e = S["rQx1"] - S["rQx1"] * S["rQx1"] * S["Zl1"]
    return (rQx0e + rQx1e) * ms, (rqx1e - rqx0e) * ms


def _soft_dt_dls(NS, lam_s, t_s, ms, S, zs, dl0_s, zl0x, zl1x):
    """Soft (dt, dlam) for gathered direction values ``zs`` against the
    CURRENT zl pair (affine: zl; corrector: zl + dl2 fold)."""
    lts0, lts1, _, _ = S["lts"]
    ms4 = S["ms4"]
    ts0, ts1, ts2, ts3 = _soft4(t_s, NS)
    ds_lo = (zl0x - lts0 * zs) * S["Zl0"]
    ds_up = (zl1x + lts1 * zs) * S["Zl1"]
    dts = jnp.concatenate([
        ds_lo + zs - S["dlbs"] - ts0,
        ds_up - zs + S["dubs"] - ts1,
        ds_lo - ts2,
        ds_up - ts3,
    ], axis=0) * ms4
    dls = (dl0_s - S["lamt_s"] * dts - lam_s) * ms4
    return dts, dls


def _soft_prep_kernel(NB, NS, NZ,
                      idxb_ref, idxs_ref, lam_ref, t_ref, dcat_ref, mb_ref,
                      lams_ref, ts_ref, sc_ref, ms_ref, base_ref, pd_ref,
                      dvec_ref, geff_ref):
    lam = lam_ref[0, 0]
    t = t_ref[0, 0]
    A = dcat_ref[0, 0]
    mb = mb_ref[0, 0]
    Qx_f, qx_f = _qx_fold(NB, False, lam, t, mb, A, None)

    lam_s = lams_ref[0, 0]
    t_s = ts_ref[0, 0]
    ms = ms_ref[0, 0]
    S = _soft_schur(NS, lam_s, t_s, ms, sc_ref[0, 0])
    Qx_s, qx_s = _soft_qx(NS, ms, S)

    row = pl.program_id(1)
    dvec_ref[0, 0] = pd_ref[0, 0]
    _scatter_add_box(dvec_ref, idxb_ref, Qx_f, NB, row)
    _scatter_add_box(dvec_ref, idxs_ref, Qx_s, NS, row)
    geff_ref[0, 0] = base_ref[0, 0]
    _scatter_add_box(geff_ref, idxb_ref, qx_f, NB, row)
    _scatter_add_box(geff_ref, idxs_ref, qx_s, NS, row)


@functools.partial(jax.jit, static_argnames=("NB", "NS", "NZ"))
def soft_prep_flat(idxb_tab, idxs_tab, lam, t, dcat, mb,
                   lam_s, t_s, soft_c, ms, base, pdreg, NB, NS, NZ):
    """Soft-IPM barrier diag + effective gradient: box fold + slack Schur
    elimination + both scatters in one pass.  Returns (dvec_l, geff_l)."""
    nb, Np1 = lam.shape[0], lam.shape[1]
    dt = lam.dtype

    def bspec(K):
        return pl.BlockSpec((1, 1, K, SUBS, LANES),
                            lambda bb, s: (bb, s, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def ispec(K):
        return pl.BlockSpec((Np1, K), lambda bb, s: (0, 0),
                            memory_space=pltpu.SMEM)

    kernel = functools.partial(_soft_prep_kernel, NB, NS, NZ)
    dvec_l, geff_l = pcall(
        kernel,
        grid=(nb, Np1),
        in_specs=[ispec(NB), ispec(NS), bspec(2 * NB), bspec(2 * NB),
                  bspec(2 * NB), bspec(2 * NB), bspec(4 * NS),
                  bspec(4 * NS), bspec(6 * NS), bspec(NS), bspec(NZ),
                  bspec(NZ)],
        out_specs=[bspec(NZ), bspec(NZ)],
        out_shape=[
            jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
        ],
    )(idxb_tab, idxs_tab, lam, t, dcat, mb, lam_s, t_s, soft_c, ms,
      base, pdreg)
    return dvec_l, geff_l


def _soft_alpha_kernel(NB, NS, NZ, corrector,
                       idxb_ref, idxs_ref, dz_ref, lam_ref, t_ref,
                       dcat_ref, mb_ref, lams_ref, ts_ref, sc_ref, ms_ref,
                       *rest):
    rest = list(rest)
    dl0b = rest.pop(0)[0, 0] if corrector else 0.0
    dl2s = rest.pop(0)[0, 0] if corrector else None
    (dtb_ref, dlb_ref, dts_ref, dls_ref,
     amin_ref, s0_ref, s1_ref, s2_ref) = rest

    row = pl.program_id(1)
    lam = lam_ref[0, 0]
    t = t_ref[0, 0]
    A = dcat_ref[0, 0]
    mb = mb_ref[0, 0]
    zb = _gather_box(dz_ref, idxb_ref, NB, row)
    dt_b, dl_b = _dt_dlam(NB, False, lam, t, mb, A, None, zb, dl0b)
    dtb_ref[0, 0] = dt_b
    dlb_ref[0, 0] = dl_b

    lam_s = lams_ref[0, 0]
    t_s = ts_ref[0, 0]
    ms = ms_ref[0, 0]
    S = _soft_schur(NS, lam_s, t_s, ms, sc_ref[0, 0])
    zs = _gather_box(dz_ref, idxs_ref, NS, row) * ms
    if corrector:
        d0, d1, d2, d3 = _soft4(dl2s, NS)
        zl0x = S["zl0"] + d0 + d2
        zl1x = S["zl1"] + d1 + d3
        dl0_s = dl2s
    else:
        zl0x, zl1x = S["zl0"], S["zl1"]
        dl0_s = 0.0
    dt_s, dl_s = _soft_dt_dls(NS, lam_s, t_s, ms, S, zs, dl0_s, zl0x, zl1x)
    dts_ref[0, 0] = dt_s
    dls_ref[0, 0] = dl_s

    ms4 = S["ms4"]
    cand = jnp.minimum(
        jnp.minimum(_alpha_cands(lam, dl_b, mb), _alpha_cands(t, dt_b, mb)
                    ).min(axis=0),
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


@functools.partial(
    jax.jit, static_argnames=("NB", "NS", "NZ", "corrector")
)
def soft_alpha_sums_flat(idxb_tab, idxs_tab, dz_l, lam, t, dcat, mb,
                         lam_s, t_s, soft_c, ms, dl0b, dl2s,
                         NB, NS, NZ, corrector):
    """Box + soft direction steps, stage alpha minima and mu-sum partials.
    Returns (dtb, dlb, dts, dls, amin, s0, s1, s2)."""
    nb, Np1 = lam.shape[0], lam.shape[1]
    dt = lam.dtype

    def bspec(K):
        return pl.BlockSpec((1, 1, K, SUBS, LANES),
                            lambda bb, s: (bb, s, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def ispec(K):
        return pl.BlockSpec((Np1, K), lambda bb, s: (0, 0),
                            memory_space=pltpu.SMEM)

    r_spec = pl.BlockSpec((1, 1, SUBS, LANES),
                          lambda bb, s: (bb, s, 0, 0),
                          memory_space=pltpu.VMEM)

    args = [idxb_tab, idxs_tab, dz_l, lam, t, dcat, mb, lam_s, t_s,
            soft_c, ms]
    in_specs = [ispec(NB), ispec(NS), bspec(NZ), bspec(2 * NB),
                bspec(2 * NB), bspec(2 * NB), bspec(2 * NB),
                bspec(4 * NS), bspec(4 * NS), bspec(6 * NS), bspec(NS)]
    if corrector:
        args += [dl0b, dl2s]
        in_specs += [bspec(2 * NB), bspec(4 * NS)]

    kernel = functools.partial(_soft_alpha_kernel, NB, NS, NZ, corrector)
    outs = pcall(
        kernel,
        grid=(nb, Np1),
        in_specs=in_specs,
        out_specs=[bspec(2 * NB), bspec(2 * NB), bspec(4 * NS),
                   bspec(4 * NS), r_spec, r_spec, r_spec, r_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nb, Np1, 2 * NB, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, 2 * NB, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, 4 * NS, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, 4 * NS, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, SUBS, LANES), dt),
        ],
    )(*args)
    return outs


def _soft_corr_kernel(NB, NS, NZ, exact,
                      idxb_ref, idxs_ref, lam_ref, t_ref, dcat_ref, mb_ref,
                      lams_ref, ts_ref, sc_ref, ms_ref,
                      dtb_ref, dlb_ref, dts_ref, dls_ref, sm_ref, base_ref,
                      geff_ref, dl2b_ref, dl2s_ref):
    lam = lam_ref[0, 0]
    t = t_ref[0, 0]
    A = dcat_ref[0, 0]
    mb = mb_ref[0, 0]
    sm = sm_ref[0, 0]
    t_inv, lamt = _t_inv_lamt(lam, t, mb)
    dtb = dtb_ref[0, 0]
    dlb = dlb_ref[0, 0]
    dl2b = t_inv * (sm - dlb * dtb) * mb
    dl2b_ref[0, 0] = dl2b
    _, qx0 = _qx_fold(NB, False, lam, t, mb, A, None)
    qx_f = qx0 + (dl2b[NB:] - dl2b[:NB]) * mb[:NB]

    lam_s = lams_ref[0, 0]
    t_s = ts_ref[0, 0]
    ms = ms_ref[0, 0]
    S = _soft_schur(NS, lam_s, t_s, ms, sc_ref[0, 0])
    Qx_s, qx_s = _soft_qx(NS, ms, S)
    dts = dts_ref[0, 0]
    dls = dls_ref[0, 0]
    dl2s = S["t_inv_s"] * (sm - dls * dts) * S["ms4"]
    dl2s_ref[0, 0] = dl2s
    if exact:
        d0, d1, d2, d3 = _soft4(dl2s, NS)
        rqx0c = d0 - S["rQx0"] * (d0 + d2) * S["Zl0"]
        rqx1c = d1 - S["rQx1"] * (d1 + d3) * S["Zl1"]
        qx_s2 = qx_s + (rqx1c - rqx0c) * ms
    else:  # reference compat (stale-pointer bug, see ipm_soft)
        qx_s2 = qx_s

    row = pl.program_id(1)
    geff_ref[0, 0] = base_ref[0, 0]
    _scatter_add_box(geff_ref, idxb_ref, qx_f, NB, row)
    _scatter_add_box(geff_ref, idxs_ref, qx_s2, NS, row)


@functools.partial(
    jax.jit, static_argnames=("NB", "NS", "NZ", "exact")
)
def soft_corr_flat(idxb_tab, idxs_tab, lam, t, dcat, mb, lam_s, t_s,
                   soft_c, ms, dtb_l, dlb_l, dts_l, dls_l, sm_l, base,
                   NB, NS, NZ, exact):
    """Soft corrector gradient pass: centering corrections for both
    families plus the second effective gradient.  Returns
    (geff2_l, dl2b_l, dl2s_l)."""
    nb, Np1 = lam.shape[0], lam.shape[1]
    dt = lam.dtype

    def bspec(K):
        return pl.BlockSpec((1, 1, K, SUBS, LANES),
                            lambda bb, s: (bb, s, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def ispec(K):
        return pl.BlockSpec((Np1, K), lambda bb, s: (0, 0),
                            memory_space=pltpu.SMEM)

    sm_spec = pl.BlockSpec((1, 1, SUBS, LANES),
                           lambda bb, s: (bb, 0, 0, 0),
                           memory_space=pltpu.VMEM)

    kernel = functools.partial(_soft_corr_kernel, NB, NS, NZ, exact)
    geff2_l, dl2b_l, dl2s_l = pcall(
        kernel,
        grid=(nb, Np1),
        in_specs=[ispec(NB), ispec(NS), bspec(2 * NB), bspec(2 * NB),
                  bspec(2 * NB), bspec(2 * NB), bspec(4 * NS),
                  bspec(4 * NS), bspec(6 * NS), bspec(NS),
                  bspec(2 * NB), bspec(2 * NB), bspec(4 * NS),
                  bspec(4 * NS), sm_spec, bspec(NZ)],
        out_specs=[bspec(NZ), bspec(2 * NB), bspec(4 * NS)],
        out_shape=[
            jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, 2 * NB, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, 4 * NS, SUBS, LANES), dt),
        ],
    )(idxb_tab, idxs_tab, lam, t, dcat, mb, lam_s, t_s, soft_c, ms,
      dtb_l, dlb_l, dts_l, dls_l, sm_l, base)
    return geff2_l, dl2b_l, dl2s_l
