"""Flat-state batched IPM — the TPU throughput engine.

Same two-phase Mehrotra predictor-corrector as :mod:`.ipm` (the readable,
golden-parity implementation of ``mpc_solvers/d_ip2_res_hard.c:116``),
re-laid-out for TPU memory tiling.  TPU pads the trailing two dims of every
array to (8, 128) tiles, so the structured per-instance layouts cost far
more HBM than the logic requires once a batch axis is vmapped in front:

  ========================  ==================  ==========
  array                     structured layout   tile pad
  ========================  ==================  ==========
  box slacks / multipliers  (B, N+1, 2, NB)     ~65x
  iterate z                 (B, N+1, NZ)        ~12x
  Hessian H (residuals)     (B, N+1, NZ, NZ)    ~17x
  dynamics F (residuals)    (B, N, NZ, NX)      ~18x
  ========================  ==================  ==========

This module keeps every piece of loop state 2-D ``(B, flat)`` (pad ~1.2x):

  * the iterate ``zF`` is ``(B, (N+1)*NZ)``; equality multipliers ``piF``
    are ``(B, N*NX)``;
  * box slack/multiplier pairs are concatenated ``[lower; upper]`` along
    the flat axis — ``(B, 2*NBF)`` — with a sign vector ``sgn`` (+1 lower,
    -1 upper) folding the reference's per-side formulas into single
    expressions (``fold(v) = v_lo + v_up`` recovers per-variable sums);
  * box gathers use ``take_along_axis``; the scatter back into z-space is
    converted to a gather through a precomputed inverse index map (TPU
    scatters serialize, gathers vectorize);
  * general-constraint rows live only on the statically ng-active stages,
    as per-stage ``(B, NG, NZ)`` slices applied with static-slice
    gathers/scatter-adds (a dense flat row matrix would re-read
    ``B*NGF*NZF`` floats of structural zeros on every product);
  * the Riccati sweeps run in the fused Pallas stage kernels with H/F
    pre-transposed to tile-dense lanes form ONCE outside the loop and the
    retained factor kept in lanes form between sv and trs
    (:func:`~..ops.stage_kernel.factor_solve_folded_flat` /
    :func:`~..ops.stage_kernel.solve_flat`);
  * the residual matvecs (H_n z_n, F_n' z_n, F_n pi_n) run in a lanes-form
    Pallas kernel (:func:`~..ops.stage_kernel.resid_terms_flat`) instead
    of einsums over the 17-18x padded structured H/F.

Entered from :func:`hpmpc_tpu.parallel.batch.solve_batched` when
``cfg.use_pallas``, the batch is a multiple of 1024 and ``dims.idxb`` is
static.  ``warm_start`` is supported (``z0``/``pi0`` seeding — batched
RTI re-solves stay here).  ``cfg.iter_ref`` is supported: full-precision Newton
residuals are assembled term-by-term and re-solved through
``stage_kernel.solve_flat_pb`` (Pb recomputed in-kernel).  Cross-checked
against the structured path by tests/test_stage_kernel.py.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Opt-in to the fused two-phase-grid sweep kernels (sv+fwd in one
# pallas_call; trs+fwd likewise).  Interpret-mode-proven and parity-
# tested, but built during a relay outage — flip the default once one
# real-Mosaic run confirms compilation (HPMPC_FUSED_SWEEPS=1 python
# bench.py A/Bs it without code edits).  Read per trace (not at import)
# so in-process A/B harnesses that toggle os.environ stay truthful.
def _fused_sweeps() -> bool:
    return os.environ.get("HPMPC_FUSED_SWEEPS", "0") == "1"

from ..ocp import OCPDims, OCPQP
from . import ipm as _ipm


class _FState(NamedTuple):
    zF: jax.Array      # (B, (N+1)*NZ)
    piF: jax.Array     # (B, N*NX)
    lam_b: jax.Array   # (B, 2*NBF)  [lower; upper]
    t_b: jax.Array     # (B, 2*NBF)
    lam_g: jax.Array   # (B, 2*NGF)
    t_g: jax.Array     # (B, 2*NGF)
    mu: jax.Array      # (B,)
    alpha: jax.Array   # (B,)
    kk: jax.Array      # (B,) int32
    stat: jax.Array    # (5, k_max, B)
    lam_ref: jax.Array  # (B,) cumulative-guard anchor (ipm.anchor_lam_ref)


class _Res(NamedTuple):
    rqF: jax.Array     # (B, (N+1)*NZ)
    rbF: jax.Array     # (B, N*NX)
    rd_b: jax.Array    # (B, 2*NBF)
    rd_g: jax.Array    # (B, 2*NGF)
    rm_b: jax.Array    # (B, 2*NBF)
    rm_g: jax.Array    # (B, 2*NGF)
    mu: jax.Array      # (B,)


def solve_batched_flat(
    dims: OCPDims, qp: OCPQP, cfg, kkt_factory=None, z0=None, pi0=None,
    state0=None,
) -> _ipm.IPMSolution:
    """Batch-level flat-state solve.  ``qp`` leaves carry a leading batch
    axis that must be a multiple of 1024 (the Pallas block size); returns
    the same batched :class:`~.ipm.IPMSolution` as ``vmap(ipm.solve)``.

    ``kkt_factory(dims, qp, kdt, ng_stages)`` optionally swaps the KKT
    kernels (factor / resolve / resid_terms / apply_fpi) while reusing this
    loop's step, alpha, gating and trace machinery — the flat-engine
    analogue of :class:`~.ipm.KKTBackend` (used by the tree topology,
    ``models/tree.py``); ``None`` is the chain (``ops/stage_kernel``).

    ``z0`` (B, N+1, NZ) / ``pi0`` (B, N, NX) with ``cfg.warm_start`` seed
    the iterate (the reference's hot-loop ``warm_start`` argument,
    ``d_ip2_res_hard.c:116`` arg 6) — the box-violation correction branch
    of ``d_init_var_mpc_hard_tv`` still applies, exactly as in the
    structured solver's :func:`~.ipm.init_vars`.

    ``state0`` (an :class:`~.ipm.IPMSolution` from a prior stage) seeds
    the FULL primal-dual state — iterate, multipliers, slacks, duality
    measure, iteration count and stat trace — for HOT CONTINUATION: a
    cheaper engine (lanes/mega) runs the well-conditioned early
    iterations and this engine finishes with refinement, with ``kk``
    continuing so iteration budgets and stat rows stay exact
    (dispatched by ``parallel.batch.solve_batched`` when
    ``iter_ref > 0`` and ``iter_ref_mu_thr > 0``).  Mutually exclusive
    with ``z0``/``pi0``.
    """
    with jax.default_matmul_precision("float32"):
        return _impl(dims, qp, cfg, kkt_factory, z0=z0, pi0=pi0,
                     state0=state0)


def _impl(dims: OCPDims, qp: OCPQP, cfg, kkt_factory=None,
          z0=None, pi0=None, state0=None) -> _ipm.IPMSolution:
    from ..ops import stage_kernel as sk

    dt = qp.dtype
    N, NU, NX, NZ, NB, NG = dims.N, dims.NU, dims.NX, dims.NZ, dims.NB, dims.NG
    B = qp.b.shape[0]
    assert B % sk.BI == 0, "flat path requires batch % 1024 == 0"
    n_constr = dims.n_constr
    assert n_constr > 0, "unconstrained problems take the vmap path"

    ng_stages = tuple(n for n in range(N + 1) if dims.ng[n] > 0)
    n_ng = len(ng_stages)
    NZF = (N + 1) * NZ
    NXF = N * NX
    NBF = (N + 1) * NB
    NGF = n_ng * NG

    # ---- trace-time flat constants -------------------------------------
    mbF = qp.nb_mask.reshape(B, NBF)
    mb2 = jnp.concatenate([mbF, mbF], 1)
    d_lbF = qp.d_lb.reshape(B, NBF)
    d_ubF = qp.d_ub.reshape(B, NBF)
    d_cat = jnp.concatenate([d_lbF, d_ubF], 1)
    sgn = jnp.concatenate(
        [jnp.ones((1, NBF), dt), -jnp.ones((1, NBF), dt)], 1
    )

    # Box gather/scatter as 0/1 selection-matrix matmuls.  TPU gather with
    # per-batch index arrays serializes (~10-15 ms per (B, NBF) gather at
    # B=4096 — measured); the MXU does the same data movement as a (B, NZF)
    # x (NZF, NBF) matmul in ~0.02 ms, and 0/1 weights are exact at f32
    # precision.  Requires static dims.idxb (dispatch guard in
    # parallel.batch.solve_batched); logical->padded coordinate packing as
    # in ocp.pack_ocp.
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

    def gather_box(vF):  # (B, NZF) -> (B, NBF); 0 at padded slots
        return jnp.dot(vF, SelB, precision=HI)

    def scatter_box(v):  # masked (B, NBF) -> (B, NZF)
        return jnp.dot(v, SelBT, precision=HI)

    def cat2(v):  # (B, K) -> (B, 2K)
        return jnp.concatenate([v, v], 1)

    def fold(v):  # (B, 2*NBF) -> (B, NBF): lower-half + upper-half
        return v[:, :NBF] + v[:, NBF:]

    # general constraints (static ng-stage restriction, like the structured
    # backend's ng_stages — cost scales with the active stages only).
    # The C rows are kept PER ACTIVE STAGE as (B, NG, NZ) slices with
    # static-slice gathers/scatter-adds into the flat z vector: a dense
    # (B, NGF, NZF) row matrix costs B*NGF*NZF*4 bytes of HBM traffic on
    # EVERY einsum (44.7 MB at the bench shapes, read ~6x per iteration)
    # when all but n_ng*NG*NZ of it is structural zeros.
    if n_ng:
        C_act = [qp.C[:, n] for n in ng_stages]          # each (B, NG, NZ)
        # paired C streams for the per-iteration PACKED barrier-term
        # assembly (sk.sym_pair_streams): the per-iteration einsum then
        # never materializes the (B, n_ng, NZ, NZ) structured term (its
        # (11,11) trailing dims tile-pad ~17x — ~33 MB/iter at bench
        # shapes)
        Ct1, Ct2 = sk.sym_pair_streams(
            jnp.stack(C_act, 1).astype(jnp.float32), NZ
        )
        mgF = jnp.concatenate([qp.ng_mask[:, n] for n in ng_stages], 1)
        dg_lo = jnp.concatenate([qp.d_lg[:, n] for n in ng_stages], 1)
        dg_up = jnp.concatenate([qp.d_ug[:, n] for n in ng_stages], 1)
        dg_cat = jnp.concatenate([dg_lo, dg_up], 1)
        mg2 = jnp.concatenate([mgF, mgF], 1)
        sgn_g = jnp.concatenate(
            [jnp.ones((1, NGF), dt), -jnp.ones((1, NGF), dt)], 1
        )

        def cz_of(zF):
            """(B, NZF) -> (B, NGF): C_n z_n on the active stages."""
            outs = [
                jnp.einsum(
                    "bgz,bz->bg", C_act[k],
                    lax.slice_in_dim(zF, n * NZ, (n + 1) * NZ, axis=1),
                )
                for k, n in enumerate(ng_stages)
            ]
            return jnp.concatenate(outs, 1)

        def ct_apply(out, v):
            """out (B, NZF) += C' v for v (B, NGF) (scatter-add with
            static stage slices)."""
            for k, n in enumerate(ng_stages):
                contrib = jnp.einsum(
                    "bg,bgz->bz", v[:, k * NG : (k + 1) * NG], C_act[k]
                )
                out = out.at[:, n * NZ : (n + 1) * NZ].add(contrib)
            return out

        def fold_g(v):
            return v[:, :NGF] + v[:, NGF:]
    else:
        mg2 = jnp.zeros((B, 0), dt)

        def cz_of(zF):
            return jnp.zeros((B, 0), dt)

        def ct_apply(out, v):
            return out

    gF = (qp.g * qp.z_mask).reshape(B, NZF)
    bF = qp.b.reshape(B, NXF)
    z_maskF = qp.z_mask.reshape(B, NZF)
    x_maskF = qp.x_mask[:, 1:].reshape(B, NXF)
    pad_diagF = qp.pad_diag.reshape(B, NZF)

    # MIXED PRECISION: the Pallas stage kernels always run f32 (the TPU
    # VPU/MXU native precision); the loop state, step math and residuals
    # run in the QP's dtype.  Passing an f64 QP therefore gives the
    # mixed-precision IPM (f64 outer loop + f32 KKT solves) — the
    # reference's own single/double idea (d_ip2_res_hard.c:48).  Measured
    # (flat engine, B=1024, N=5, ng active): tracks the full-f64
    # structured solver iteration-for-iteration to mu ~1e-13 with max |z|
    # error ~1e-9 (tests/test_stage_kernel.py) — the f32 factorization is
    # only a direction oracle; accuracy is set by the residual precision.
    kdt = jnp.float32
    mixed = dt != kdt

    kkt = kkt_factory(dims, qp, kdt, ng_stages) if kkt_factory else None
    if kkt is not None:
        assert not mixed, "custom KKT backends are f32-only"
        assert int(getattr(cfg, "iter_ref", 0)) == 0, \
            "iter_ref is chain-only (solve_flat_pb); unsupported here"

    # loop-invariant lanes transposes (once, outside the IPM loop); H is
    # symmetric and travels as a packed lower-triangle stream (66 instead
    # of 121 subtiles/stage at NZ=11 — it is the largest constant stream
    # the sv/resid kernels re-fetch every iteration)
    if kkt is None:
        Hl = sk._to_lanes(sk.sym_compress(qp.H.astype(kdt)), B)
        Fl = sk._to_lanes(qp.F.astype(kdt), B)
    nb_blk = B // sk.BI

    # static selection matmuls for the residual's pi / x-shift terms
    # (constant-index gathers also serialize on TPU; same MXU trick)
    mpi_np = np.zeros((NXF, NZF), np.float32)  # rq -= piF @ Mpi
    for n in range(1, N + 1):
        for i in range(NU, NZ):
            mpi_np[(n - 1) * NX + (i - NU), n * NZ + i] = 1.0
    mx_np = np.zeros((NZF, NXF), np.float32)  # x_{n+1} = zF @ Mx
    for n in range(N):
        for x in range(NX):
            mx_np[(n + 1) * NZ + NU + x, n * NX + x] = 1.0
    Mpi = jnp.asarray(mpi_np, dt)
    Mx = jnp.asarray(mx_np, dt)

    mu_scal = jnp.asarray(1.0 / n_constr, dt)
    mu_tol = jnp.asarray(cfg.mu_tol, dt)
    mu_tol_low = jnp.asarray(max(cfg.mu_tol, cfg.mu_switch), dt)
    alpha_min = jnp.asarray(cfg.alpha_min, dt)
    k_max = cfg.k_max
    thr0 = jnp.asarray(0.1, dt)
    mu0 = jnp.asarray(cfg.mu0, dt)
    reg = jnp.asarray(cfg.reg_eps, dt)

    iter_ref = int(getattr(cfg, "iter_ref", 0))

    def apply_fpi(rq, fpiF):
        """Fold the F_e pi_e terms into rq.  Chain: edge e's term lands on
        node e (its dad) — a contiguous slice add.  Custom topologies
        (tree) supply their own dad scatter."""
        if kkt is not None:
            return kkt.apply_fpi(rq, fpiF)
        return rq.at[:, : N * NZ].add(fpiF[:, : N * NZ])

    def resid_terms(zF, piF):
        """(H_n z_n, F_n' z_n, F_n pi_n) in the state dtype: the lanes
        Pallas kernel when f32, full-precision XLA einsums when mixed
        (residual precision is what sets the mixed-mode accuracy)."""
        if kkt is not None:
            return kkt.resid_terms(zF, piF)
        if not mixed:
            return sk.resid_terms_flat(Hl, Fl, zF, piF, NZ, NX)
        z = zF.reshape(B, N + 1, NZ)
        pi = piF.reshape(B, N, NX)
        hzF = jnp.einsum("bnzw,bnw->bnz", qp.H, z).reshape(B, NZF)
        fzF = jnp.einsum("bnzx,bnz->bnx", qp.F, z[:, :N]).reshape(B, NXF)
        fpiF = jnp.einsum("bnzx,bnx->bnz", qp.F, pi).reshape(B, N * NZ)
        fpiF = jnp.concatenate([fpiF, jnp.zeros((B, NZ), dt)], axis=1)
        return hzF, fzF, fpiF

    ref_thr = float(getattr(cfg, "iter_ref_mu_thr", 0.0))

    def newton_refine(Ll_l, Lxx_l, dvecF, Qx_g, g_eff, rhs_bF, zF, piF,
                      do_ref=None):
        """Iterative refinement on the Newton system (reference ITER_REF,
        ``d_ip2_res_hard.c:48,1086-1163``): full-precision KKT residuals of
        the CURRENT effective system (H_eff = H + diag(dvecF) + ng barrier
        term, assembled term-by-term — H_eff itself never exists in HBM),
        then a correction re-solve with the retained lanes factor.  Pb is
        recomputed in-kernel (``solve_flat_pb``) because the factor's Pb
        cache is keyed to the original rhs, not the residual ``rb``.

        ``do_ref`` (scalar bool, cfg.iter_ref_mu_thr > 0): mu-gated
        refinement — the whole correction pass sits under one lax.cond,
        so early well-conditioned iterations skip it entirely."""

        def refine(zp):
            zF, piF = zp
            for _ in range(iter_ref):
                hzF, fzF, fpiF = resid_terms(zF, piF)
                rq = g_eff + hzF + dvecF * zF
                if n_ng:
                    rq = ct_apply(rq, Qx_g * mgF * cz_of(zF))
                rq = apply_fpi(rq, fpiF)
                rq = rq - jnp.dot(piF, Mpi, precision=HI)
                rb = rhs_bF + fzF - jnp.dot(zF, Mx, precision=HI)
                dzF, dpiF = sk.solve_flat_pb(
                    Ll_l, Lxx_l, rq.astype(kdt), Fl, rb.astype(kdt),
                    NU, NZ, NX
                )
                zF = zF + dzF.astype(dt)
                piF = piF + dpiF.astype(dt)
            return zF, piF

        if do_ref is None:
            return refine((zF, piF))
        return jax.lax.cond(do_ref, refine, lambda zp: zp, (zF, piF))

    def kkt_factor_solve(Qx_b, Qx_g, g_eff, rhs_bF, do_ref=None):
        """Qx_b (B, NBF) masked barrier diag for box vars; Qx_g (B, NGF)."""
        dvecF = scatter_box(Qx_b) + pad_diagF + reg
        if n_ng:
            # packed barrier term straight from the paired C streams: the
            # (B, n_ng, NT) einsum never materializes the tile-padded
            # structured (B, n_ng, NZ, NZ) intermediate
            Qg = Qx_g.reshape(B, n_ng, NG).astype(jnp.float32)
            ngt = jnp.einsum(
                "bngt,bng,bngt->bnt", Ct1, Qg, Ct2, precision=HI
            )
            ngl = sk._to_lanes_flat(
                ngt.reshape(B, -1).astype(kdt), B, (n_ng, sk._sym_nt(NZ))
            )
        else:
            ngl = jnp.zeros(
                (nb_blk, 1, sk._sym_nt(NZ), sk.SUBS, sk.LANES), kdt
            )
        if kkt is not None:
            return kkt.factor(dvecF, ngl, g_eff, rhs_bF)
        # the affine solve's pi is dead in both IPM phases (only the
        # corrector's dpi is used) — skip it and the whole Lxx forward
        # stream unless iterative refinement consumes it
        if _fused_sweeps() and not iter_ref:
            zF, piF, (Ll_l, Lxx_l, Pb_l) = sk.factor_solve_folded_flat_fused(
                Hl, dvecF.astype(kdt), ngl, ng_stages,
                g_eff.astype(kdt), Fl, rhs_bF.astype(kdt), NU, NZ, NX,
            )
        else:
            zF, piF, (Ll_l, Lxx_l, Pb_l) = sk.factor_solve_folded_flat(
                Hl, dvecF.astype(kdt), ngl, ng_stages,
                g_eff.astype(kdt), Fl, rhs_bF.astype(kdt), NU, NZ, NX,
                want_pi=bool(iter_ref),
            )
        zF = zF.astype(dt)
        piF = piF.astype(dt) if piF is not None else None
        if iter_ref:
            zF, piF = newton_refine(
                Ll_l, Lxx_l, dvecF, Qx_g, g_eff, rhs_bF, zF, piF,
                do_ref=do_ref,
            )
        return zF, piF, (Ll_l, Lxx_l, Pb_l, dvecF, Qx_g)

    def kkt_resolve(fstate, g_eff, rhs_bF, do_ref=None):
        if kkt is not None:
            return kkt.resolve(fstate, g_eff, rhs_bF)
        Ll_l, Lxx_l, Pb_l, dvecF, Qx_g = fstate
        resolve_fn = sk.solve_flat_fused if _fused_sweeps() else sk.solve_flat
        zF, piF = resolve_fn(
            Ll_l, Lxx_l, Pb_l, g_eff.astype(kdt), Fl, rhs_bF.astype(kdt),
            NU, NZ, NX
        )
        zF, piF = zF.astype(dt), piF.astype(dt)
        if iter_ref:
            zF, piF = newton_refine(
                Ll_l, Lxx_l, dvecF, Qx_g, g_eff, rhs_bF, zF, piF,
                do_ref=do_ref,
            )
        return zF, piF

    def build_geff(base, qx_b, qx_g):
        out = base + scatter_box(qx_b)
        if n_ng:
            out = ct_apply(out, qx_g)
        return out

    def min_ratio(a, v, dv, m):
        if v.shape[1] == 0:
            return a
        pred = (dv < 0.0) & (m > 0.0)
        ratio = jnp.where(pred, -v / jnp.where(pred, dv, -1.0), jnp.inf)
        return jnp.minimum(a, jnp.min(ratio, axis=1))

    def mu_of(lam_b, t_b, lam_g, t_g):
        m = jnp.sum(lam_b * t_b * mb2, axis=1)
        if n_ng:
            m = m + jnp.sum(lam_g * t_g * mg2, axis=1)
        return m * mu_scal

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

    def gate_res(m, new, old):
        return _Res(*[
            jnp.where(m.reshape((B,) + (1,) * (a.ndim - 1)), a, b)
            for a, b in zip(new, old)
        ])

    # ---- init (exact reference branching; see ipm.init_vars) ------------
    if getattr(cfg, "warm_start", False) and z0 is not None:
        zF0 = (jnp.asarray(z0, dt).reshape(B, NZF)) * z_maskF
    else:
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

    if getattr(cfg, "warm_start", False) and pi0 is not None:
        piF0 = jnp.asarray(pi0, dt).reshape(B, NXF) * x_maskF
    else:
        piF0 = jnp.zeros((B, NXF), dt)
    s0 = _FState(
        zF=zF0, piF=piF0,
        lam_b=lam_b0, t_b=t_b0, lam_g=lam_g0, t_g=t_g0,
        mu=jnp.full((B,), mu0, dt),
        alpha=jnp.ones((B,), dt),
        kk=jnp.zeros((B,), jnp.int32),
        stat=jnp.zeros((5, k_max, B), dt),
        lam_ref=jnp.full((B,), jnp.inf, dt),
    )
    if state0 is not None:
        # hot continuation: seed the FULL primal-dual state from a prior
        # stage's IPMSolution (structured layouts -> flat), with kk and
        # the stat trace carried so iteration budgets/rows stay exact
        lam_b0c = jnp.concatenate(
            [state0.lam_b[:, :, 0].reshape(B, NBF).astype(dt),
             state0.lam_b[:, :, 1].reshape(B, NBF).astype(dt)], 1)
        t_b0c = jnp.concatenate(
            [state0.t_b[:, :, 0].reshape(B, NBF).astype(dt),
             state0.t_b[:, :, 1].reshape(B, NBF).astype(dt)], 1)
        t_b0c = jnp.where(mb2 > 0, t_b0c, 1.0)
        lam_b0c = jnp.where(mb2 > 0, lam_b0c, 0.0)
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
        s0 = _FState(
            zF=state0.z.reshape(B, NZF).astype(dt) * z_maskF,
            piF=state0.pi.reshape(B, NXF).astype(dt) * x_maskF,
            lam_b=lam_b0c, t_b=t_b0c, lam_g=lam_g0c, t_g=t_g0c,
            mu=mu_of(lam_b0c, t_b0c, lam_g0c, t_g0c),
            alpha=jnp.ones((B,), dt),
            kk=state0.kk.astype(jnp.int32),
            stat=jnp.transpose(state0.stat.astype(dt), (2, 1, 0)),
            lam_ref=jnp.full((B,), jnp.inf, dt),
        )

    kiota = jnp.arange(k_max, dtype=jnp.int32)

    def stat_update(stat, kk, row):
        # row (5, B) -> stat[:, kk[b], b] = row[:, b], per instance
        mask = kiota[None, :, None] == kk[None, None, :]
        return jnp.where(mask, row[:, None, :], stat)

    # ---- phase 1 (delta_mu formulation; ipm._solve_impl phase 1) --------

    def _lam_inst_max(lam_b, lam_g):
        """Per-instance max |dual| (the step_ok dual-explosion guard)."""
        m = jnp.max(jnp.abs(lam_b), axis=1)
        if lam_g.shape[1]:
            m = jnp.maximum(m, jnp.max(jnp.abs(lam_g), axis=1))
        return m

    def phase1_body(s):
        t_inv_b = jnp.where(mb2 > 0, 1.0 / s.t_b, 0.0)
        lamt_b = s.lam_b * t_inv_b
        Qx_b = fold(lamt_b) * mbF
        qx_b = fold(-sgn * s.lam_b - lamt_b * d_cat) * mbF
        if n_ng:
            t_inv_g = jnp.where(mg2 > 0, 1.0 / s.t_g, 0.0)
            lamt_g = s.lam_g * t_inv_g
            Qx_g = fold_g(lamt_g) * mgF
            qx_g = fold_g(-sgn_g * s.lam_g - lamt_g * dg_cat) * mgF
        else:
            t_inv_g = lamt_g = Qx_g = qx_g = jnp.zeros((B, 0), dt)

        g_eff = build_geff(gF, qx_b, qx_g)
        # mu-gated refinement: conditioning of the barrier Hessian is
        # ~1/mu, so correction re-solves only matter once some instance
        # is below the threshold (scalar predicate -> one lax.cond)
        do_ref = (jnp.min(s.mu) < ref_thr) if ref_thr > 0 else None
        dz, dpi, fstate = kkt_factor_solve(Qx_b, Qx_g, g_eff, bF,
                                           do_ref=do_ref)

        def dt_dlam(z_new, dl0_b, dl0_g):
            zbn = gather_box(z_new)
            dtb = (sgn * (cat2(zbn) - d_cat) - s.t_b) * mb2
            dlb = (dl0_b - lamt_b * dtb - s.lam_b) * mb2
            if n_ng:
                czn = cz_of(z_new)
                dtg = (sgn_g * (cat2(czn) - dg_cat) - s.t_g) * mg2
                dlg = (dl0_g - lamt_g * dtg - s.lam_g) * mg2
            else:
                dtg = dlg = jnp.zeros((B, 0), dt)
            return dtb, dtg, dlb, dlg

        def alpha_all(dtb, dtg, dlb, dlg):
            a = jnp.ones((B,), dt)
            a = min_ratio(a, s.lam_b, dlb, mb2)
            a = min_ratio(a, s.t_b, dtb, mb2)
            a = min_ratio(a, s.lam_g, dlg, mg2)
            a = min_ratio(a, s.t_g, dtg, mg2)
            return a

        zer_b = jnp.zeros_like(s.lam_b)
        zer_g = jnp.zeros_like(s.lam_g)
        dtb, dtg, dlb, dlg = dt_dlam(dz, zer_b, zer_g)
        alpha_aff = alpha_all(dtb, dtg, dlb, dlg)
        a = (alpha_aff * 0.995)[:, None]
        mu_aff = mu_of(s.lam_b + a * dlb, s.t_b + a * dtb,
                       s.lam_g + a * dlg, s.t_g + a * dtg)
        sigma = (mu_aff / s.mu) ** 3
        sm = (sigma * s.mu)[:, None]

        dl2b = t_inv_b * (sm - dlb * dtb) * mb2
        qx_b2 = qx_b + fold(-sgn * dl2b) * mbF
        if n_ng:
            dl2g = t_inv_g * (sm - dlg * dtg) * mg2
            qx_g2 = qx_g + fold_g(-sgn_g * dl2g) * mgF
        else:
            dl2g = jnp.zeros((B, 0), dt)
            qx_g2 = qx_g
        g_eff2 = build_geff(gF, qx_b2, qx_g2)
        dz2, dpi2 = kkt_resolve(fstate, g_eff2, bF, do_ref=do_ref)

        dtb, dtg, dlb, dlg = dt_dlam(dz2, dl2b, dl2g)
        alpha2 = alpha_all(dtb, dtg, dlb, dlg)
        a2 = (alpha2 * 0.995)[:, None]

        z_new = s.zF + a2 * (dz2 - s.zF)
        pi_new = s.piF + a2 * (dpi2 - s.piF)
        lam_b_n = s.lam_b + a2 * dlb
        t_b_n = s.t_b + a2 * dtb
        lam_g_n = s.lam_g + a2 * dlg
        t_g_n = s.t_g + a2 * dtg
        mu_new = mu_of(lam_b_n, t_b_n, lam_g_n, t_g_n)

        row = jnp.stack([sigma, alpha_aff, mu_aff, alpha2, mu_new])
        lmx_new = _lam_inst_max(lam_b_n, lam_g_n)
        s_new = _FState(
            zF=z_new, piF=pi_new,
            lam_b=lam_b_n, t_b=t_b_n, lam_g=lam_g_n, t_g=t_g_n,
            mu=mu_new, alpha=alpha2 * 0.995, kk=s.kk + 1,
            stat=stat_update(s.stat, s.kk, row),
            lam_ref=_ipm.anchor_lam_ref(s.lam_ref, s.mu, mu_new, lmx_new),
        )
        # numerical-breakdown guard — see ipm phase-1 note
        ok = _ipm.step_ok(mu_new, s.mu, lmx_new,
                          _lam_inst_max(s.lam_b, s.lam_g),
                          lam_ref=s.lam_ref)
        return gate(ok, s_new, s._replace(alpha=jnp.zeros_like(s.alpha)))

    def phase1_pred_b(s):
        return (s.kk < k_max) & (s.mu > mu_tol_low) & (s.alpha >= alpha_min)

    def gated1(s):
        return gate(phase1_pred_b(s), phase1_body(s), s)

    s1 = lax.while_loop(lambda s: jnp.any(phase1_pred_b(s)), gated1, s0)

    # ---- residuals (flat port of ipm.compute_residuals) -----------------
    def residuals(zF, piF, lam_b, t_b, lam_g, t_g):
        hzF, fzF, fpiF = resid_terms(zF, piF)
        rq = gF + hzF
        rq = apply_fpi(rq, fpiF)
        rq = rq - jnp.dot(piF, Mpi, precision=HI)
        rq = rq + scatter_box(fold(-sgn * lam_b) * mbF)
        if n_ng:
            rq = ct_apply(rq, fold_g(-sgn_g * lam_g) * mgF)
        rq = rq * z_maskF

        rb = (bF + fzF - jnp.dot(zF, Mx, precision=HI)) * x_maskF

        zbn = gather_box(zF)
        rd_b = (d_cat - cat2(zbn) + sgn * t_b) * mb2
        rm_b = lam_b * t_b * mb2
        if n_ng:
            czn = cz_of(zF)
            rd_g = (dg_cat - cat2(czn) + sgn_g * t_g) * mg2
            rm_g = lam_g * t_g * mg2
        else:
            rd_g = rm_g = jnp.zeros((B, 0), dt)
        mu = mu_of(lam_b, t_b, lam_g, t_g)
        return _Res(rq, rb, rd_b, rd_g, rm_b, rm_g, mu)

    res1 = residuals(s1.zF, s1.piF, s1.lam_b, s1.t_b, s1.lam_g, s1.t_g)
    s1 = s1._replace(mu=res1.mu)

    # ---- phase 2 (full-residual formulation; ipm._solve_impl phase 2) ---
    def phase2_body(carry):
        s, res = carry
        t_inv_b = jnp.where(mb2 > 0, 1.0 / s.t_b, 0.0)
        Qx_b = fold(t_inv_b * s.lam_b) * mbF
        if n_ng:
            t_inv_g = jnp.where(mg2 > 0, 1.0 / s.t_g, 0.0)
            Qx_g = fold_g(t_inv_g * s.lam_g) * mgF
        else:
            t_inv_g = Qx_g = jnp.zeros((B, 0), dt)

        def qx_from(rm_b, rm_g):
            qxb = fold(
                sgn * t_inv_b * rm_b - t_inv_b * s.lam_b * res.rd_b
            ) * mbF
            if n_ng:
                qxg = fold_g(
                    sgn_g * t_inv_g * rm_g - t_inv_g * s.lam_g * res.rd_g
                ) * mgF
            else:
                qxg = jnp.zeros((B, 0), dt)
            return qxb, qxg

        qx_b, qx_g = qx_from(res.rm_b, res.rm_g)
        g_eff = build_geff(res.rqF, qx_b, qx_g)
        do_ref = (jnp.min(s.mu) < ref_thr) if ref_thr > 0 else None
        dz, dpi, fstate = kkt_factor_solve(Qx_b, Qx_g, g_eff, res.rbF,
                                           do_ref=do_ref)

        def dt_dlam(dzF, rm_b, rm_g):
            dzb = gather_box(dzF)
            dtb = sgn * (cat2(dzb) - res.rd_b) * mb2
            dlb = -t_inv_b * (s.lam_b * dtb + rm_b) * mb2
            if n_ng:
                cdz = cz_of(dzF)
                dtg = sgn_g * (cat2(cdz) - res.rd_g) * mg2
                dlg = -t_inv_g * (s.lam_g * dtg + rm_g) * mg2
            else:
                dtg = dlg = jnp.zeros((B, 0), dt)
            return dtb, dtg, dlb, dlg

        def alpha_all(dtb, dtg, dlb, dlg):
            a = jnp.ones((B,), dt)
            a = min_ratio(a, s.lam_b, dlb, mb2)
            a = min_ratio(a, s.t_b, dtb, mb2)
            a = min_ratio(a, s.lam_g, dlg, mg2)
            a = min_ratio(a, s.t_g, dtg, mg2)
            return a

        dtb, dtg, dlb, dlg = dt_dlam(dz, res.rm_b, res.rm_g)
        alpha_aff = alpha_all(dtb, dtg, dlb, dlg)
        a = (alpha_aff * 0.995)[:, None]
        mu_aff = mu_of(s.lam_b + a * dlb, s.t_b + a * dtb,
                       s.lam_g + a * dlg, s.t_g + a * dtg)
        sigma = (mu_aff / s.mu) ** 3
        sm = (sigma * s.mu)[:, None]

        rm_b2 = res.rm_b + (dtb * dlb - sm) * mb2
        rm_g2 = (res.rm_g + (dtg * dlg - sm) * mg2) if n_ng else res.rm_g
        qx_b2, qx_g2 = qx_from(rm_b2, rm_g2)
        g_eff2 = build_geff(res.rqF, qx_b2, qx_g2)
        dz2, dpi2 = kkt_resolve(fstate, g_eff2, res.rbF, do_ref=do_ref)

        dtb, dtg, dlb, dlg = dt_dlam(dz2, rm_b2, rm_g2)
        alpha2 = alpha_all(dtb, dtg, dlb, dlg)
        a2 = (alpha2 * 0.995)[:, None]

        z_new = s.zF + a2 * dz2
        pi_new = s.piF + a2 * dpi2
        lam_b_n = s.lam_b + a2 * dlb
        t_b_n = s.t_b + a2 * dtb
        lam_g_n = s.lam_g + a2 * dlg
        t_g_n = s.t_g + a2 * dtg

        res_new = residuals(z_new, pi_new, lam_b_n, t_b_n, lam_g_n, t_g_n)
        mu_new = res_new.mu
        row = jnp.stack([sigma, alpha_aff, mu_aff, alpha2, mu_new])
        lmx_new = _lam_inst_max(lam_b_n, lam_g_n)
        s_new = _FState(
            zF=z_new, piF=pi_new,
            lam_b=lam_b_n, t_b=t_b_n, lam_g=lam_g_n, t_g=t_g_n,
            mu=mu_new, alpha=alpha2 * 0.995, kk=s.kk + 1,
            stat=stat_update(s.stat, s.kk, row),
            lam_ref=_ipm.anchor_lam_ref(s.lam_ref, s.mu, mu_new, lmx_new),
        )
        ok = _ipm.step_ok(mu_new, s.mu, lmx_new,
                          _lam_inst_max(s.lam_b, s.lam_g),
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

    def _absmax(x):
        if x.shape[1] == 0:
            return jnp.zeros((B,), dt)
        return jnp.max(jnp.abs(x), axis=1)

    inf_norm_res = jnp.stack([
        _absmax(res_f.rqF),
        _absmax(res_f.rbF),
        jnp.maximum(_absmax(res_f.rd_b), _absmax(res_f.rd_g)),
        res_f.mu,
    ], axis=1)

    # ---- structured outputs (IPMSolution contract) ----------------------
    lam_b_s = jnp.stack(
        [s2.lam_b[:, :NBF].reshape(B, N + 1, NB),
         s2.lam_b[:, NBF:].reshape(B, N + 1, NB)], axis=2
    )
    t_b_s = jnp.stack(
        [s2.t_b[:, :NBF].reshape(B, N + 1, NB),
         s2.t_b[:, NBF:].reshape(B, N + 1, NB)], axis=2
    )
    lam_g_s = jnp.zeros((B, N + 1, 2, NG), dt)
    t_g_s = jnp.ones((B, N + 1, 2, NG), dt)
    for k, n in enumerate(ng_stages):
        sl = slice(k * NG, (k + 1) * NG)
        lam_g_s = lam_g_s.at[:, n, 0].set(s2.lam_g[:, sl])
        lam_g_s = lam_g_s.at[:, n, 1].set(s2.lam_g[:, NGF:][:, sl])
        t_g_s = t_g_s.at[:, n, 0].set(s2.t_g[:, sl])
        t_g_s = t_g_s.at[:, n, 1].set(s2.t_g[:, NGF:][:, sl])

    return _ipm.IPMSolution(
        z=s2.zF.reshape(B, N + 1, NZ),
        pi=s2.piF.reshape(B, N, NX),
        lam_b=lam_b_s, t_b=t_b_s, lam_g=lam_g_s, t_g=t_g_s,
        kk=s2.kk, status=status,
        stat=jnp.transpose(s2.stat, (2, 1, 0)),
        inf_norm_res=inf_norm_res,
    )
