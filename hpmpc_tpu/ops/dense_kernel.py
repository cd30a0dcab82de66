"""Dense condensed-QP IPM kernel — single instance, whole solve in ONE
pallas_call (the 5th-generation LATENCY engine; driver:
``models/ipm_dense``).

Layout (f32): the dense Hessian/factor live as TALL TILES — matrix rows
on sublanes, columns on lanes ((roundup8(nz), 128); nz <= 128,
ngd <= 128 asserted by the wrapper).  Vectors are LANE vectors ((1, 128)
broadcastable rows).  All per-iteration math is VPU elementwise +
lane/sublane reductions; the two matrix products that fold the
general-row barrier (G' diag(q) G and W-style matvecs) contract over
SUBLANES via masked reduce chains — the dense Cholesky's column loop is
the ONLY sequential depth left in the whole solve (~nz steps vs the
stage engines' 4(N+1) grid phases per iteration).

Grid: ``(k_max,)`` — one grid step per Mehrotra iteration, state carried
in VMEM scratch, per-iteration liveness skip (mu <= mu_tol stops the
work; the remaining steps only refresh outputs).

Semantics: phase-1 Mehrotra to mu_tol/k_max (legacy ``d_ip2_hard.c``
contract), iterate-parity with ``models/ipm_dense.solve_dense_ref``
asserted by tests/test_ipm_dense.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stage_kernel import pcall

LANES = 128
_BIG = 3.0e38


def _rup8(n):
    return -(-n // 8) * 8


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _sub_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _lane_extract(M, j):
    """column j of a tall tile as a lane-broadcast: out[i, l] = M[i, j]."""
    col = jnp.sum(jnp.where(_lane_iota(M.shape) == j, M, 0.0),
                  axis=1, keepdims=True)
    return jnp.broadcast_to(col, M.shape)


def _sub_extract(M, i):
    """row i of a tall tile as a sublane-broadcast: out[s, l] = M[i, l]."""
    row = jnp.sum(jnp.where(_sub_iota(M.shape) == i, M, 0.0),
                  axis=0, keepdims=True)
    return jnp.broadcast_to(row, M.shape)


def _vrow(ref):
    """(1, LANES) row view of a vector ref."""
    return ref[0:1, :]


def _lane_to_sub(v_row, SP):
    """lane vector (1, LANES) -> sublane-broadcast tall tile (SP, LANES)
    whose [i, l] = v[i] — via the diag-mask + lane-reduce trick."""
    t = jnp.broadcast_to(v_row, (SP, LANES))
    d = jnp.where(_sub_iota((SP, LANES)) == _lane_iota((SP, LANES)),
                  t, 0.0)
    col = jnp.sum(d, axis=1, keepdims=True)
    return jnp.broadcast_to(col, (SP, LANES))


def _sub_to_lane(v_col_tile):
    """sublane vector (broadcast tile, [i, l] = v[i]) -> lane vector
    (1, LANES) with [0, j] = v[j]."""
    SP = v_col_tile.shape[0]
    d = jnp.where(_sub_iota((SP, LANES)) == _lane_iota((SP, LANES)),
                  v_col_tile, 0.0)
    return jnp.sum(d, axis=0, keepdims=True)


def _scal(v_row, j):
    """lane-extract a scalar from a (1, LANES) row, broadcast (1, LANES)."""
    s = jnp.sum(jnp.where(_lane_iota(v_row.shape) == j, v_row, 0.0),
                axis=1, keepdims=True)
    return jnp.broadcast_to(s, v_row.shape)


def _chol_tall(A, n, SP):
    """Lower Cholesky of the symmetric n x n system held in a tall tile;
    returns (L, U=L', dinv_row) — the symmetric trick gives both
    orientations of every column without transposes."""
    rows = _sub_iota((SP, LANES))
    cols = _lane_iota((SP, LANES))
    L = jnp.zeros_like(A)
    U = jnp.zeros_like(A)
    dinv_row = jnp.zeros((1, LANES), A.dtype)
    for j in range(n):
        dcol = _lane_extract(A, j)              # [i, l] = A[i, j]
        drow = _sub_extract(A, j)               # [s, k] = A[j, k]
        d = _sub_extract(dcol, j)               # A[j, j] everywhere
        dinv = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
        c_sub = jnp.where(rows >= j, dcol * dinv, 0.0)
        c_lane = jnp.where(cols >= j, drow * dinv, 0.0)
        L = jnp.where(cols == j, c_sub, L)
        U = jnp.where(rows == j, c_lane, U)
        dinv_row = jnp.where(_lane_iota(dinv_row.shape) == j,
                             dinv[0:1, :], dinv_row)
        A = A - c_sub * c_lane
    return L, U, dinv_row


def _solve_chol(L, U, dinv_row, r_row, n, SP):
    """(L L')^{-1} r for a lane-vector rhs, via two column-oriented
    substitutions (U supplies L's rows in lane orientation)."""
    # forward: L w = r
    w = jnp.zeros_like(r_row)
    acc = jnp.zeros_like(r_row)
    for j in range(n):
        wj = (_scal(r_row, j) - _scal(acc, j)) * _scal(dinv_row, j)
        w = jnp.where(_lane_iota(w.shape) == j, wj, w)
        lcol = _sub_extract(U, j)[0:1, :]       # L[:, j] as a lane row
        acc = acc + wj * lcol
    # backward: L' x = w
    x = jnp.zeros_like(r_row)
    acc = jnp.zeros_like(r_row)
    for j in range(n - 1, -1, -1):
        xj = (_scal(w, j) - _scal(acc, j)) * _scal(dinv_row, j)
        x = jnp.where(_lane_iota(x.shape) == j, xj, x)
        lrow = _sub_extract(L, j)[0:1, :]       # L[j, :] = L'[:, j] row
        acc = acc + xj * lrow
    return x


def _dense_kernel(nz, nb_dummy, ngd, K, mu_scal, mu_tol, alpha_min, mu0,
                  *refs):
    (Hd_ref, G_ref, eyez_ref, eyeg_ref, mz_ref, mg_ref,
     gd_ref, lbz_ref, ubz_ref, dlg_ref, dug_ref, y0_ref,
     y_out, kk_out, mu_out, st_out) = refs[:16]
    (y_s, tlo_s, tup_s, llo_s, lup_s, sglo_s, sgup_s, glo_s, gup_s,
     mu_s, frz_s, kk_s) = refs[16:]

    SPZ = Hd_ref.shape[0]
    SPG = G_ref.shape[0]
    it = pl.program_id(0)
    dt = y_s.dtype
    one = jnp.ones((1, LANES), dt)
    zero = jnp.zeros((1, LANES), dt)
    mz = _vrow(mz_ref)
    mg = _vrow(mg_ref)
    gd = _vrow(gd_ref)
    lbz = _vrow(lbz_ref)
    ubz = _vrow(ubz_ref)
    dlg = _vrow(dlg_ref)
    dug = _vrow(dug_ref)
    G = G_ref[...]
    Hd = Hd_ref[...]
    eyez = eyez_ref[...]
    eyeg = eyeg_ref[...]
    thr0 = jnp.asarray(0.1, dt)

    def masked_z(v):
        return jnp.where(mz > 0, v, 0.0)

    def masked_g(v):
        return jnp.where(mg > 0, v, 0.0)

    def Gmatvec(y_row):
        """(G y) as a lane vector over the ngd rows."""
        p = G * jnp.broadcast_to(y_row, (SPG, LANES))
        col = jnp.sum(p, axis=1, keepdims=True)
        return _sub_to_lane(jnp.broadcast_to(col, (SPG, LANES)))

    def GTvec(v_row):
        """G' v for a row-space lane vector -> z-space lane vector."""
        vs = _lane_to_sub(v_row, SPG)
        return jnp.sum(G * vs, axis=0, keepdims=True)

    # ---- one-time init (d_init_var twin; see ipm_dense.solve_dense_ref)
    # y0_ref carries the warm-start iterate (zeros = cold; the
    # d_init_var box-violation clamp below applies to it either way —
    # the reference's warm_start contract, d_ip2_res_hard.c:116 arg 6)
    @pl.when(it == 0)
    def _():
        y0 = masked_z(_vrow(y0_ref))
        t_lo0 = masked_z(y0 - lbz)
        t_up0 = masked_z(ubz - y0)
        both = (t_lo0 < thr0) & (t_up0 < thr0) & (mz > 0)
        lo_o = (t_lo0 < thr0) & ~both & (mz > 0)
        up_o = (t_up0 < thr0) & ~both & (mz > 0)
        t_lo = jnp.where(both | lo_o, thr0, t_lo0)
        t_up = jnp.where(both | up_o, thr0, t_up0)
        y0 = jnp.where(both, 0.5 * (lbz - ubz),
                       jnp.where(lo_o, lbz + thr0,
                                 jnp.where(up_o, ubz - thr0, y0)))
        y0 = masked_z(y0)
        t_lo = jnp.where(mz > 0, t_lo, 1.0)
        t_up = jnp.where(mz > 0, t_up, 1.0)
        y_s[0:1, :] = y0
        tlo_s[0:1, :] = t_lo
        tup_s[0:1, :] = t_up
        llo_s[0:1, :] = jnp.where(mz > 0, mu0 / t_lo, 0.0)
        lup_s[0:1, :] = jnp.where(mz > 0, mu0 / t_up, 0.0)
        cz = Gmatvec(y0)
        sg_lo = jnp.maximum(thr0, cz - dlg)
        sg_up = jnp.maximum(thr0, dug - cz)
        sg_lo = jnp.where(mg > 0, sg_lo, 1.0)
        sg_up = jnp.where(mg > 0, sg_up, 1.0)
        sglo_s[0:1, :] = sg_lo
        sgup_s[0:1, :] = sg_up
        glo_s[0:1, :] = jnp.where(mg > 0, mu0 / sg_lo, 0.0)
        gup_s[0:1, :] = jnp.where(mg > 0, mu0 / sg_up, 0.0)
        mu_s[0:1, :] = jnp.full((1, LANES), mu0, dt)
        frz_s[0:1, :] = zero
        kk_s[0:1, :] = zero

    live = (frz_s[0:1, :] == 0.0) & (mu_s[0:1, :] > mu_tol)

    @pl.when(jnp.any(live))
    def _():
        y = y_s[0:1, :]
        t_lo, t_up = tlo_s[0:1, :], tup_s[0:1, :]
        lam_lo, lam_up = llo_s[0:1, :], lup_s[0:1, :]
        sg_lo, sg_up = sglo_s[0:1, :], sgup_s[0:1, :]
        lg_lo, lg_up = glo_s[0:1, :], gup_s[0:1, :]
        mu = mu_s[0:1, :]

        ti_lo, ti_up = 1.0 / t_lo, 1.0 / t_up
        si_lo, si_up = 1.0 / sg_lo, 1.0 / sg_up
        lt_lo, lt_up = lam_lo * ti_lo, lam_up * ti_up
        gt_lo, gt_up = lg_lo * si_lo, lg_up * si_up
        Qxz = masked_z(lt_lo + lt_up)
        qxz = masked_z((-lam_lo - lt_lo * lbz)
                       + (lam_up - lt_up * ubz))
        Qxg = masked_g(gt_lo + gt_up)
        qxg = masked_g((-lg_lo - gt_lo * dlg) + (lg_up - gt_up * dug))

        # Hbar = Hd + diag(Qxz) + G' diag(Qxg) G (row-scaled fold; the
        # rank-ngd product contracts over sublanes)
        Qxg_sub = _lane_to_sub(Qxg, SPG)
        Gq = G * Qxg_sub
        prod = jax.lax.dot_general(
            G, Gq, (((0,), (0,)), ((), ())),
            preferred_element_type=dt,
        )  # (LANES, LANES): [z1, z2]
        Hbar = Hd + eyez * jnp.broadcast_to(Qxz, (SPZ, LANES)) \
            + prod[:SPZ, :]
        g_eff = gd + qxz + GTvec(qxg)

        L, U, dinv_row = _chol_tall(Hbar, nz, SPZ)

        y1 = _solve_chol(L, U, dinv_row, -g_eff, nz, SPZ)

        def dirs(y_new, dl0_lo, dl0_up, dg0_lo, dg0_up):
            dt_lo = masked_z((y_new - lbz) - t_lo)
            dt_up = masked_z((ubz - y_new) - t_up)
            dl_lo = masked_z(dl0_lo - lt_lo * dt_lo - lam_lo)
            dl_up = masked_z(dl0_up - lt_up * dt_up - lam_up)
            czn = Gmatvec(y_new)
            ds_lo = masked_g((czn - dlg) - sg_lo)
            ds_up = masked_g((dug - czn) - sg_up)
            dg_lo = masked_g(dg0_lo - gt_lo * ds_lo - lg_lo)
            dg_up = masked_g(dg0_up - gt_up * ds_up - lg_up)
            return (dt_lo, dt_up, dl_lo, dl_up,
                    ds_lo, ds_up, dg_lo, dg_up)

        def alpha_of(d):
            cands = one
            for v, dv, m in ((lam_lo, d[2], mz), (lam_up, d[3], mz),
                             (t_lo, d[0], mz), (t_up, d[1], mz),
                             (lg_lo, d[6], mg), (lg_up, d[7], mg),
                             (sg_lo, d[4], mg), (sg_up, d[5], mg)):
                pred = (dv < 0.0) & (m > 0)
                r = jnp.where(pred, -v / jnp.where(pred, dv, -1.0),
                              _BIG)
                cands = jnp.minimum(cands, r)
            a = jnp.min(cands, axis=1, keepdims=True)
            return jnp.broadcast_to(a, (1, LANES))

        def mu_of(ll, tl, lu, tu, gl, sl, gu, su):
            s = (jnp.sum(masked_z(ll * tl) + masked_z(lu * tu),
                         axis=1, keepdims=True)
                 + jnp.sum(masked_g(gl * sl) + masked_g(gu * su),
                           axis=1, keepdims=True))
            return jnp.broadcast_to(s, (1, LANES)) * mu_scal

        d1 = dirs(y1, zero, zero, zero, zero)
        a_aff = alpha_of(d1) * 0.995
        mu_aff = mu_of(lam_lo + a_aff * d1[2], t_lo + a_aff * d1[0],
                       lam_up + a_aff * d1[3], t_up + a_aff * d1[1],
                       lg_lo + a_aff * d1[6], sg_lo + a_aff * d1[4],
                       lg_up + a_aff * d1[7], sg_up + a_aff * d1[5])
        sigma = (mu_aff / mu) ** 3
        sm = sigma * mu

        dl2_lo = masked_z(ti_lo * (sm - d1[2] * d1[0]))
        dl2_up = masked_z(ti_up * (sm - d1[3] * d1[1]))
        dg2_lo = masked_g(si_lo * (sm - d1[6] * d1[4]))
        dg2_up = masked_g(si_up * (sm - d1[7] * d1[5]))
        qxz2 = qxz + (-dl2_lo + dl2_up)
        qxg2 = qxg + (-dg2_lo + dg2_up)
        g_eff2 = gd + qxz2 + GTvec(qxg2)
        y2 = _solve_chol(L, U, dinv_row, -g_eff2, nz, SPZ)
        d2_ = dirs(y2, dl2_lo, dl2_up, dg2_lo, dg2_up)
        a2 = alpha_of(d2_) * 0.995

        y_n = masked_z(y + a2 * (y2 - y))
        t_lo_n = t_lo + a2 * d2_[0]
        t_up_n = t_up + a2 * d2_[1]
        lam_lo_n = lam_lo + a2 * d2_[2]
        lam_up_n = lam_up + a2 * d2_[3]
        sg_lo_n = sg_lo + a2 * d2_[4]
        sg_up_n = sg_up + a2 * d2_[5]
        lg_lo_n = lg_lo + a2 * d2_[6]
        lg_up_n = lg_up + a2 * d2_[7]
        mu_n = mu_of(lam_lo_n, t_lo_n, lam_up_n, t_up_n,
                     lg_lo_n, sg_lo_n, lg_up_n, sg_up_n)

        # step_ok twin: non-finite or f32 divergence from below-floor mu
        mu_sc = mu_n
        ok = ((mu_sc == mu_sc) & (jnp.abs(mu_sc) < _BIG)
              & ~((mu_sc > 10.0 * mu) & (mu < 1e-3)))
        upd = live & ok

        def put(ref, new, old):
            ref[0:1, :] = jnp.where(upd, new, old)

        put(y_s, y_n, y)
        put(tlo_s, t_lo_n, t_lo)
        put(tup_s, t_up_n, t_up)
        put(llo_s, lam_lo_n, lam_lo)
        put(lup_s, lam_up_n, lam_up)
        put(sglo_s, sg_lo_n, sg_lo)
        put(sgup_s, sg_up_n, sg_up)
        put(glo_s, lg_lo_n, lg_lo)
        put(gup_s, lg_up_n, lg_up)
        put(mu_s, mu_n, mu)
        frz_s[0:1, :] = jnp.where(
            live & (~ok | (a2 < alpha_min)), one, frz_s[0:1, :])
        kk_s[0:1, :] = kk_s[0:1, :] + jnp.where(upd, one, zero)

    # ---- every-step output refresh (last write wins) --------------------
    y_out[0:1, :] = y_s[0:1, :]
    kk_out[0:1, :] = kk_s[0:1, :]
    mu_out[0:1, :] = mu_s[0:1, :]
    st_out[0:1, :] = jnp.where(
        mu_s[0:1, :] <= mu_tol, 0.0,
        jnp.where(frz_s[0:1, :] > 0, 2.0, 1.0))


@functools.partial(jax.jit, static_argnames=("plan_static", "cfg_static"))
def _dense_call(plan_static, cfg_static, Hd_t, G_t, gd, lbz, ubz,
                mz, mg, dlg, dug, y0):
    nz, ngd = plan_static
    k_max, mu0, mu_tol, alpha_min, mu_scal = cfg_static
    dt = Hd_t.dtype
    SPZ = Hd_t.shape[0]
    SPG = G_t.shape[0]

    def pad_row(v, n):
        out = jnp.zeros((1, LANES), dt)
        return out.at[0, :n].set(v.astype(dt))

    eyez = (jax.lax.broadcasted_iota(jnp.int32, (SPZ, LANES), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (SPZ, LANES), 1)
            ).astype(dt)
    eyeg = (jax.lax.broadcasted_iota(jnp.int32, (SPG, LANES), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (SPG, LANES), 1)
            ).astype(dt)

    args = [Hd_t, G_t, eyez, eyeg,
            pad_row(mz, nz), pad_row(mg, ngd),
            pad_row(gd, nz), pad_row(lbz, nz), pad_row(ubz, nz),
            pad_row(dlg, ngd), pad_row(dug, ngd), pad_row(y0, nz)]
    full = lambda a: pl.BlockSpec(  # noqa: E731
        a.shape, lambda it: (0,) * a.ndim, memory_space=pltpu.VMEM)
    in_specs = [full(a) for a in args]
    row_spec = pl.BlockSpec((1, LANES), lambda it: (0, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [row_spec] * 4
    out_shape = [jax.ShapeDtypeStruct((1, LANES), dt)] * 4
    kernel = functools.partial(
        _dense_kernel, nz, 0, ngd, k_max,
        # python floats: trace-time constants inside the kernel body
        # (traced operands would be captured consts, which pallas rejects)
        float(mu_scal), float(mu_tol), float(alpha_min), float(mu0),
    )
    scr = [pltpu.VMEM((8, LANES), dt) for _ in range(12)]
    y_o, kk_o, mu_o, st_o = pcall(
        kernel,
        grid=(k_max,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scr,
    )(*args)
    return y_o, kk_o, mu_o, st_o


def dense_ipm_call(plan, bflat, cfg, y0=None):
    """Tick entry: apply the affine vector-condense maps (z-aligned via
    ``Sel``) and run the whole dense IPM in one pallas_call.  ``y0``:
    warm-start iterate (previous tick's y — the RTI hot loop); None =
    cold (zeros).  Returns (y (nz,), kk, mu, status)."""
    dt = plan.Hd.dtype
    nz, ngd = plan.nz, plan.ngd
    assert nz <= LANES and ngd <= LANES, (
        "dense latency kernel v1 supports nz, ngd <= 128 "
        f"(got {nz}, {ngd}); larger condensed problems take the "
        "sequential engines")
    SPZ, SPG = _rup8(max(nz, 8)), _rup8(max(ngd, 8))

    gd = plan.gd_c + plan.gd_m @ bflat
    lb = plan.lb_c + plan.lb_m @ bflat
    ub = plan.ub_c + plan.ub_m @ bflat
    dlg = plan.dlg_c + plan.dlg_m @ bflat
    dug = plan.dug_c + plan.dug_m @ bflat
    # z-aligned box data (Sel is one-hot; unboxed coords masked)
    mz = plan.Sel @ jnp.ones((plan.nb,), dt)
    lbz = plan.Sel @ lb
    ubz = plan.Sel @ ub
    mg = jnp.ones((ngd,), dt)

    Hd_t = jnp.zeros((SPZ, LANES), dt).at[:nz, :nz].set(plan.Hd)
    G_t = jnp.zeros((SPG, LANES), dt).at[:ngd, :nz].set(plan.G)

    n_con = 2 * (plan.nb + ngd)
    if y0 is None:
        y0 = jnp.zeros((nz,), dt)
    y_o, kk_o, mu_o, st_o = _dense_call(
        (nz, ngd),
        (int(cfg.k_max), float(cfg.mu0), float(cfg.mu_tol),
         float(cfg.alpha_min), 1.0 / n_con),
        Hd_t, G_t, gd, lbz, ubz, mz, mg, dlg, dug, y0,
    )
    return (y_o[0, :nz], kk_o[0, 0].astype(jnp.int32), mu_o[0, 0],
            st_o[0, 0].astype(jnp.int32))
