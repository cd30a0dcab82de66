"""Pallas TPU kernel: fused batched Riccati stage recursion.

The performance core of the framework — the TPU equivalent of the
reference's fused ``dsyrk_dpotrf`` panel kernels
(``kernel/avx/kernel_dpotrf_avx_lib4.c:402``; SURVEY.md §2.3 calls this
fusion "the single most important performance idea").  The XLA scan path
executes the ~2k tiny (NZ x NZ) ops of each stage as separate HBM-bound
kernels; here the ENTIRE backward sweep (trmm -> syrk+potrf -> gradient
recursion, every stage) runs as ONE kernel whose intermediates never leave
VMEM.

Layout: instances are block-batched into the vector lanes (SURVEY.md §7
"tiny-matrix MXU utilization"): each grid block processes BI = 8*128 = 1024
instances, every small-matrix scalar living as an (8, 128) f32 tile.
Arrays are transposed to batch-last (stage, row, col, 8, 128) around the
kernel.  The stage loop is the Pallas grid's minor dimension (grid
iterations run sequentially on TPU), with the Cholesky factor / value
gradient carried across stages in VMEM scratch.

Small-matrix algebra (Cholesky, triangular solves, matmuls) is unrolled in
Python over the static NZ/NX/NU dims — hundreds of fused VPU ops per stage
instead of hundreds of dispatched XLA kernels.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBS = 8
BI = SUBS * LANES  # instances per grid block


_MOSAIC_DEFAULT_VMEM = 16 << 20  # Mosaic's scoped-VMEM cap when unset
_AUTO_VMEM_MAX = 112 << 20       # headroom under v5e/v5p's 128 MiB VMEM


def _vmem_cap() -> int:
    """Ceiling the auto policy may raise a kernel's scoped-VMEM cap to.
    ``HPMPC_VMEM_LIMIT_MB`` pins a fixed cap instead (0 = Mosaic
    default); unset/auto allows up to ``_AUTO_VMEM_MAX``."""
    v = os.environ.get("HPMPC_VMEM_LIMIT_MB", "auto")
    if v in ("auto", ""):
        return _AUTO_VMEM_MAX
    mb = int(v)
    return (mb if mb > 0 else 16) << 20


def _block_bytes(spec, arg):
    if getattr(spec, "memory_space", None) is pltpu.SMEM:
        return 0
    shape = getattr(spec, "block_shape", None)
    if shape is None:
        shape = arg.shape
    n = 1
    for d in shape:
        n *= int(d) if d is not None else 1
    return n * np.dtype(arg.dtype).itemsize


def pcall(kernel, **kwargs):
    """``pl.pallas_call`` with a size-adaptive scoped-VMEM cap.

    Mosaic's default cap is 16 MiB; the per-scalar-tile stage kernels'
    working set grows O(NZ^2) tiles and crosses it around NZ~20 (nx=16
    nu=3 mega / nx=24 flat fail compile at the default — measured on
    v5e, tools/bench_size_sweep.py).  BUT a blanket raised cap also
    changes Mosaic's pipelining choices for kernels that never needed
    it: the validated NZ=11 mega engine drops 481k -> 350k solves/s
    under a flat 100 MiB cap (v5e A/B 2026-08-19).  So the cap is
    raised per-call, and only when the estimated block working set
    (in/out blocks double-buffered + VMEM scratch) exceeds the Mosaic
    default — small kernels compile exactly as before.
    ``HPMPC_VMEM_LIMIT_MB`` pins a fixed cap for A/B (0 = never raise).
    """
    if "compiler_params" in kwargs:
        return pl.pallas_call(kernel, **kwargs)

    def _dispatch(*args):
        est = 0
        in_specs = kwargs.get("in_specs") or []
        for spec, arg in zip(in_specs, args):
            est += 2 * _block_bytes(spec, arg)
        out_specs = kwargs.get("out_specs")
        out_shape = kwargs.get("out_shape")
        if out_specs is not None and out_shape is not None:
            o_specs = out_specs if isinstance(out_specs, (list, tuple)) else [out_specs]
            o_shapes = out_shape if isinstance(out_shape, (list, tuple)) else [out_shape]
            for spec, sd in zip(o_specs, o_shapes):
                est += 2 * _block_bytes(spec, sd)
        for scr in kwargs.get("scratch_shapes") or []:
            shape = getattr(scr, "shape", None)
            dtype = getattr(scr, "dtype", None)
            if shape is not None and dtype is not None:
                n = 1
                for d in shape:
                    n *= int(d)
                est += n * np.dtype(dtype).itemsize
        kw = kwargs
        if est > int(0.75 * _MOSAIC_DEFAULT_VMEM):
            cap = min(max(2 * est, 32 << 20), _vmem_cap())
            kw = {**kwargs, "compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=int(cap))}
        return pl.pallas_call(kernel, **kw)(*args)

    return _dispatch


def engine_vmem_bytes(NX: int, NU: int) -> int:
    """Scoped-VMEM estimate (bytes) of the heaviest per-grid-step working
    set of the flat/lanes/mega stage kernels at one (8,128)-tile per
    scalar.

    Dominant blocks per stage: the packed lower-triangle pair stream
    (sym_nt(NZ) tiles), the Ll factor (NZ*NU), the Lxx factor (NX*NX) and
    a few NZ-vectors — times ~4x for Mosaic's double-buffering of ins and
    outs.  Calibrated on v5e Mosaic stack-OOM reports (nx=32 nu=4: flat
    26.3 MiB, mega 30.3 MiB; this model gives 31 MiB).
    """
    NZ = NX + NU
    tiles = 4 * (_sym_nt(NZ) + NZ * NU + NX * NX + 4 * NZ)
    return tiles * 4 * SUBS * LANES


def engine_fits(NX: int, NU: int, lanes: bool = False) -> bool:
    """Whether the per-scalar-tile Pallas engines fit VMEM at this
    problem size (the dispatch rule measured by
    tools/bench_size_sweep.py on v5e).

    ``lanes=False`` gates the flat engine (measured: compiles and
    validates through nx=48 nu=6, NZ=54 — estimate 67.6 MiB).
    ``lanes=True`` gates the lanes/mega engine, whose folded
    half-iteration kernels hold ~2.35x the flat working set (measured:
    OK at nx=32 nu=4; 158.6 MiB of 128 MiB at nx=48 nu=6 — 2.35 x the
    67.6 MiB estimate, exactly).  Beyond its bound the lanes dispatch
    falls back to the flat engine; beyond the flat bound the vmapped
    structured path (size-independent code, MXU-tiled) takes over."""
    mult = 2.35 if lanes else 1.0
    return mult * engine_vmem_bytes(NX, NU) <= int(0.9 * _vmem_cap())


# ---------------------------------------------------------------------------
# tiny-matrix helpers on lists of (8, 128) tiles
# ---------------------------------------------------------------------------


def _mat(ref, r, c):
    """Load an (r, c) matrix of (8,128) scalars from a (1,1, r, c, 8,128) ref."""
    return [[ref[0, 0, i, j] for j in range(c)] for i in range(r)]


def _sym_nt(n):
    return n * (n + 1) // 2


def _sym_idx(i, j):
    """Packed index of the (i, j) entry, j <= i, in a row-major
    lower-triangle stream."""
    return i * (i + 1) // 2 + j


def _mat_sym(ref, n):
    """Load a symmetric (n, n) matrix from a PACKED lower-triangle ref
    (1, 1, n(n+1)/2, 8, 128).  Upper entries are mirrored loads of the
    same packed element (Mosaic CSEs duplicate loads, so the mirror is
    free).  Symmetric streams (the stage Hessian H and the barrier term
    C'diag(qx)C) carry 66 instead of 121 subtiles per stage at NZ=11 —
    H is the single largest constant stream of the backward-sweep and
    residual kernels, re-fetched from HBM every IPM iteration."""
    return [
        [ref[0, 0, _sym_idx(max(i, j), min(i, j))] for j in range(n)]
        for i in range(n)
    ]


def _vec(ref, r):
    return [ref[0, 0, i] for i in range(r)]


def _store_mat(ref, M):
    for i, row in enumerate(M):
        for j, v in enumerate(row):
            ref[0, 0, i, j] = v


def _store_vec(ref, v):
    for i, x in enumerate(v):
        ref[0, 0, i] = x


def _chol(M, n):
    """In-place lower Cholesky on an n x n list-of-lists of (8,128) tiles;
    returns (L, Dinv) with Dinv the reciprocal diagonal (the reference's
    inv_diag_D output)."""
    L = [[None] * n for _ in range(n)]
    Dinv = [None] * n
    A = [[M[i][j] for j in range(n)] for i in range(n)]
    for j in range(n):
        d = jax.lax.rsqrt(jnp.maximum(A[j][j], 1e-20))
        Dinv[j] = d
        L[j][j] = A[j][j] * d
        for i in range(j + 1, n):
            L[i][j] = A[i][j] * d
        for jj in range(j + 1, n):
            for i in range(jj, n):
                A[i][jj] = A[i][jj] - L[i][j] * L[jj][j]
    # upper triangle zeros (cheap constants)
    z = L[0][0] * 0.0
    for i in range(n):
        for j in range(i + 1, n):
            L[i][j] = z
    return L, Dinv


def _tril_solve(L, Dinv, b, n):
    """y = L^{-1} b via forward substitution (unrolled)."""
    y = [None] * n
    for i in range(n):
        acc = b[i]
        for j in range(i):
            acc = acc - L[i][j] * y[j]
        y[i] = acc * Dinv[i]
    return y


def _triu_solve_t(L, Dinv, b, n):
    """y = L^{-T} b (backward substitution on the transpose)."""
    y = [None] * n
    for i in reversed(range(n)):
        acc = b[i]
        for j in range(i + 1, n):
            acc = acc - L[j][i] * y[j]
        y[i] = acc * Dinv[i]
    return y


# ---------------------------------------------------------------------------
# shared per-stage bodies (trace-time Python, like _chol): the sequential
# sweep kernels and their fused two-phase twins call the SAME helpers, so
# a numeric fix lands in every variant at once
# ---------------------------------------------------------------------------


def _dinv_ll(Ll, NU):
    return [
        pl.reciprocal(jnp.maximum(Ll[i][i], 1e-30), approx=False)
        for i in range(NU)
    ]


def _pb_of(Lxx, bb, NX):
    """Pb = Lxx (Lxx' b) on a lower-triangular Lxx."""
    t1 = [None] * NX
    for i in range(NX):
        acc = None
        for k in range(i, NX):
            t = Lxx[k][i] * bb[k]
            acc = t if acc is None else acc + t
        t1[i] = acc
    Pb = [None] * NX
    for i in range(NX):
        acc = None
        for k in range(i + 1):
            t = Lxx[i][k] * t1[k]
            acc = t if acc is None else acc + t
        Pb[i] = acc
    return Pb


def _trs_stage(NU, NX, NZ, Ll, Dinv_u, g, F, Pbpx, is_t):
    """Backward-substitution stage on the split factor: m = g (terminal)
    or g + F (Pb + px_next); eu = Luu^{-1} m_u; px = m_x - Lxu eu."""
    m_i = []
    for i in range(NZ):
        acc = g[i]
        for k in range(NX):
            acc = acc + F[i][k] * Pbpx[k]
        m_i.append(acc)
    m = [jnp.where(is_t, g[i], m_i[i]) for i in range(NZ)]
    eu = _tril_solve(
        [[Ll[i][j] for j in range(NU)] for i in range(NU)], Dinv_u, m[:NU], NU
    )
    px = []
    for i in range(NX):
        acc = m[NU + i]
        for k in range(NU):
            acc = acc - Ll[NU + i][k] * eu[k]
        px.append(acc)
    return eu, px


def _root_x0(Lxx, px, NX):
    """x0 = -(Lxx Lxx')^{-1} px (free/eliminated initial state)."""
    Dinv_x = [
        pl.reciprocal(jnp.maximum(Lxx[i][i], 1e-30), approx=False)
        for i in range(NX)
    ]
    t = _tril_solve(Lxx, Dinv_x, [-v for v in px], NX)
    return _triu_solve_t(Lxx, Dinv_x, t, NX)


def _u_of_x(NU, NX, Ll, Dinv_u, eu, x):
    """u = -Luu^{-T}(eu + Lxu' x)."""
    rhs = []
    for i in range(NU):
        acc = eu[i]
        for k in range(NX):
            acc = acc + Ll[NU + k][i] * x[k]
        rhs.append(acc)
    u = _triu_solve_t(
        [[Ll[i][j] for j in range(NU)] for i in range(NU)], Dinv_u, rhs, NU
    )
    return [-v for v in u]


def _pi_of_x(NX, Lxx, px, x):
    """pi = Lxx (Lxx' x) + px."""
    t1 = [None] * NX
    for i in range(NX):
        acc = None
        for k in range(i, NX):
            t = Lxx[k][i] * x[k]
            acc = t if acc is None else acc + t
        t1[i] = acc
    pi = []
    for i in range(NX):
        acc = px[i]
        for k in range(i + 1):
            acc = acc + Lxx[i][k] * t1[k]
        pi.append(acc)
    return pi


def _x_next_of(NU, NX, F, bb, u, x):
    """x_{s+1} = b_s + F_s' [u_s; x_s]."""
    out = []
    for j in range(NX):
        acc = bb[j]
        for i in range(NU):
            acc = acc + F[i][j] * u[i]
        for i in range(NX):
            acc = acc + F[NU + i][j] * x[i]
        out.append(acc)
    return out


def _folded_bwd_stage(NU, NX, NZ, N, ng_stage_ids, s,
                      H_ref, dvec_ref, ng_ref, g_ref, F_ref, b_ref,
                      Lxx_c, px_c):
    """One folded backward-Riccati stage (packed-H assembly + zero-carry
    terminal + trmm/syrk + Cholesky + eu/px); updates the Lxx/px VMEM
    carries and returns (Lf, eu, px, Pb).  Pb is the zero vector at the
    terminal step (zero carry) — callers decide where to store it."""
    NT = _sym_nt(NZ)
    Hp = [H_ref[0, 0, t] for t in range(NT)]
    dv = _vec(dvec_ref, NZ)
    for i in range(NZ):
        di = _sym_idx(i, i)
        Hp[di] = Hp[di] + dv[i]
    if len(ng_stage_ids):
        stage_match = None
        for stg in ng_stage_ids:
            m = (s == N - stg)
            stage_match = m if stage_match is None else (stage_match | m)
        for t in range(NT):
            Hp[t] = Hp[t] + jnp.where(stage_match, ng_ref[0, 0, t], 0.0)
    g = _vec(g_ref, NZ)
    return _folded_bwd_core(NU, NX, NZ, s, Hp, g, F_ref, b_ref,
                            Lxx_c, px_c)


def _folded_bwd_core(NU, NX, NZ, s, Hp, g, F_ref, b_ref, Lxx_c, px_c):
    """The trmm/syrk/Cholesky/eu/px core on an ALREADY-ASSEMBLED packed
    effective Hessian ``Hp`` and gradient ``g`` (lists of tiles) — shared
    by the folded sweep kernels and the mega-sweep kernels (which build
    Hp/g from the barrier state in the same grid step)."""
    return _folded_bwd_core_fb(
        NU, NX, NZ, s, Hp, g, _mat(F_ref, NZ, NX), _vec(b_ref, NX),
        Lxx_c, px_c,
    )


def _folded_bwd_core_fb(NU, NX, NZ, s, Hp, g, F, bb, Lxx_c, px_c):
    """:func:`_folded_bwd_core` with F/b as tile LISTS — for callers that
    slice per-stage data out of whole-array resident blocks (the
    solver-resident giga kernel, ``ops/resident_kernel.py``)."""
    # terminal stage (s == 0): zero the carry BEFORE it is read, so the
    # interior formulas collapse EXACTLY to the terminal ones (W = F·0 = 0
    # -> M = H bit-for-bit, Pb = 0, m = g) — no per-entry selects
    zero_t = Hp[0] * 0.0

    @pl.when(s == 0)
    def _():
        for i in range(NX):
            px_c[i] = zero_t
            for j in range(NX):
                Lxx_c[i, j] = zero_t
    Lxx = [[Lxx_c[i, j] for j in range(NX)] for i in range(NX)]
    pxn = [px_c[i] for i in range(NX)]
    W = [[None] * NX for _ in range(NZ)]
    for i in range(NZ):
        for j in range(NX):
            acc = None
            for k in range(j, NX):
                t = F[i][k] * Lxx[k][j]
                acc = t if acc is None else acc + t
            W[i][j] = acc
    Pb = _pb_of(Lxx, bb, NX)
    m = []
    for i in range(NZ):
        acc = g[i]
        for k in range(NX):
            acc = acc + F[i][k] * (Pb[k] + pxn[k])
        m.append(acc)
    M = [[None] * NZ for _ in range(NZ)]
    for i in range(NZ):
        for j in range(i + 1):
            acc = Hp[_sym_idx(i, j)]
            for k in range(NX):
                acc = acc + W[i][k] * W[j][k]
            M[i][j] = acc
            M[j][i] = acc

    Lf, Dinv = _chol(M, NZ)
    eu = _tril_solve(
        [[Lf[i][j] for j in range(NU)] for i in range(NU)],
        Dinv[:NU], m[:NU], NU,
    )
    px = []
    for i in range(NX):
        acc = m[NU + i]
        for k in range(NU):
            acc = acc - Lf[NU + i][k] * eu[k]
        px.append(acc)

    for i in range(NX):
        px_c[i] = px[i]
        for j in range(NX):
            Lxx_c[i, j] = Lf[NU + i][NU + j]
    return Lf, eu, px, Pb


# ---------------------------------------------------------------------------
# backward sweep kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(NU, NX, NZ, N,
                H_ref, g_ref, F_ref, b_ref,
                L_ref, eu_ref, px_ref, Pb_ref,
                Lxx_c, px_c):
    s = pl.program_id(1)

    H = _mat(H_ref, NZ, NZ)
    g = _vec(g_ref, NZ)

    def terminal():
        return H, g

    def interior():
        F = _mat(F_ref, NZ, NX)
        bb = _vec(b_ref, NX)
        Lxx = [[Lxx_c[i, j] for j in range(NX)] for i in range(NX)]
        pxn = [px_c[i] for i in range(NX)]
        # W = F Lxx (NZ x NX, Lxx lower)
        W = [[None] * NX for _ in range(NZ)]
        for i in range(NZ):
            for j in range(NX):
                acc = None
                for k in range(j, NX):  # Lxx lower: Lxx[k][j] nonzero for k>=j
                    t = F[i][k] * Lxx[k][j]
                    acc = t if acc is None else acc + t
                W[i][j] = acc
        # Pb = Lxx (Lxx' b)
        t1 = [None] * NX
        for i in range(NX):
            acc = None
            for k in range(i, NX):
                t = Lxx[k][i] * bb[k]
                acc = t if acc is None else acc + t
            t1[i] = acc
        Pb = [None] * NX
        for i in range(NX):
            acc = None
            for k in range(i + 1):
                t = Lxx[i][k] * t1[k]
                acc = t if acc is None else acc + t
            Pb[i] = acc
        _store_vec(Pb_ref, Pb)
        # m = g + F (Pb + px)
        m = []
        for i in range(NZ):
            acc = g[i]
            for k in range(NX):
                acc = acc + F[i][k] * (Pb[k] + pxn[k])
            m.append(acc)
        # M = H + W W'
        M = [[None] * NZ for _ in range(NZ)]
        for i in range(NZ):
            for j in range(i + 1):
                acc = H[i][j]
                for k in range(NX):
                    acc = acc + W[i][k] * W[j][k]
                M[i][j] = acc
                M[j][i] = acc
        return M, m

    # select terminal vs interior data (both branches cheap; predication via
    # jnp.where on the assembled tiles keeps the kernel single-program)
    M_t, m_t = terminal()
    M_i, m_i = interior()
    is_t = s == 0
    M = [[jnp.where(is_t, M_t[i][j], M_i[i][j]) for j in range(NZ)] for i in range(NZ)]
    m = [jnp.where(is_t, m_t[i], m_i[i]) for i in range(NZ)]

    Lf, Dinv = _chol(M, NZ)
    eu = _tril_solve(
        [[Lf[i][j] for j in range(NU)] for i in range(NU)],
        Dinv[:NU],
        m[:NU],
        NU,
    )
    px = []
    for i in range(NX):
        acc = m[NU + i]
        for k in range(NU):
            acc = acc - Lf[NU + i][k] * eu[k]
        px.append(acc)

    _store_mat(L_ref, Lf)
    zero = Lf[0][0] * 0.0
    _store_vec(eu_ref, eu + [zero] * (NZ - NU))
    _store_vec(px_ref, px)
    for i in range(NX):
        px_c[i] = px[i]
        for j in range(NX):
            Lxx_c[i, j] = Lf[NU + i][NU + j]


def _fwd_kernel(NU, NX, NZ, N,
                L_ref, Lnext_ref, eu_ref, pxself_ref, pxnext_ref, F_ref, b_ref,
                z_ref, pi_ref, x_c):
    s = pl.program_id(1)

    Lf = _mat(L_ref, NZ, NZ)
    Dinv_u = [pl.reciprocal(jnp.maximum(Lf[i][i], 1e-30), approx=False) for i in range(NU)]
    eu = _vec(eu_ref, NZ)[:NU]

    # x at this stage: root solves P0 x = -px (handled by caller passing the
    # solved x0 via x_c init? -> we initialize x_c at s==0 from the full
    # solve of stage 0 using L itself)
    @pl.when(s == 0)
    def _():
        # x0 = -(Lxx Lxx')^{-1} px0
        px0 = _vec(pxself_ref, NX)
        Lxx = [[Lf[NU + i][NU + j] for j in range(NX)] for i in range(NX)]
        Dinv_x = [pl.reciprocal(jnp.maximum(Lxx[i][i], 1e-30), approx=False) for i in range(NX)]
        t = _tril_solve(Lxx, Dinv_x, [-v for v in px0], NX)
        x0 = _triu_solve_t(Lxx, Dinv_x, t, NX)
        for i in range(NX):
            x_c[i] = x0[i]

    x = [x_c[i] for i in range(NX)]
    # u = -Luu^{-T}(eu + Lxu' x)
    rhs = []
    for i in range(NU):
        acc = eu[i]
        for k in range(NX):
            acc = acc + Lf[NU + k][i] * x[k]
        rhs.append(acc)
    u = _triu_solve_t(
        [[Lf[i][j] for j in range(NU)] for i in range(NU)], Dinv_u, rhs, NU
    )
    u = [-v for v in u]
    for i in range(NU):
        z_ref[0, 0, i] = u[i]
    for i in range(NX):
        z_ref[0, 0, NU + i] = x[i]

    # x_next = b + F' z ; pi = Lxx_next (Lxx_next' x_next) + px_next
    F = _mat(F_ref, NZ, NX)
    bb = _vec(b_ref, NX)
    x_next = []
    for j in range(NX):
        acc = bb[j]
        for i in range(NU):
            acc = acc + F[i][j] * u[i]
        for i in range(NX):
            acc = acc + F[NU + i][j] * x[i]
        x_next.append(acc)

    Ln = _mat(Lnext_ref, NZ, NZ)
    Lxx_n = [[Ln[NU + i][NU + j] for j in range(NX)] for i in range(NX)]
    pxn = _vec(pxnext_ref, NX)
    t1 = [None] * NX
    for i in range(NX):
        acc = None
        for k in range(i, NX):
            t = Lxx_n[k][i] * x_next[k]
            acc = t if acc is None else acc + t
        t1[i] = acc
    for i in range(NX):
        acc = pxn[i]
        for k in range(i + 1):
            acc = acc + Lxx_n[i][k] * t1[k]
        pi_ref[0, 0, i] = acc
    for i in range(NX):
        x_c[i] = x_next[i]


def _fwd_kernel_split(NU, NX, NZ, N, want_pi,
                      Ll_ref, Lxx_ref, eu_ref, px_ref, F_ref, b_ref,
                      *out_refs):
    """Forward recovery on the SPLIT factor streams, one L fetch per stage
    (the full-L variant fetches both L_s and L_{s+1} every step — 242
    subtiles/stage vs this kernel's 33+64).  Grid (nb, N+1): step s reads
    Ll_s + Lxx_s, computes x_s (carried), u_s, and pi_{s-1} (written to
    block s-1; the s==0 write of that block is dead and overwritten in
    VMEM before copy-out).  The terminal stage is handled IN-kernel (the
    u_s formula is stage-uniform), removing the full-L XLA tail.

    ``want_pi=False`` (the AFFINE predictor solve: both IPM phases use
    only the corrector's dpi, so the affine pi is dead unless iterative
    refinement consumes it) skips the pi math AND the whole Lxx stream —
    the caller pins the Lxx index map to block 0, which is still needed
    once for the s==0 initial-state solve."""
    if want_pi:
        z_ref, pi_ref, x_c = out_refs
    else:
        z_ref, x_c = out_refs
    s = pl.program_id(1)

    Ll = _mat(Ll_ref, NZ, NU)
    Lxx = _mat(Lxx_ref, NX, NX)
    Dinv_u = _dinv_ll(Ll, NU)
    eu = _vec(eu_ref, NU)
    px = _vec(px_ref, NX)

    @pl.when(s == 0)
    def _():
        x0 = _root_x0(Lxx, px, NX)
        for i in range(NX):
            x_c[i] = x0[i]

    x = [x_c[i] for i in range(NX)]

    if want_pi:
        # pi_{s-1} = Lxx_s (Lxx_s' x_s) + px_s   (dead write at s==0)
        _store_vec(pi_ref, _pi_of_x(NX, Lxx, px, x))

    u = _u_of_x(NU, NX, Ll, Dinv_u, eu, x)
    for i in range(NU):
        z_ref[0, 0, i] = u[i]
    for i in range(NX):
        z_ref[0, 0, NU + i] = x[i]

    # x_{s+1} = b_s + F_s' z_s  (carry; the s==N update is dead)
    F = _mat(F_ref, NZ, NX)
    bb = _vec(b_ref, NX)
    xn = _x_next_of(NU, NX, F, bb, u, x)
    for j in range(NX):
        x_c[j] = xn[j]


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def _to_lanes(x, B):
    """(B, ...) -> (..., 8, 128*B/1024 blocks folded into leading grid dim):
    reshape batch to (nb, 8, 128) and move it last."""
    nb = B // BI
    y = x.reshape((nb, SUBS, LANES) + x.shape[1:])
    # (nb, 8, 128, ...rest) -> (nb, ...rest, 8, 128)
    perm = (0,) + tuple(range(3, y.ndim)) + (1, 2)
    return jnp.transpose(y, perm)


def sym_compress(x):
    """(..., n, n) symmetric -> (..., n(n+1)/2) packed row-major lower
    triangle, via an exact 0/1 selection matmul (a constant-index gather
    would serialize on TPU; selection matmuls at HIGHEST precision are
    bit-exact data movement)."""
    n = x.shape[-1]
    nt = _sym_nt(n)
    sel = np.zeros((n * n, nt), np.float32)
    for i in range(n):
        for j in range(i + 1):
            sel[i * n + j, _sym_idx(i, j)] = 1.0
    selj = jnp.asarray(sel, x.dtype)
    return jnp.dot(
        x.reshape(x.shape[:-2] + (n * n,)), selj,
        precision=jax.lax.Precision.HIGHEST,
    )


def sym_pair_streams(C_stack, nz):
    """Paired C streams for assembling the PACKED barrier term
    ``C' diag(q) C`` without its tile-padded structured intermediate:
    returns (Ct1, Ct2) with ``Ct1[..., g, t] = C[..., g, zi(t)]`` and
    ``Ct2[..., g, t] = C[..., g, zj(t)]`` over the same row-major
    lower-triangle order the kernels read via ``_sym_idx`` — then
    ``ngt[..., t] = sum_g Ct1*q*Ct2`` (einsum "...gt,...g,...gt->...t").
    Co-located with the packing order so they cannot drift apart."""
    nt = _sym_nt(nz)
    sel_i = np.zeros((nz, nt), np.float32)
    sel_j = np.zeros((nz, nt), np.float32)
    for i in range(nz):
        for j in range(i + 1):
            t = _sym_idx(i, j)
            sel_i[i, t] = 1.0
            sel_j[j, t] = 1.0
    hi = jax.lax.Precision.HIGHEST
    Ct1 = jnp.einsum(
        "...gz,zt->...gt", C_stack, jnp.asarray(sel_i, C_stack.dtype),
        precision=hi,
    )
    Ct2 = jnp.einsum(
        "...gz,zt->...gt", C_stack, jnp.asarray(sel_j, C_stack.dtype),
        precision=hi,
    )
    return Ct1, Ct2


def _from_lanes(y, B):
    nb = B // BI
    perm = (0, y.ndim - 2, y.ndim - 1) + tuple(range(1, y.ndim - 2))
    x = jnp.transpose(y, perm)
    return x.reshape((B,) + x.shape[3:])


@functools.partial(jax.jit, static_argnames=("NU",))
def factor_solve_batched(H_eff, g_eff, F, b, NU):
    """Batched fused Riccati sv: inputs (B, N+1, NZ, NZ) etc., B % 1024 == 0.

    Returns (z, pi, L, eu, px, Pb) with the chain-backend shapes.
    """
    B = H_eff.shape[0]
    Np1 = H_eff.shape[1]
    N = Np1 - 1
    NZ = H_eff.shape[-1]
    NX = F.shape[-1]
    assert B % BI == 0, f"batch {B} must be a multiple of {BI}"
    nb = B // BI
    dt = H_eff.dtype

    Hl = _to_lanes(H_eff, B)   # (nb, N+1, NZ, NZ, 8, 128)
    gl = _to_lanes(g_eff, B)   # (nb, N+1, NZ, 8, 128)
    Fl = _to_lanes(F, B)       # (nb, N, NZ, NX, 8, 128)
    bl = _to_lanes(b, B)       # (nb, N, NX, 8, 128)

    # ---- backward sweep: grid (nb, N+1), stage s -> node N - s ----
    grid = (nb, Np1)

    kernel = functools.partial(_bwd_kernel, NU, NX, NZ, N)
    L_l, eu_l, px_l, Pb_l = pcall(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, NZ, NZ, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(N - s, 0, N - 1), 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(N - s, 0, N - 1), 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, NZ, NZ, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(N - s, 0, N - 1), 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, Np1, NZ, NZ, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NX, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, N, NX, SUBS, LANES), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((NX, NX, SUBS, LANES), dt),
            pltpu.VMEM((NX, SUBS, LANES), dt),
        ],
    )(Hl, gl, Fl, bl)

    # ---- forward sweep: grid (nb, N), stage s = node s ----
    fkernel = functools.partial(_fwd_kernel, NU, NX, NZ, N)
    z_l, pi_l = pcall(
        fkernel,
        grid=(nb, N),
        in_specs=[
            pl.BlockSpec((1, 1, NZ, NZ, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, NZ, SUBS, LANES), lambda bb, s: (bb, s + 1, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, s + 1, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, N, NX, SUBS, LANES), dt),
        ],
        scratch_shapes=[pltpu.VMEM((NX, SUBS, LANES), dt)],
    )(L_l, L_l, eu_l, px_l, px_l, Fl, bl)

    # terminal z (stage N: u_N from eu_N, x_N propagated) is produced by a
    # tail correction outside the kernel (cheap): stage N u solve
    z = _from_lanes(z_l, B)
    pi = _from_lanes(pi_l, B)
    L = _from_lanes(L_l, B)
    eu = _from_lanes(eu_l, B)
    px = _from_lanes(px_l, B)
    Pb = _from_lanes(Pb_l, B)

    # stage N entries: x_N = b_{N-1} + F' z_{N-1}; u_N = -Luu^{-T}(eu_N + Lxu' x_N)
    from .tri import solve_triu

    x_N = b[:, N - 1] + jnp.einsum("bzx,bz->bx", F[:, N - 1], z[:, N - 1])
    LuuN = L[:, N, :NU, :NU]
    LxuN = L[:, N, NU:, :NU]
    rhs = eu[:, N, :NU] + jnp.einsum("bxu,bx->bu", LxuN, x_N)
    u_N = -jax.vmap(lambda A_, r_: solve_triu(A_.T, r_))(LuuN, rhs)
    z = z.at[:, N, :NU].set(u_N).at[:, N, NU:].set(x_N)

    return z, pi, L, eu, px, Pb


# ---------------------------------------------------------------------------
# retained-factor backward solve (trs) kernel
# ---------------------------------------------------------------------------


def _bwd_trs_kernel(NU, NX, NZ, N,
                    L_ref, g_ref, F_ref, Pb_ref,
                    eu_ref, px_ref,
                    px_c):
    s = pl.program_id(1)

    Lf = _mat(L_ref, NZ, NZ)
    g = _vec(g_ref, NZ)
    Dinv_u = [pl.reciprocal(jnp.maximum(Lf[i][i], 1e-30), approx=False) for i in range(NU)]

    # m: terminal = g; interior = g + F (Pb + px_next)
    F = _mat(F_ref, NZ, NX)
    Pb = _vec(Pb_ref, NX)
    m_i = []
    for i in range(NZ):
        acc = g[i]
        for k in range(NX):
            acc = acc + F[i][k] * (Pb[k] + px_c[k])
        m_i.append(acc)
    is_t = s == 0
    m = [jnp.where(is_t, g[i], m_i[i]) for i in range(NZ)]

    eu = _tril_solve(
        [[Lf[i][j] for j in range(NU)] for i in range(NU)], Dinv_u, m[:NU], NU
    )
    px = []
    for i in range(NX):
        acc = m[NU + i]
        for k in range(NU):
            acc = acc - Lf[NU + i][k] * eu[k]
        px.append(acc)

    zero = Lf[0][0] * 0.0
    _store_vec(eu_ref, eu + [zero] * (NZ - NU))
    _store_vec(px_ref, px)
    for i in range(NX):
        px_c[i] = px[i]


@functools.partial(jax.jit, static_argnames=("NU",))
def solve_batched(L, g_eff, F, b, Pb, NU):
    """Batched fused Riccati trs with retained factor + cached Pb
    (the reference compute_Pb=0 fast path)."""
    B = L.shape[0]
    Np1 = L.shape[1]
    N = Np1 - 1
    NZ = L.shape[-1]
    NX = F.shape[-1]
    assert B % BI == 0
    nb = B // BI
    dt = L.dtype

    Ll = _to_lanes(L, B)
    gl = _to_lanes(g_eff, B)
    Fl = _to_lanes(F, B)
    bl = _to_lanes(b, B)
    Pbl = _to_lanes(Pb, B)

    kernel = functools.partial(_bwd_trs_kernel, NU, NX, NZ, N)
    eu_l, px_l = pcall(
        kernel,
        grid=(nb, Np1),
        in_specs=[
            pl.BlockSpec((1, 1, NZ, NZ, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(N - s, 0, N - 1), 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(N - s, 0, N - 1), 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NX, SUBS, LANES), dt),
        ],
        scratch_shapes=[pltpu.VMEM((NX, SUBS, LANES), dt)],
    )(Ll, gl, Fl, Pbl)

    fkernel = functools.partial(_fwd_kernel, NU, NX, NZ, N)
    z_l, pi_l = pcall(
        fkernel,
        grid=(nb, N),
        in_specs=[
            pl.BlockSpec((1, 1, NZ, NZ, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, NZ, SUBS, LANES), lambda bb, s: (bb, s + 1, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, s + 1, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, N, NX, SUBS, LANES), dt),
        ],
        scratch_shapes=[pltpu.VMEM((NX, SUBS, LANES), dt)],
    )(Ll, Ll, eu_l, px_l, px_l, Fl, bl)

    z = _from_lanes(z_l, B)
    pi = _from_lanes(pi_l, B)
    eu = _from_lanes(eu_l, B)

    from .tri import solve_triu

    x_N = b[:, N - 1] + jnp.einsum("bzx,bz->bx", F[:, N - 1], z[:, N - 1])
    LuuN = L[:, N, :NU, :NU]
    LxuN = L[:, N, NU:, :NU]
    rhs = eu[:, N, :NU] + jnp.einsum("bxu,bx->bu", LxuN, x_N)
    u_N = -jax.vmap(lambda A_, r_: solve_triu(A_.T, r_))(LuuN, rhs)
    z = z.at[:, N, :NU].set(u_N).at[:, N, NU:].set(x_N)
    return z, pi


# ---------------------------------------------------------------------------
# folded backward sweep: barrier-Hessian assembly fused into the kernel
# ---------------------------------------------------------------------------


def _bwd_kernel_folded(NU, NX, NZ, N, ng_stage_ids, split, *refs):
    """Like _bwd_kernel but M is assembled in VMEM from the CONSTANT stage
    Hessian H plus the per-iteration diagonal barrier fold ``dvec`` and the
    (few) general-constraint stage terms — the (N+1, NZ, NZ) effective
    Hessians never exist in HBM (on TPU their tile padding costs ~17x the
    logical bytes, and rebuilding them per IPM iteration dominated the
    solve time).

    ``split=True`` (the flat path) stores the factor as TWO streams —
    Ll (NZ, NU) = [Luu; Lxu] and Lxx (NX, NX) — instead of the full
    (NZ, NZ) block: downstream consumers never read the strictly-upper
    part or the mixed corner, so the split saves 121-97=24 subtile
    writes/stage here and, far more importantly, lets the trs/fwd kernels
    fetch only the piece they need (trs: Ll only; fwd: Ll_s + Lxx_{s+1})."""
    if split:
        (H_ref, dvec_ref, ngterm_ref, g_ref, F_ref, b_ref,
         Ll_ref, Lxx_ref, eu_ref, px_ref, Pb_ref, Lxx_c, px_c) = refs
    else:
        (H_ref, dvec_ref, ngterm_ref, g_ref, F_ref, b_ref,
         L_ref, eu_ref, px_ref, Pb_ref, Lxx_c, px_c) = refs
    s = pl.program_id(1)

    Lf, eu, px, Pb = _folded_bwd_stage(
        NU, NX, NZ, N, ng_stage_ids, s,
        H_ref, dvec_ref, ngterm_ref, g_ref, F_ref, b_ref, Lxx_c, px_c,
    )
    _store_vec(Pb_ref, Pb)
    if split:
        for i in range(NZ):
            for j in range(NU):
                Ll_ref[0, 0, i, j] = Lf[i][j]
        for i in range(NX):
            for j in range(NX):
                Lxx_ref[0, 0, i, j] = Lf[NU + i][NU + j]
        _store_vec(eu_ref, eu)  # (NU,) — no NZ zero-pad on the flat path
    else:
        _store_mat(L_ref, Lf)
        zero = Lf[0][0] * 0.0
        _store_vec(eu_ref, eu + [zero] * (NZ - NU))
    _store_vec(px_ref, px)


@functools.partial(jax.jit, static_argnames=("ng_stage_ids", "NU"))
def factor_solve_folded(H, dvec, ngterm, ng_stage_ids, g_eff, F, b, NU):
    """Fused Riccati sv with in-kernel barrier-Hessian assembly.

    H: (B, N+1, NZ, NZ) CONSTANT stage Hessians (loop-invariant: XLA hoists
    their lanes transpose out of the IPM while-loop);
    dvec: (B, N+1, NZ) per-iteration diagonal fold (box barrier + padding +
    regularization); ngterm: (B, n_ng, NZ, NZ) dense general-constraint
    terms for the statically known ``ng_stage_ids``.
    """
    B = H.shape[0]
    Np1 = H.shape[1]
    N = Np1 - 1
    NZ = H.shape[-1]
    NX = F.shape[-1]
    assert B % BI == 0
    nb = B // BI
    dt = H.dtype
    n_ng = len(ng_stage_ids)
    NT = _sym_nt(NZ)

    Hl = _to_lanes(sym_compress(H), B)
    dl = _to_lanes(dvec, B)
    gl = _to_lanes(g_eff, B)
    Fl = _to_lanes(F, B)
    bl = _to_lanes(b, B)

    def ng_slot(s):
        # slot of stage N-s in ngterm (arbitrary when not an ng stage:
        # the kernel masks the add)
        slot = 0
        for k, stg in enumerate(ng_stage_ids):
            slot = jnp.where((N - s) == stg, k, slot)
        return slot

    in_specs = [
        pl.BlockSpec((1, 1, NT, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [Hl, dl]
    if n_ng:
        ngl = _to_lanes(sym_compress(ngterm), B)
        in_specs.append(
            pl.BlockSpec((1, 1, NT, SUBS, LANES), lambda bb, s: (bb, ng_slot(s), 0, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(ngl)
    else:
        # dummy single-slot ref (never added)
        ngl = jnp.zeros((nb, 1, NT, SUBS, LANES), dt)
        in_specs.append(
            pl.BlockSpec((1, 1, NT, SUBS, LANES), lambda bb, s: (bb, 0, 0, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(ngl)
    in_specs += [
        pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(N - s, 0, N - 1), 0, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(N - s, 0, N - 1), 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args += [gl, Fl, bl]

    kernel = functools.partial(_bwd_kernel_folded, NU, NX, NZ, N, tuple(ng_stage_ids), False)
    L_l, eu_l, px_l, Pb_l = pcall(
        kernel,
        grid=(nb, Np1),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, NZ, NZ, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(N - s, 0, N - 1), 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, Np1, NZ, NZ, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NX, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, N, NX, SUBS, LANES), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((NX, NX, SUBS, LANES), dt),
            pltpu.VMEM((NX, SUBS, LANES), dt),
        ],
    )(*args)

    fkernel = functools.partial(_fwd_kernel, NU, NX, NZ, N)
    z_l, pi_l = pcall(
        fkernel,
        grid=(nb, N),
        in_specs=[
            pl.BlockSpec((1, 1, NZ, NZ, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, NZ, SUBS, LANES), lambda bb, s: (bb, s + 1, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, s + 1, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, N, NX, SUBS, LANES), dt),
        ],
        scratch_shapes=[pltpu.VMEM((NX, SUBS, LANES), dt)],
    )(L_l, L_l, eu_l, px_l, px_l, Fl, bl)

    z = _from_lanes(z_l, B)
    pi = _from_lanes(pi_l, B)
    L = _from_lanes(L_l, B)
    eu = _from_lanes(eu_l, B)
    px = _from_lanes(px_l, B)
    Pb = _from_lanes(Pb_l, B)

    from .tri import solve_triu

    x_N = b[:, N - 1] + jnp.einsum("bzx,bz->bx", F[:, N - 1], z[:, N - 1])
    LuuN = L[:, N, :NU, :NU]
    LxuN = L[:, N, NU:, :NU]
    rhs = eu[:, N, :NU] + jnp.einsum("bxu,bx->bu", LxuN, x_N)
    u_N = -jax.vmap(lambda A_, r_: solve_triu(A_.T, r_))(LuuN, rhs)
    z = z.at[:, N, :NU].set(u_N).at[:, N, NU:].set(x_N)
    return z, pi, L, eu, px, Pb


# ---------------------------------------------------------------------------
# flat-state wrappers: loop state lives as (B, flat) 2-D arrays (TPU tile
# padding makes (..., small, small)-trailing layouts cost 10-65x their
# logical bytes) and the retained factor stays in LANES form between the
# sv and trs calls (never materialized as (B, N+1, NZ, NZ))
# ---------------------------------------------------------------------------


def _to_lanes_flat(x, B, shape):
    """(B, prod(shape)) -> (nb, *shape, 8, 128) without materializing the
    padded structured layout."""
    nb = B // BI
    y = x.reshape((nb, SUBS, LANES) + tuple(shape))
    perm = (0,) + tuple(range(3, y.ndim)) + (1, 2)
    return jnp.transpose(y, perm)


def _from_lanes_flat(y, B):
    """(nb, *shape, 8, 128) -> (B, prod(shape))."""
    nb = B // BI
    perm = (0, y.ndim - 2, y.ndim - 1) + tuple(range(1, y.ndim - 2))
    x = jnp.transpose(y, perm)
    return x.reshape(B, -1)


@functools.partial(
    jax.jit,
    static_argnames=("ng_stage_ids", "NU", "NZ", "NX", "want_pi", "lanes_io"),
)
def factor_solve_folded_flat(Hl, dvecF, ngl, ng_stage_ids, gF, Fl, bF,
                             NU, NZ, NX, want_pi=True, lanes_io=False):
    """Flat-state fused sv.  Hl (nb, N+1, NZ(NZ+1)/2, 8, 128) is the
    loop-invariant stage Hessian as a PACKED lower-triangle lanes stream
    (``sym_compress`` + ``_to_lanes``, done ONCE outside the IPM loop);
    Fl (nb, N, NZ, NX, 8, 128) likewise (dense — no symmetry);
    dvecF (B, (N+1)*NZ), gF likewise, bF (B, N*NX); ngl is the
    C'diag(Qx_g)C barrier term, packed the same way,
    (nb, max(n_ng, 1), NZ(NZ+1)/2, 8, 128).

    Returns (zF, piF, fstate) with fstate = (L_lanes, Pb_lanes).

    ``lanes_io=True`` takes dvecF/gF/bF ALREADY in lanes form
    ((nb, N+1, NZ, 8, 128) / (nb, N, NX, 8, 128)) and returns z/pi in
    lanes form too — the lanes-resident IPM loop (models/ipm_lanes.py)
    keeps all state on this layout so no per-call transposes happen.
    """
    nb = Hl.shape[0]
    B = nb * BI
    Np1 = Hl.shape[1]
    N = Np1 - 1
    dt = Hl.dtype
    n_ng = len(ng_stage_ids)
    NT = _sym_nt(NZ)
    assert Hl.shape[2] == NT, "Hl must be sym-packed (see sym_compress)"

    if lanes_io:
        dl, gl, bl = dvecF, gF, bF
    else:
        dl = _to_lanes_flat(dvecF, B, (Np1, NZ))
        gl = _to_lanes_flat(gF, B, (Np1, NZ))
        bl = _to_lanes_flat(bF, B, (N, NX))

    def ng_slot(s):
        slot = 0
        for k, stg in enumerate(ng_stage_ids):
            slot = jnp.where((N - s) == stg, k, slot)
        return slot

    in_specs = [
        pl.BlockSpec((1, 1, NT, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [Hl, dl]
    if n_ng:
        in_specs.append(
            pl.BlockSpec((1, 1, NT, SUBS, LANES), lambda bb, s: (bb, ng_slot(s), 0, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(ngl)
    else:
        in_specs.append(
            pl.BlockSpec((1, 1, NT, SUBS, LANES), lambda bb, s: (bb, 0, 0, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(ngl)
    in_specs += [
        pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(N - s, 0, N - 1), 0, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(N - s, 0, N - 1), 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args += [gl, Fl, bl]

    kernel = functools.partial(_bwd_kernel_folded, NU, NX, NZ, N, tuple(ng_stage_ids), True)
    Ll_l, Lxx_l, eu_l, px_l, Pb_l = pcall(
        kernel,
        grid=(nb, Np1),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, NZ, NU, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, NX, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NU, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(N - s, 0, N - 1), 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, Np1, NZ, NU, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NX, NX, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NU, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NX, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, N, NX, SUBS, LANES), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((NX, NX, SUBS, LANES), dt),
            pltpu.VMEM((NX, SUBS, LANES), dt),
        ],
    )(*args)

    zF, piF = _forward_from_lanes(
        Ll_l, Lxx_l, eu_l, px_l, Fl, bl, B, N, NU, NZ, NX, want_pi=want_pi,
        lanes_out=lanes_io,
    )
    return zF, piF, (Ll_l, Lxx_l, Pb_l)


def _forward_from_lanes(Ll_l, Lxx_l, eu_l, px_l, Fl, bl, B, N, NU, NZ, NX,
                        want_pi=True, lanes_out=False):
    nb = B // BI
    dt = Ll_l.dtype
    fkernel = functools.partial(_fwd_kernel_split, NU, NX, NZ, N, want_pi)
    if want_pi:
        lxx_map = lambda bb, s: (bb, s, 0, 0, 0, 0)
        out_specs = [
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(s - 1, 0, N - 1), 0, 0, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((nb, N + 1, NZ, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, N, NX, SUBS, LANES), dt),
        ]
    else:
        # pi skipped: Lxx only feeds the s==0 initial-state solve — pin
        # its index map to block 0 so the stream is fetched exactly once
        lxx_map = lambda bb, s: (bb, 0, 0, 0, 0, 0)
        out_specs = [
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((nb, N + 1, NZ, SUBS, LANES), dt),
        ]
    outs = pcall(
        fkernel,
        grid=(nb, N + 1),
        in_specs=[
            pl.BlockSpec((1, 1, NZ, NU, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, NX, SUBS, LANES), lxx_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NU, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(s, 0, N - 1), 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(s, 0, N - 1), 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((NX, SUBS, LANES), dt)],
    )(Ll_l, Lxx_l, eu_l, px_l, Fl, bl)

    if want_pi:
        z_l, pi_l = outs
        if lanes_out:
            return z_l, pi_l
        return _from_lanes_flat(z_l, B), _from_lanes_flat(pi_l, B)
    (z_l,) = outs if isinstance(outs, (list, tuple)) else (outs,)
    if lanes_out:
        return z_l, None
    return _from_lanes_flat(z_l, B), None


def _bwd_trs_kernel_ll(NU, NX, NZ, N,
                       Ll_ref, g_ref, F_ref, Pb_ref,
                       eu_ref, px_ref,
                       px_c):
    """Flat trs on the SPLIT factor: the backward substitution only ever
    touches the left (NZ, NU) block of L (Luu for the triangular solve,
    Lxu for the gradient fold) — 33 subtiles/stage instead of the full
    block's 121."""
    s = pl.program_id(1)

    Ll = _mat(Ll_ref, NZ, NU)
    g = _vec(g_ref, NZ)
    Dinv_u = _dinv_ll(Ll, NU)
    F = _mat(F_ref, NZ, NX)
    Pb = _vec(Pb_ref, NX)
    Pbpx = [Pb[k] + px_c[k] for k in range(NX)]
    eu, px = _trs_stage(NU, NX, NZ, Ll, Dinv_u, g, F, Pbpx, s == 0)

    _store_vec(eu_ref, eu)
    _store_vec(px_ref, px)
    for i in range(NX):
        px_c[i] = px[i]


def _bwd_trs_pb_kernel(NU, NX, NZ, N,
                       Ll_ref, Lxx_ref, g_ref, F_ref, b_ref,
                       eu_ref, px_ref,
                       Lxx_c, px_c):
    """trs variant that RECOMPUTES Pb in-kernel from the retained factor
    (the reference ``compute_Pb=1`` path, ``d_back_ric_rec.c:564``):
    needed when the rhs ``b`` differs from the one the factor's Pb cache
    was built for — iterative refinement (``ITER_REF``) re-solves the
    Newton system against the refinement residual ``rb``.  Carries
    Lxx_{n+1} across grid steps like the sv kernel; reads the split
    Ll/Lxx streams."""
    s = pl.program_id(1)

    Ll = _mat(Ll_ref, NZ, NU)
    g = _vec(g_ref, NZ)
    Dinv_u = _dinv_ll(Ll, NU)

    # interior: Pb = Lxx_{n+1} (Lxx_{n+1}' b_n) from the carried factor
    F = _mat(F_ref, NZ, NX)
    bb = _vec(b_ref, NX)
    Lxx = [[Lxx_c[i, j] for j in range(NX)] for i in range(NX)]
    Pb = _pb_of(Lxx, bb, NX)
    Pbpx = [Pb[k] + px_c[k] for k in range(NX)]
    eu, px = _trs_stage(NU, NX, NZ, Ll, Dinv_u, g, F, Pbpx, s == 0)

    _store_vec(eu_ref, eu)
    _store_vec(px_ref, px)
    Lxx_new = _mat(Lxx_ref, NX, NX)
    for i in range(NX):
        px_c[i] = px[i]
        for j in range(NX):
            Lxx_c[i, j] = Lxx_new[i][j]


@functools.partial(jax.jit, static_argnames=("NU", "NZ", "NX", "lanes_io"))
def solve_flat_pb(Ll_l, Lxx_l, gF, Fl, bF, NU, NZ, NX, lanes_io=False):
    """Flat-state fused trs recomputing Pb in-kernel (new-rhs path: used by
    iterative refinement, where ``bF`` is the refinement residual, not the
    rhs the retained factor's Pb cache belongs to).  ``lanes_io=True``
    takes/returns lanes-form streams (the lanes-resident IPM's refinement
    path, models/ipm_lanes.py)."""
    nb = Ll_l.shape[0]
    B = nb * BI
    Np1 = Ll_l.shape[1]
    N = Np1 - 1
    dt = Ll_l.dtype

    if lanes_io:
        gl, bl = gF, bF
    else:
        gl = _to_lanes_flat(gF, B, (Np1, NZ))
        bl = _to_lanes_flat(bF, B, (N, NX))

    kernel = functools.partial(_bwd_trs_pb_kernel, NU, NX, NZ, N)
    eu_l, px_l = pcall(
        kernel,
        grid=(nb, Np1),
        in_specs=[
            pl.BlockSpec((1, 1, NZ, NU, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, NX, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(N - s, 0, N - 1), 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(N - s, 0, N - 1), 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, NU, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, Np1, NU, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NX, SUBS, LANES), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((NX, NX, SUBS, LANES), dt),
            pltpu.VMEM((NX, SUBS, LANES), dt),
        ],
    )(Ll_l, Lxx_l, gl, Fl, bl)

    return _forward_from_lanes(Ll_l, Lxx_l, eu_l, px_l, Fl, bl, B, N, NU, NZ, NX,
                               lanes_out=lanes_io)


@functools.partial(jax.jit, static_argnames=("NU", "NZ", "NX", "lanes_io"))
def solve_flat(Ll_l, Lxx_l, Pb_l, gF, Fl, bF, NU, NZ, NX, lanes_io=False):
    """Flat-state fused trs with the LANES-form retained split factor."""
    nb = Ll_l.shape[0]
    B = nb * BI
    Np1 = Ll_l.shape[1]
    N = Np1 - 1
    dt = Ll_l.dtype

    if lanes_io:
        gl, bl = gF, bF
    else:
        gl = _to_lanes_flat(gF, B, (Np1, NZ))
        bl = _to_lanes_flat(bF, B, (N, NX))

    kernel = functools.partial(_bwd_trs_kernel_ll, NU, NX, NZ, N)
    eu_l, px_l = pcall(
        kernel,
        grid=(nb, Np1),
        in_specs=[
            pl.BlockSpec((1, 1, NZ, NU, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(N - s, 0, N - 1), 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(N - s, 0, N - 1), 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, NU, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, N - s, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, Np1, NU, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NX, SUBS, LANES), dt),
        ],
        scratch_shapes=[pltpu.VMEM((NX, SUBS, LANES), dt)],
    )(Ll_l, gl, Fl, Pb_l)

    return _forward_from_lanes(
        Ll_l, Lxx_l, eu_l, px_l, Fl, bl, B, N, NU, NZ, NX,
        lanes_out=lanes_io,
    )


# ---------------------------------------------------------------------------
# residual-terms kernel: the three matvecs of the KKT residual (H_n z_n,
# F_n' z_n, F_n pi_n) read H/F in tile-dense lanes form.  The XLA einsum
# alternative reads the structured (B, N+1, NZ, NZ) / (B, N, NZ, NX) arrays
# whose (11, 11) / (11, 7) trailing dims tile-pad 17-18x (~2 GB/iteration
# at B=4096); lanes-form H+F is ~100 MB.
# ---------------------------------------------------------------------------


def _resid_kernel(NZ, NX, N,
                  H_ref, F_ref, z_ref, pi_ref,
                  hz_ref, fz_ref, fpi_ref):
    H = _mat_sym(H_ref, NZ)  # packed symmetric stream; mirror loads CSE'd
    F = _mat(F_ref, NZ, NX)
    z = _vec(z_ref, NZ)
    piv = _vec(pi_ref, NX)

    hz = []
    for i in range(NZ):
        acc = H[i][0] * z[0]
        for j in range(1, NZ):
            acc = acc + H[i][j] * z[j]
        hz.append(acc)
    _store_vec(hz_ref, hz)

    fz = []
    for x in range(NX):
        acc = F[0][x] * z[0]
        for j in range(1, NZ):
            acc = acc + F[j][x] * z[j]
        fz.append(acc)
    _store_vec(fz_ref, fz)

    fpi = []
    for i in range(NZ):
        acc = F[i][0] * piv[0]
        for x in range(1, NX):
            acc = acc + F[i][x] * piv[x]
        fpi.append(acc)
    _store_vec(fpi_ref, fpi)


@functools.partial(jax.jit, static_argnames=("NZ", "NX", "lanes_io"))
def resid_terms_flat(Hl, Fl, zF, piF, NZ, NX, lanes_io=False):
    """hzF[b, n*NZ+i] = (H_n z_n)_i               for n in 0..N
    fzF[b, n*NX+x] = (F_n' z_n)_x                 for n in 0..N-1
    fpiF[b, n*NZ+i] = (F_n pi_n)_i                for n in 0..N-1
    (fpiF's stage-N slice is garbage; callers add only [:, :N*NZ]).

    ``lanes_io=True`` takes z/pi as lanes streams and returns the raw
    lanes outputs (hz_l (nb, N+1, NZ, 8, 128), fz_l (nb, N+1, NX, 8, 128)
    with a garbage stage-N slice, fpi_l likewise) — the lanes-resident
    IPM's refinement path."""
    nb = Hl.shape[0]
    B = nb * BI
    Np1 = Hl.shape[1]
    N = Np1 - 1
    dt = Hl.dtype
    NT = _sym_nt(NZ)
    assert Hl.shape[2] == NT, "Hl must be sym-packed (see sym_compress)"

    if lanes_io:
        zl, pil = zF, piF
    else:
        zl = _to_lanes_flat(zF, B, (Np1, NZ))
        pil = _to_lanes_flat(piF, B, (N, NX))

    kernel = functools.partial(_resid_kernel, NZ, NX, N)
    hz_l, fz_l, fpi_l = pcall(
        kernel,
        grid=(nb, Np1),
        in_specs=[
            pl.BlockSpec((1, 1, NT, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(s, 0, N - 1), 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(s, 0, N - 1), 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NX, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
        ],
    )(Hl, Fl, zl, pil)

    if lanes_io:
        return hz_l, fz_l, fpi_l
    hzF = _from_lanes_flat(hz_l, B)
    fzF = _from_lanes_flat(fz_l, B)[:, : N * NX]
    fpiF = _from_lanes_flat(fpi_l, B)
    return hzF, fzF, fpiF


# ---------------------------------------------------------------------------
# fused trs+fwd: ONE kernel, two grid phases (backward then forward), the
# factor's left block and the eu/px intermediates never leave VMEM
# ---------------------------------------------------------------------------


def _trs_fwd_fused_kernel(NU, NX, NZ, N,
                          Ll_ref, Lxx_ref, g_ref, F_ref, Pb_ref, b_ref,
                          z_ref, pi_ref,
                          ll_s, eu_s, px_s, px_c, x_c):
    """Grid (nb, 2(N+1)).  Steps 0..N run the retained-factor backward
    substitution (stage N-s), caching Ll and the eu/px results in VMEM
    slabs; steps N+1..2N+1 run the forward recovery (stage s-N-1) from
    those slabs — eliminating the eu/px HBM round-trip and the second
    HBM fetch of Ll that the separate trs/fwd kernels pay (the index
    maps pin every phase-inactive stream to a constant block, so Pallas'
    revisit cache skips its refetch).  Math and op order are identical
    to _bwd_trs_kernel_ll + _fwd_kernel_split."""
    s = pl.program_id(1)

    @pl.when(s <= N)
    def _():
        k = N - s
        Ll = _mat(Ll_ref, NZ, NU)
        g = _vec(g_ref, NZ)
        Dinv_u = _dinv_ll(Ll, NU)
        F = _mat(F_ref, NZ, NX)
        Pb = _vec(Pb_ref, NX)
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
        Lxx = _mat(Lxx_ref, NX, NX)
        Dinv_u = _dinv_ll(Ll, NU)

        @pl.when(sb == 0)
        def _():
            x0 = _root_x0(Lxx, px, NX)
            for i in range(NX):
                x_c[i] = x0[i]

        x = [x_c[i] for i in range(NX)]

        # pi_{sb-1} (dead write at sb == 0, overwritten before copy-out)
        _store_vec(pi_ref, _pi_of_x(NX, Lxx, px, x))

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


def _cat_slab(tiles):
    """list of (SUBS, LANES) tiles -> (1, len*SUBS, LANES) slab."""
    return jnp.concatenate(tiles, axis=0)[None]


# ---------------------------------------------------------------------------
# fused ITER_REF pass: effective-system residual + retained-factor trs (Pb
# in-kernel) + forward recovery + iterate update, ONE pallas_call.  The
# composite (resid_terms_flat + XLA assembly + solve_flat_pb = 3 kernel
# launches + HBM round-trips of rq/rb/dz/dpi) is what made the two-stage
# parity route's stage 2 refinement-dominated (r04: 20.5 ms/batch with
# stage 2 burning ~16 of them).
# ---------------------------------------------------------------------------


def _refine_fused_kernel(NU, NX, NZ, N, ng_stage_ids, *refs):
    """Grid (nb, 2(N+1)).  Steps 0..N (stage k = N-s): the effective
    Newton-system residual (rq_k, rb_k) is computed in-step from the
    current iterate — rq = g_eff + (H + diag(dvec) + C'QxgC) z + F pi -
    pi-shift, rb = rhs + F'z - x-shift (``ipm_fast.newton_refine``'s
    assembly, in-kernel) — and fed straight into the retained-factor
    backward substitution with Pb recomputed from the carried Lxx
    (``_bwd_trs_pb_kernel`` semantics; rb stashed in a VMEM slab).
    Steps N+1..2N+1: forward recovery of (dz, dpi) ADDED into the
    iterate (z_new, pi_new outputs).  Reference: the ITER_REF correction
    re-solve, ``d_ip2_res_hard.c:1093-1131``."""
    has_ng = bool(ng_stage_ids)
    it = iter(refs)
    H_ref, dv_ref, g_ref = next(it), next(it), next(it)
    if has_ng:
        C_ref, qxg_ref = next(it), next(it)
    z_ref, zn_ref, pik_ref, pikm_ref = next(it), next(it), next(it), next(it)
    b_ref, F_ref, Ll_ref, Lxx_ref = next(it), next(it), next(it), next(it)
    zo_ref, po_ref = next(it), next(it)
    ll_s, eu_s, px_s, rb_s, Lxx_c, px_c, x_c = (
        next(it), next(it), next(it), next(it), next(it), next(it),
        next(it),
    )

    s = pl.program_id(1)

    @pl.when(s <= N)
    def _():
        k = N - s
        H = _mat_sym(H_ref, NZ)
        dv = _vec(dv_ref, NZ)
        g = _vec(g_ref, NZ)
        z = _vec(z_ref, NZ)
        zn = _vec(zn_ref, NZ)          # stage min(k+1, N)
        piv = _vec(pik_ref, NX)        # pi_k      (clip; dead at k=N)
        pim = _vec(pikm_ref, NX)       # pi_{k-1}  (clip; dead at k=0)
        F = _mat(F_ref, NZ, NX)        # stage clip(k, 0, N-1)
        bb = _vec(b_ref, NX)

        rq = []
        for i in range(NZ):
            acc = g[i] + dv[i] * z[i]
            for j in range(NZ):
                acc = acc + H[i][j] * z[j]
            fpi = None
            for x in range(NX):
                t = F[i][x] * piv[x]
                fpi = t if fpi is None else fpi + t
            # F_k pi_k lands on node k for k < N only (apply_fpi)
            acc = acc + jnp.where(s == 0, 0.0, fpi)
            rq.append(acc)
        for x in range(NX):
            # the pi coupling row: rq[k, NU+x] -= pi_{k-1}[x] for k >= 1
            rq[NU + x] = rq[NU + x] - jnp.where(
                s <= N - 1, pim[x], 0.0)

        if has_ng:
            NG = qxg_ref.shape[2]
            stage_match = None
            for stg in ng_stage_ids:
                m = (s == N - stg)
                stage_match = m if stage_match is None else (
                    stage_match | m)
            C = [[C_ref[0, 0, gg, i] for i in range(NZ)]
                 for gg in range(NG)]
            qxg = [qxg_ref[0, 0, gg] for gg in range(NG)]
            cz = []
            for gg in range(NG):
                acc = None
                for i in range(NZ):
                    t = C[gg][i] * z[i]
                    acc = t if acc is None else acc + t
                cz.append(acc)
            for i in range(NZ):
                acc = None
                for gg in range(NG):
                    t = C[gg][i] * qxg[gg] * cz[gg]
                    acc = t if acc is None else acc + t
                rq[i] = rq[i] + jnp.where(stage_match, acc, 0.0)

        # rb_k = rhs_k + F_k' z_k - x_{k+1}   (k < N; garbage at k = N,
        # discarded by the is_t gate below and never read from the slab)
        rb = []
        for x in range(NX):
            acc = bb[x]
            for i in range(NZ):
                acc = acc + F[i][x] * z[i]
            rb.append(acc - zn[NU + x])
        rb_s[pl.ds(jnp.minimum(k, N - 1), 1), :, :] = _cat_slab(rb)

        Ll = _mat(Ll_ref, NZ, NU)
        Dinv_u = _dinv_ll(Ll, NU)
        Lxx_carry = [[Lxx_c[i, j] for j in range(NX)] for i in range(NX)]
        Pb = _pb_of(Lxx_carry, rb, NX)
        Pbpx = [Pb[i] + px_c[i] for i in range(NX)]
        eu, px = _trs_stage(NU, NX, NZ, Ll, Dinv_u, rq, F, Pbpx, s == 0)

        ll_s[pl.ds(k, 1), :, :] = _cat_slab(
            [Ll[i][j] for i in range(NZ) for j in range(NU)]
        )
        eu_s[pl.ds(k, 1), :, :] = _cat_slab(eu)
        px_s[pl.ds(k, 1), :, :] = _cat_slab(px)
        Lxx_new = _mat(Lxx_ref, NX, NX)
        for i in range(NX):
            px_c[i] = px[i]
            for j in range(NX):
                Lxx_c[i, j] = Lxx_new[i][j]

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
        Lxx = _mat(Lxx_ref, NX, NX)
        Dinv_u = _dinv_ll(Ll, NU)

        @pl.when(sb == 0)
        def _():
            x0 = _root_x0(Lxx, px, NX)
            for i in range(NX):
                x_c[i] = x0[i]

        x = [x_c[i] for i in range(NX)]

        # pi_new[sb-1] = pi_old[sb-1] + dpi_{sb-1}  (dead write at sb=0,
        # overwritten in VMEM before copy-out)
        pio = _vec(pikm_ref, NX)
        dpi = _pi_of_x(NX, Lxx, px, x)
        _store_vec(po_ref, [pio[i] + dpi[i] for i in range(NX)])

        u = _u_of_x(NU, NX, Ll, Dinv_u, eu, x)
        zo = _vec(z_ref, NZ)
        for i in range(NU):
            zo_ref[0, 0, i] = zo[i] + u[i]
        for i in range(NX):
            zo_ref[0, 0, NU + i] = zo[NU + i] + x[i]

        rbslab = rb_s[pl.ds(jnp.minimum(sb, N - 1), 1), :, :]
        rb = [rbslab[0, i * SUBS : (i + 1) * SUBS, :] for i in range(NX)]
        F = _mat(F_ref, NZ, NX)
        xn = _x_next_of(NU, NX, F, rb, u, x)
        for j in range(NX):
            x_c[j] = xn[j]


@functools.partial(
    jax.jit,
    static_argnames=("ng_stage_ids", "NU", "NZ", "NX"),
)
def refine_flat_fused(Hl, dvl, Cl, qxgl, ng_stage_ids, gl, Fl, bl,
                      zl, pil, Ll_l, Lxx_l, NU, NZ, NX):
    """One FUSED iterative-refinement pass on lanes streams: returns
    (z_new_l, pi_new_l) = iterate + correction.  Replaces the 3-kernel
    composite (resid_terms_flat + XLA residual assembly + solve_flat_pb)
    with ONE pallas_call — rq/rb/dz/dpi never exist in HBM.

    ``Cl`` (nb, max(n_ng,1), NG, NZ, 8, 128) loop-invariant C rows of the
    active stages; ``qxgl`` (nb, max(n_ng,1), NG, 8, 128) the folded
    masked barrier diag Qx_g of THIS iteration (pass None for both when
    no general constraints)."""
    nb = Hl.shape[0]
    Np1 = Hl.shape[1]
    N = Np1 - 1
    dt = Hl.dtype
    NT = _sym_nt(NZ)
    assert Hl.shape[2] == NT
    has_ng = bool(ng_stage_ids)

    def bwd_k(bb, s):
        return (bb, jnp.where(s <= N, N - s, 0))

    def ng_slot(s):
        slot = 0
        for j, stg in enumerate(ng_stage_ids):
            slot = jnp.where((N - s) == stg, j, slot)
        return slot

    def spec(shape, map_fn):
        return pl.BlockSpec(shape, map_fn, memory_space=pltpu.VMEM)

    in_specs = [
        spec((1, 1, NT, SUBS, LANES),
             lambda bb, s: bwd_k(bb, s) + (0, 0, 0)),
        spec((1, 1, NZ, SUBS, LANES),
             lambda bb, s: bwd_k(bb, s) + (0, 0, 0)),
        spec((1, 1, NZ, SUBS, LANES),
             lambda bb, s: bwd_k(bb, s) + (0, 0, 0)),
    ]
    args = [Hl, dvl, gl]
    if has_ng:
        NG = Cl.shape[2]
        in_specs += [
            spec((1, 1, NG, NZ, SUBS, LANES),
                 lambda bb, s: (bb, jnp.where(s <= N, ng_slot(s), 0),
                                0, 0, 0, 0)),
            spec((1, 1, NG, SUBS, LANES),
                 lambda bb, s: (bb, jnp.where(s <= N, ng_slot(s), 0),
                                0, 0, 0)),
        ]
        args += [Cl, qxgl]
    # z: stage k in bwd, stage sb in fwd (update read)
    in_specs += [
        spec((1, 1, NZ, SUBS, LANES),
             lambda bb, s: (bb, jnp.where(s <= N, N - s,
                                          jnp.maximum(s - (N + 1), 0)),
                            0, 0, 0)),
        # z_{k+1} (bwd only)
        spec((1, 1, NZ, SUBS, LANES),
             lambda bb, s: (bb, jnp.where(s <= N,
                                          jnp.minimum(N - s + 1, N), 0),
                            0, 0, 0)),
        # pi_k (bwd only; clip to edge range)
        spec((1, 1, NX, SUBS, LANES),
             lambda bb, s: (bb, jnp.where(
                 s <= N, jnp.clip(N - s, 0, N - 1), 0), 0, 0, 0)),
        # pi_{k-1} in bwd / pi_old[sb-1] in fwd (the update read)
        spec((1, 1, NX, SUBS, LANES),
             lambda bb, s: (bb, jnp.where(
                 s <= N, jnp.clip(N - s - 1, 0, N - 1),
                 jnp.clip(s - (N + 2), 0, N - 1)), 0, 0, 0)),
        # rhs (bwd only)
        spec((1, 1, NX, SUBS, LANES),
             lambda bb, s: (bb, jnp.where(
                 s <= N, jnp.clip(N - s, 0, N - 1), 0), 0, 0, 0)),
        # F: stage clip(k) in bwd, clip(sb) in fwd
        spec((1, 1, NZ, NX, SUBS, LANES),
             lambda bb, s: (bb, jnp.clip(
                 jnp.where(s <= N, N - s, s - (N + 1)), 0, N - 1),
                 0, 0, 0, 0)),
        # Ll: bwd only (fwd reads the slab)
        spec((1, 1, NZ, NU, SUBS, LANES),
             lambda bb, s: bwd_k(bb, s) + (0, 0, 0, 0)),
        # Lxx: stage k in bwd (carry refresh), stage sb in fwd (pi)
        spec((1, 1, NX, NX, SUBS, LANES),
             lambda bb, s: (bb, jnp.where(s <= N, N - s,
                                          jnp.maximum(s - (N + 1), 0)),
                            0, 0, 0, 0)),
    ]
    args += [zl, zl, pil, pil, bl, Fl, Ll_l, Lxx_l]

    out_specs = [
        spec((1, 1, NZ, SUBS, LANES),
             lambda bb, s: (bb, jnp.where(
                 s > N, jnp.maximum(s - (N + 1), 0), 0), 0, 0, 0)),
        spec((1, 1, NX, SUBS, LANES),
             lambda bb, s: (bb, jnp.where(
                 s > N, jnp.clip(s - (N + 2), 0, N - 1), 0), 0, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, N, NX, SUBS, LANES), dt),
    ]
    kernel = functools.partial(
        _refine_fused_kernel, NU, NX, NZ, N, tuple(ng_stage_ids)
    )
    z_new, pi_new = pcall(
        kernel,
        grid=(nb, 2 * Np1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((Np1, NZ * NU * SUBS, LANES), dt),
            pltpu.VMEM((Np1, NU * SUBS, LANES), dt),
            pltpu.VMEM((Np1, NX * SUBS, LANES), dt),
            pltpu.VMEM((Np1, NX * SUBS, LANES), dt),
            pltpu.VMEM((NX, NX, SUBS, LANES), dt),
            pltpu.VMEM((NX, SUBS, LANES), dt),
            pltpu.VMEM((NX, SUBS, LANES), dt),
        ],
    )(*args)
    return z_new, pi_new


@functools.partial(jax.jit, static_argnames=("NU", "NZ", "NX", "lanes_io"))
def solve_flat_fused(Ll_l, Lxx_l, Pb_l, gF, Fl, bF, NU, NZ, NX,
                     lanes_io=False):
    """Fused-trs+fwd twin of :func:`solve_flat` (identical contract)."""
    nb = Ll_l.shape[0]
    B = nb * BI
    Np1 = Ll_l.shape[1]
    N = Np1 - 1
    dt = Ll_l.dtype

    if lanes_io:
        gl, bl = gF, bF
    else:
        gl = _to_lanes_flat(gF, B, (Np1, NZ))
        bl = _to_lanes_flat(bF, B, (N, NX))

    # phase-inactive streams pin their block index to a constant: Pallas'
    # revisit cache then skips the refetch for the whole inactive phase
    kernel = functools.partial(_trs_fwd_fused_kernel, NU, NX, NZ, N)
    z_l, pi_l = pcall(
        kernel,
        grid=(nb, 2 * Np1),
        in_specs=[
            pl.BlockSpec((1, 1, NZ, NU, SUBS, LANES),
                         lambda bb, s: (bb, jnp.where(s <= N, N - s, 0), 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, NX, SUBS, LANES),
                         lambda bb, s: (bb, jnp.where(s > N, jnp.maximum(s - (N + 1), 0), 0), 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, SUBS, LANES),
                         lambda bb, s: (bb, jnp.where(s <= N, N - s, 0), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES),
                         lambda bb, s: (bb, jnp.where(
                             s <= N, jnp.clip(N - s, 0, N - 1),
                             jnp.clip(s - (N + 1), 0, N - 1)), 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES),
                         lambda bb, s: (bb, jnp.where(
                             s <= N, jnp.clip(N - s, 0, N - 1), 0), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES),
                         lambda bb, s: (bb, jnp.where(
                             s > N, jnp.clip(s - (N + 1), 0, N - 1), 0),
                             0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, NZ, SUBS, LANES),
                         lambda bb, s: (bb, jnp.where(
                             s > N, jnp.maximum(s - (N + 1), 0), 0),
                             0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES),
                         lambda bb, s: (bb, jnp.where(
                             s > N, jnp.clip(s - (N + 2), 0, N - 1), 0),
                             0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, N, NX, SUBS, LANES), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((Np1, NZ * NU * SUBS, LANES), dt),  # Ll slab
            pltpu.VMEM((Np1, NU * SUBS, LANES), dt),       # eu slab
            pltpu.VMEM((Np1, NX * SUBS, LANES), dt),       # px slab
            pltpu.VMEM((NX, SUBS, LANES), dt),             # px carry (trs)
            pltpu.VMEM((NX, SUBS, LANES), dt),             # x carry (fwd)
        ],
    )(Ll_l, Lxx_l, gl, Fl, Pb_l, bl)

    if lanes_io:
        return z_l, pi_l
    zF = _from_lanes_flat(z_l, B)
    piF = _from_lanes_flat(pi_l, B)
    return zF, piF


# ---------------------------------------------------------------------------
# fused sv+fwd (AFFINE solve): folded backward factorization and pi-less
# forward recovery in ONE kernel; Ll/eu/px ride VMEM slabs instead of HBM
# ---------------------------------------------------------------------------


def _sv_fwd_fused_kernel(NU, NX, NZ, N, ng_stage_ids,
                         H_ref, dvec_ref, ng_ref, g_ref, F_ref, b_ref,
                         Ll_ref, Lxx_ref, Pb_ref, z_ref,
                         Lxx_c, px_c, ll_s, eu_s, px_s, lxx0_s, x_c):
    """Grid (nb, 2(N+1)).  Steps 0..N: the folded backward sweep (stage
    N-s) — identical math to _bwd_kernel_folded(split=True) — writing the
    retained factor (Ll/Lxx/Pb) to HBM for the corrector resolves while
    ALSO caching Ll/eu/px (and the root Lxx block) in VMEM slabs.  Steps
    N+1..2N+1: the pi-less forward recovery (the affine pi is dead) fed
    entirely from those slabs — the eu/px HBM round-trip and the forward
    Ll refetch disappear.  Phase-inactive streams pin their block index
    so the revisit cache skips their refetch."""
    s = pl.program_id(1)

    @pl.when(s <= N)
    def _():
        Lf, eu, px, Pb = _folded_bwd_stage(
            NU, NX, NZ, N, ng_stage_ids, s,
            H_ref, dvec_ref, ng_ref, g_ref, F_ref, b_ref, Lxx_c, px_c,
        )
        _store_vec(Pb_ref, Pb)
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

        @pl.when(s == N)  # root factor block for the phase-B x0 solve
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


@functools.partial(
    jax.jit, static_argnames=("ng_stage_ids", "NU", "NZ", "NX", "lanes_io")
)
def factor_solve_folded_flat_fused(Hl, dvecF, ngl, ng_stage_ids, gF, Fl, bF,
                                   NU, NZ, NX, lanes_io=False):
    """Fused sv+fwd twin of factor_solve_folded_flat(want_pi=False):
    identical contract (piF returned as None)."""
    nb = Hl.shape[0]
    B = nb * BI
    Np1 = Hl.shape[1]
    N = Np1 - 1
    dt = Hl.dtype
    n_ng = len(ng_stage_ids)
    NT = _sym_nt(NZ)
    assert Hl.shape[2] == NT, "Hl must be sym-packed (see sym_compress)"

    if lanes_io:
        dl, gl, bl = dvecF, gF, bF
    else:
        dl = _to_lanes_flat(dvecF, B, (Np1, NZ))
        gl = _to_lanes_flat(gF, B, (Np1, NZ))
        bl = _to_lanes_flat(bF, B, (N, NX))

    def ng_slot(s):
        slot = 0
        for k, stg in enumerate(ng_stage_ids):
            slot = jnp.where((N - s) == stg, k, slot)
        return slot

    in_specs = [
        pl.BlockSpec((1, 1, NT, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(s <= N, N - s, 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NZ, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(s <= N, N - s, 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NT, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(s <= N, ng_slot(s), 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NZ, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(s <= N, N - s, 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(
                         s <= N, jnp.clip(N - s, 0, N - 1),
                         jnp.clip(s - (N + 1), 0, N - 1)), 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(
                         s <= N, jnp.clip(N - s, 0, N - 1),
                         jnp.clip(s - (N + 1), 0, N - 1)), 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, NZ, NU, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(s <= N, N - s, 0), 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(s <= N, N - s, 0), 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(
                         s <= N, jnp.clip(N - s, 0, N - 1), 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NZ, SUBS, LANES),
                     lambda bb, s: (bb, jnp.where(
                         s > N, jnp.maximum(s - (N + 1), 0), 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(
        _sv_fwd_fused_kernel, NU, NX, NZ, N, tuple(ng_stage_ids)
    )
    Ll_l, Lxx_l, Pb_l, z_l = pcall(
        kernel,
        grid=(nb, 2 * Np1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((nb, Np1, NZ, NU, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NX, NX, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, N, NX, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, Np1, NZ, SUBS, LANES), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((NX, NX, SUBS, LANES), dt),      # Lxx carry (bwd)
            pltpu.VMEM((NX, SUBS, LANES), dt),          # px carry (bwd)
            pltpu.VMEM((Np1, NZ * NU * SUBS, LANES), dt),  # Ll slab
            pltpu.VMEM((Np1, NU * SUBS, LANES), dt),       # eu slab
            pltpu.VMEM((Np1, NX * SUBS, LANES), dt),       # px slab
            pltpu.VMEM((NX, NX, SUBS, LANES), dt),         # root Lxx
            pltpu.VMEM((NX, SUBS, LANES), dt),             # x carry (fwd)
        ],
    )(Hl, dl, ngl, gl, Fl, bl)

    if lanes_io:
        return z_l, None, (Ll_l, Lxx_l, Pb_l)
    zF = _from_lanes_flat(z_l, B)
    return zF, None, (Ll_l, Lxx_l, Pb_l)
