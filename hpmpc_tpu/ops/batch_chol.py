"""Pallas TPU kernel: batched dense Cholesky for MEDIUM/LARGE stage sizes.

The per-scalar-tile engines (``stage_kernel``/``mega_kernel``) hold one
(8, 128) batch tile per scalar matrix entry — unbeatable to NZ~54, but the
VMEM working set and trace size grow O(NZ^2) and the engines fall back to
the vmapped structured path beyond it.  On that path the dominant op at
large NZ is the batched stage Cholesky: the XLA divide-&-conquer
(``ops/tri.cholesky``) materializes full (B, n, n) intermediates at every
recursion level and dispatches O(n) tiny leaf kernels — measured 2.7 ms
for (1024, 72, 72) f32 on v5e, ~25x its matmul-equivalent cost.

This kernel is the TPU-native fix for that band (the reference is built
for nx up to ~300, ``doc/guide.tex:27``; its size-sweep protocol is
``test_problems/test_d_ric_mpc.c:283``).  Layout: the MATRIX lives in
VMEM as an (n, n) tile block (rows on sublanes, cols on lanes) and the
batch rides the grid, TB instances per grid step.  The factorization is
right-looking with the column loop unrolled at trace time (O(n) traced
ops, so it compiles fast where the per-scalar engines' O(n^3) traces
cannot), one fused VPU rank-1 update per column:

    d_j = rsqrt(A[j, j]);  r = A[j, :] * d_j (cols > j masked)
    A  -= (A[:, j] * d_j) (x) r              # one (TB, n, n) FMA

Because A stays SYMMETRIC on the not-yet-factored block throughout, the
final L is recovered with a single scale-and-mask pass: column j of the
updated A (rows >= j) already holds the unscaled factor column, so
L = tril(A * d_row) — no per-column stores into the output.

All arithmetic is full-precision VPU FMA (no MXU bf16 passes at all), so
the factor is at least as accurate as the HIGHEST-precision D&C.

Dispatched by the structured route's ``custom_vmap`` KKT wrappers
(``models/ipm.make_pallas_chain_kkt``) for batches the per-scalar engines
cannot serve; exact-parity tests vs ``tri.cholesky`` run in interpret
mode (tests/test_batch_chol.py) and on hardware via
tools/bench_size_sweep.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .stage_kernel import pcall

LANES = 128
SUBS = 8


def _chol_body(n: int, TB: int, a_ref, l_ref, s_ref):
    """Right-looking rank-1 factorization IN-PLACE on a VMEM scratch.

    Two deliberate choices vs a value-carried loop:
      * each column step loads/stores only the TRAILING rows
        (sublane-aligned static slice) — the rank-1 work shrinks from
        n * (n x n) to ~n^3/2 elements total;
      * the matrix lives in a scratch REF between steps, so Mosaic's
        live-value window stays O(slice) instead of accumulating
        whole-matrix copies (the stack-OOM mode at n >= ~100).
    """
    dt = a_ref.dtype
    tiny = jnp.asarray(1e-30 if dt == jnp.float64 else 1e-20, dt)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    s_ref[...] = a_ref[...]
    dvec = jnp.zeros((TB, 1, n), dt)
    for j in range(n):
        r0 = (j // SUBS) * SUBS  # sublane-aligned trailing-row start
        ajj = s_ref[:, j : j + 1, j : j + 1]  # (TB, 1, 1)
        d = jax.lax.rsqrt(jnp.maximum(ajj, tiny))
        r = s_ref[:, j : j + 1, :] * d  # (TB, 1, n) row j, scaled
        rm = jnp.where(lane > j, r, jnp.zeros((), dt))
        Asub = s_ref[:, r0:, :]  # (TB, n - r0, n)
        c = Asub[:, :, j : j + 1] * d  # (TB, n - r0, 1) col j, scaled
        s_ref[:, r0:, :] = Asub - c * rm
        dvec = jnp.where(lane == j, d, dvec)
    # column j (rows >= j) of the updated A is the unscaled factor column
    l_ref[...] = jnp.where(row >= lane, s_ref[...] * dvec,
                           jnp.zeros((), dt))


def _need_bytes(tb: int, n: int, itemsize: int) -> int:
    """Scoped-VMEM estimate for one grid step: in+out blocks double-
    buffered (4 tiles), the scratch matrix (1), and a few live slice
    temporaries.  With the in-place scratch-ref loop the live window no
    longer grows with n (the value-carried form accumulated whole-matrix
    copies: 9.3 at n=72, 18.1 at n=108 — v5e stack-OOM reports).
    Hardware-calibrated by tools/calib_chol_vmem.py."""
    npad = max(((n + LANES - 1) // LANES) * LANES, LANES)
    nsub = max(((n + SUBS - 1) // SUBS) * SUBS, SUBS)
    return 10 * tb * nsub * npad * itemsize


def _pick_tb(B: int, n: int, itemsize: int) -> int:
    """Largest TB in {8,...,64} whose working set stays inside Mosaic's
    default 16 MiB scoped-VMEM cap (small blocks pipeline better; the
    cap is only raised when even TB=8 needs it — large n)."""
    for tb in (64, 32, 16, 8):
        if B % tb == 0 and _need_bytes(tb, n, itemsize) <= (14 << 20):
            return tb
    return 8


def _panel_body(p: int, TB: int, a_ref, l_ref, li_ref):
    """Fused panel factor + lower-triangular inverse: L = chol(A),
    Linv = L^-1, both (TB, p, p).  The inverse lets the caller run the
    column-block trsm as ONE MXU matmul (L21 = A21 @ Linv^T) instead of
    a p-step substitution over a (B, m, p) block."""
    A = a_ref[...]
    dt = A.dtype
    tiny = jnp.asarray(1e-30 if dt == jnp.float64 else 1e-20, dt)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, p), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, p, 1), 1)
    dvec = jnp.zeros((TB, 1, p), dt)
    for j in range(p):
        ajj = A[:, j : j + 1, j : j + 1]
        d = jax.lax.rsqrt(jnp.maximum(ajj, tiny))
        r = A[:, j : j + 1, :] * d
        rm = jnp.where(lane > j, r, jnp.zeros((), dt))
        A = A - (A[:, :, j : j + 1] * d) * rm
        dvec = jnp.where(lane == j, d, dvec)
    L = jnp.where(row >= lane, A * dvec, jnp.zeros((), dt))
    l_ref[...] = L
    # forward substitution, one row at a time: Linv[i, :] =
    # (e_i - L[i, <i] @ Linv[<i, :]) / L[i, i]
    eye = jnp.where(row == lane, jnp.ones((), dt), jnp.zeros((), dt))
    eye = jnp.broadcast_to(eye, (TB, p, p))
    dinv = jnp.where(row == lane, jnp.swapaxes(dvec, -1, -2),
                     jnp.zeros((), dt))  # (TB, p, p) diag of 1/L[j,j]
    Linv = jnp.zeros((TB, p, p), dt)
    for i in range(p):
        li = jnp.where(lane < i, L[:, i : i + 1, :], jnp.zeros((), dt))
        acc = jnp.sum(jnp.swapaxes(li, -1, -2) * Linv, axis=-2,
                      keepdims=True)  # (TB, 1, p)
        ri = (eye[:, i : i + 1, :] - acc) * dinv[:, i : i + 1, i : i + 1]
        Linv = jnp.where(row == i, ri, Linv)
    li_ref[...] = Linv


@functools.partial(jax.jit, static_argnames=("p",))
def _panel_factor(A, p: int):
    """Batched (B, p, p) panel chol + inverse via one Pallas call."""
    B = A.shape[0]
    TB = 64 if B % 64 == 0 else 8
    Bp = ((B + TB - 1) // TB) * TB
    if Bp != B:
        pad = jnp.broadcast_to(jnp.eye(p, dtype=A.dtype), (Bp - B, p, p))
        A = jnp.concatenate([A, pad], axis=0)
    L, Li = pcall(
        functools.partial(_panel_body, p, TB),
        grid=(Bp // TB,),
        in_specs=[pl.BlockSpec((TB, p, p), lambda i: (i, 0, 0))],
        out_specs=[pl.BlockSpec((TB, p, p), lambda i: (i, 0, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((Bp, p, p), A.dtype)] * 2,
    )(A)
    return L[:B], Li[:B]


_HI = jax.lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("p",))
def cholesky_blocked(M, p: int = 8):
    """Blocked right-looking batched Cholesky: panels of width ``p``
    factor in a fused Pallas kernel (with their triangular inverse); the
    column-block trsm and the trailing syrk run as MXU batched matmuls.

    MEASURED NEGATIVE RESULT on v5e (tools/probe_large_nx.py, B=1024,
    n=72): 8.1 ms (p=8) / 5.8 ms (p=16) vs the rank-1 kernel's 0.255 ms
    and the D&C's 1.43 ms.  The n/p XLA steps each materialize the
    trailing block in HBM and pay dispatch latency, which swamps the MXU
    win at these sizes — the single-kernel rank-1 form keeps everything
    in VMEM and is ~5.6x FASTER than the D&C instead.  Kept as a tested
    variant for much larger n; NOT auto-routed."""
    batch_shape = M.shape[:-2]
    n = M.shape[-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    npad = ((n + p - 1) // p) * p
    A = M.reshape((B, n, n))
    if npad != n:
        A = jnp.pad(A, ((0, 0), (0, npad - n), (0, npad - n)))
        # identity on the padded diagonal keeps the trailing block SPD
        ii = jnp.arange(n, npad)
        A = A.at[:, ii, ii].set(jnp.ones((), M.dtype))
    cols = []
    for k in range(0, npad, p):
        A11 = jax.lax.slice(A, (0, k, k), (B, k + p, k + p))
        L11, L11i = _panel_factor(A11, p)
        m = npad - k - p
        if m > 0:
            A21 = jax.lax.slice(A, (0, k + p, k), (B, npad, k + p))
            L21 = jnp.matmul(A21, jnp.swapaxes(L11i, -1, -2),
                             precision=_HI)
            A22 = jax.lax.slice(A, (0, k + p, k + p), (B, npad, npad))
            A22 = A22 - jnp.matmul(L21, jnp.swapaxes(L21, -1, -2),
                                   precision=_HI)
            A = jax.lax.dynamic_update_slice(A, A22, (0, k + p, k + p))
            col = jnp.concatenate([L11, L21], axis=1)  # (B, p+m, p)
        else:
            col = L11
        if k > 0:
            col = jnp.pad(col, ((0, 0), (k, 0), (0, 0)))
        cols.append(col)
    L = jnp.concatenate(cols, axis=-1)
    return L[:, :n, :n].reshape(batch_shape + (n, n))


@functools.partial(jax.jit, static_argnames=("tb",))
def cholesky(M, tb: int | None = None):
    """Batched lower Cholesky of SPD ``M`` (..., n, n) via the Pallas
    right-looking rank-1 kernel — measured 5.6x the XLA D&C at
    (1024, 72, 72) f32 on v5e (0.255 vs 1.43 ms; the MXU panel variant
    :func:`cholesky_blocked` measured SLOWER, see its docstring).
    Size envelope (tools/probe_large_nx.py, B=256, v5e 2026-08-20):
    still 2.7x the D&C at n=216 (0.84 vs 2.24 ms); crossover at
    n ~ 288 where the rank-1 kernel's O(n^3) VPU work catches the D&C
    (4.07 vs 3.91 ms) — and the MXU panel variant stays 3.5-7x behind
    both at every measured size (per-panel XLA dispatch overhead).
    Leading dims are flattened into the grid; the batch is padded to a
    TB multiple with identity instances.  Matches ``tri.cholesky``
    (clamped-pivot semantics differ only on non-SPD inputs, where
    neither factor is meaningful)."""
    batch_shape = M.shape[:-2]
    n = M.shape[-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    Mf = M.reshape((B, n, n))
    TB = tb or _pick_tb(max(B, SUBS), n, M.dtype.itemsize)
    Bp = ((B + TB - 1) // TB) * TB
    if Bp != B:
        pad = jnp.broadcast_to(jnp.eye(n, dtype=M.dtype), (Bp - B, n, n))
        Mf = jnp.concatenate([Mf, pad], axis=0)
    from jax.experimental.pallas import tpu as pltpu

    kwargs = {}
    need = _need_bytes(TB, n, M.dtype.itemsize)
    if need > (14 << 20):  # even TB=8 outgrows the Mosaic default (big n)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(min(2 * need, 112 << 20)))
    out = pcall(
        functools.partial(_chol_body, n, TB),
        grid=(Bp // TB,),
        in_specs=[pl.BlockSpec((TB, n, n), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((TB, n, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, n, n), M.dtype),
        scratch_shapes=[pltpu.VMEM((TB, n, n), M.dtype)],
        **kwargs,
    )(Mf)
    return out[:B].reshape(batch_shape + (n, n))
