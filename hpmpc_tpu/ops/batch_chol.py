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


def _chol_body(n: int, TB: int, a_ref, l_ref):
    A = a_ref[...]  # (TB, n, n)
    dt = A.dtype
    tiny = jnp.asarray(1e-30 if dt == jnp.float64 else 1e-20, dt)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    dvec = jnp.zeros((TB, 1, n), dt)
    for j in range(n):
        ajj = A[:, j : j + 1, j : j + 1]  # (TB, 1, 1)
        d = jax.lax.rsqrt(jnp.maximum(ajj, tiny))
        r = A[:, j : j + 1, :] * d  # (TB, 1, n) row j, scaled
        rm = jnp.where(lane > j, r, jnp.zeros((), dt))
        c = A[:, :, j : j + 1] * d  # (TB, n, 1) col j, scaled
        A = A - c * rm  # rank-1 on the trailing block (cols > j)
        dvec = jnp.where(lane == j, d, dvec)
    # column j (rows >= j) of the updated A is the unscaled factor column
    L = jnp.where(row >= lane, A * dvec, jnp.zeros((), dt))
    l_ref[...] = L


def _need_bytes(tb: int, n: int, itemsize: int) -> int:
    """Scoped-VMEM estimate for one grid step: in+out blocks double-
    buffered (4 copies) plus the kernel's live stack — the loaded A, the
    assembled L and ~2 rank-1 temporaries (4 more).  Calibrated on v5e
    Mosaic stack-OOM reports (TB=64, n=72: reported 22.0 MiB; this model
    gives 23.6 MiB)."""
    npad = max(((n + LANES - 1) // LANES) * LANES, LANES)
    nsub = max(((n + SUBS - 1) // SUBS) * SUBS, SUBS)
    return 8 * tb * nsub * npad * itemsize


def _pick_tb(B: int, n: int, itemsize: int) -> int:
    """Largest TB in {8,...,64} whose working set stays inside Mosaic's
    default 16 MiB scoped-VMEM cap (small blocks pipeline better; the
    cap is only raised when even TB=8 needs it — large n)."""
    for tb in (64, 32, 16, 8):
        if B % tb == 0 and _need_bytes(tb, n, itemsize) <= (14 << 20):
            return tb
    return 8


@functools.partial(jax.jit, static_argnames=("tb",))
def cholesky(M, tb: int | None = None):
    """Batched lower Cholesky of SPD ``M`` (..., n, n) via the Pallas
    right-looking kernel.  Leading dims are flattened into the grid; the
    batch is padded to a TB multiple with identity instances.  Matches
    ``tri.cholesky`` (clamped-pivot semantics differ only on non-SPD
    inputs, where neither factor is meaningful)."""
    batch_shape = M.shape[:-2]
    n = M.shape[-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    Mf = M.reshape((B, n, n))
    TB = tb or _pick_tb(max(B, SUBS), n, M.dtype.itemsize)
    Bp = ((B + TB - 1) // TB) * TB
    if Bp != B:
        pad = jnp.broadcast_to(jnp.eye(n, dtype=M.dtype), (Bp - B, n, n))
        Mf = jnp.concatenate([Mf, pad], axis=0)
    kwargs = {}
    need = _need_bytes(TB, n, M.dtype.itemsize)
    if need > (14 << 20):  # even TB=8 outgrows the Mosaic default (big n)
        from jax.experimental.pallas import tpu as pltpu

        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(min(2 * need, 112 << 20)))
    out = pcall(
        functools.partial(_chol_body, n, TB),
        grid=(Bp // TB,),
        in_specs=[pl.BlockSpec((TB, n, n), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((TB, n, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, n, n), M.dtype),
        **kwargs,
    )(Mf)
    return out[:B].reshape(batch_shape + (n, n))
