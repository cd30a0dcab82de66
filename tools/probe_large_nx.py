"""One-off probe: where does the structured (vmapped XLA) route spend time
at large nx?  Times the candidate hot ops in isolation on hardware with the
in-graph-scan + seed + slope method (see bench.py docstring) so relay noise
and loop-invariant hoisting can't fake the numbers.

Usage: python tools/probe_large_nx.py [nx] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from hpmpc_tpu.ops import tri

    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    nz = nx + max(nx // 8, 1)  # NZ ~ nx + nu
    dt = jnp.float32
    hi = jax.lax.Precision.HIGHEST

    rng = np.random.default_rng(0)
    A0 = np.asarray(rng.standard_normal((B, nz, nz)), np.float32)
    SPD = A0 @ A0.transpose(0, 2, 1) + nz * np.eye(nz, dtype=np.float32)
    SPD = jnp.asarray(SPD, dt)
    V = jnp.asarray(rng.standard_normal((B, nz, nz)), dt)

    def timed(name, f, K_lo=4, K_hi=16, reps=2):
        @jax.jit
        def run(K, seed):
            def body(i, acc):
                x = SPD * (1.0 + 1e-6 * (i.astype(dt) + seed) + 1e-30 * acc)
                return acc + jnp.sum(f(x))
            return lax.fori_loop(0, K, body, jnp.asarray(0.0, dt))

        float(run(K_lo, jnp.asarray(0.0, dt)))
        ts = {}
        for K in (K_lo, K_hi):
            t0 = time.perf_counter()
            for r in range(1, reps + 1):
                float(run(K, jnp.asarray(r * 13.0, dt)))
            ts[K] = (time.perf_counter() - t0) / reps
        ms = max((ts[K_hi] - ts[K_lo]) / (K_hi - K_lo), 1e-9) * 1e3
        print(f"{name:34s} {ms:9.3f} ms/call  (B={B}, nz={nz})", flush=True)
        return ms

    from hpmpc_tpu.ops import batch_chol

    timed("cholesky (HIGHEST, D&C)", tri.cholesky)
    timed("cholesky (Pallas rank-1)",
          lambda x: batch_chol.cholesky(x, tb=batch_chol._pick_tb(
              B, x.shape[-1], x.dtype.itemsize)))
    timed("cholesky (blocked MXU p=8)", batch_chol.cholesky_blocked)
    timed("cholesky (blocked MXU p=16)",
          lambda x: batch_chol.cholesky_blocked(x, p=16))
    timed("tril_inverse (HIGHEST, D&C)", tri.tril_inverse)
    timed("matmul HIGHEST", lambda x: jnp.matmul(x, V, precision=hi))
    timed("solve_triangular (lapack)",
          lambda x: tri.solve_tril(jnp.tril(x), V))

    # the per-stage / per-iteration small solves of the blocked Riccati
    nu = nz - nx
    vvec = jnp.asarray(rng.standard_normal((B, nz)), dt)
    timed("trsv lapack vec (B, nz)",
          lambda x: tri.solve_tril(jnp.tril(x), vvec[..., None])[..., 0])
    timed("trsv lapack vec (B, nu, nu)",
          lambda x: tri.solve_tril(
              jnp.tril(x[:, :nu, :nu]), vvec[:, :nu, None])[..., 0])
    timed("matvec (B, nu, nu)",
          lambda x: jnp.matmul(x[:, :nu, :nu], vvec[:, :nu, None],
                               precision=hi)[..., 0])

    # accuracy cross-check on-device
    Lp = np.asarray(jax.jit(batch_chol.cholesky)(SPD), np.float64)
    Ld = np.asarray(jax.jit(tri.cholesky)(SPD), np.float64)
    rel = np.max(np.abs(Lp - Ld)) / np.max(np.abs(Ld))
    print(f"max rel |L_pallas - L_dc| = {rel:.3e}")

    # ---- full blocked Riccati factor+solve at this size (N=30) ---------
    from jax import lax as _lax

    from hpmpc_tpu.models import riccati_blocked

    N = 30
    nu = nz - nx
    Hs = jnp.asarray(
        np.broadcast_to(np.asarray(SPD)[:, None], (B, N + 1, nz, nz)), dt)
    g = jnp.asarray(rng.standard_normal((B, N + 1, nz)), dt)
    F = jnp.asarray(0.3 * rng.standard_normal((B, N, nz, nx)), dt)
    b = jnp.asarray(rng.standard_normal((B, N, nx)), dt)

    @jax.jit
    def run_ric(Hs, g, F, b, K, seed):
        def body(i, acc):
            s = 1.0 + 1e-5 * (i.astype(dt) + seed) + 1e-30 * acc
            sol, L, eu, px, Pb = riccati_blocked.factor_solve(
                Hs * s, g * s, F, b, nu)
            return acc + jnp.sum(sol.z) + jnp.sum(L[:, 0, 0, 0])

        return _lax.fori_loop(0, K, body, jnp.asarray(0.0, dt))

    float(run_ric(Hs, g, F, b, 1, jnp.asarray(0.0, dt)))
    ts = {}
    for K in (1, 3):
        t0 = time.perf_counter()
        for r in (1, 2):
            float(run_ric(Hs, g, F, b, K, jnp.asarray(r * 7.0, dt)))
        ts[K] = (time.perf_counter() - t0) / 2
    ms = max((ts[3] - ts[1]) / 2, 1e-9) * 1e3
    print(f"{'riccati_blocked factor_solve N=30':34s} {ms:9.3f} ms/call"
          f"  (B={B}, nz={nz})", flush=True)


if __name__ == "__main__":
    main()
