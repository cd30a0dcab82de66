"""Kernel-level benchmark: batched small-matrix ops at MPC tile sizes.

The ``test_problems/test_blas_d.c`` equivalent: sweeps matrix sizes,
measures the framework's core batched ops (gemm, fused syrk+cholesky,
triangular solve) and normalizes against the chip's theoretical peak
(the reference normalizes against flops/cycle * GHz,
``test_blas_d.c:87-127``; here against the published f32 TPU peak).

Timing uses in-graph repetition (lax.scan over K perturbed inputs inside
one jitted call) and takes the slope between two K values, which cancels
dispatch/relay overhead — see bench.py for the rationale.

Usage: python tools/bench_blas.py [--sizes 8,16,32,64] [--batch 4096]
Prints one JSON line per (op, size).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from hpmpc_tpu.ops import tri

    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="8,16,32,64")
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--peak-tflops", type=float, default=49.0,
                   help="per-chip f32 peak for normalization (v5e: ~197/4)")
    args = p.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    B = args.batch
    dt = jnp.float32
    HI = jax.lax.Precision.HIGHEST

    def slope_time(fn, x, K_lo=32, K_hi=256, reps=2):
        def make(K):
            @jax.jit
            def run(x, seed):
                def body(acc, i):
                    y = fn(x * (1.0 + 1e-5 * (i + seed)))
                    return acc + jnp.sum(y), None
                acc, _ = lax.scan(body, jnp.asarray(0.0, dt), jnp.arange(K, dtype=dt))
                return acc
            return run

        ts = {}
        for K in (K_lo, K_hi):
            f = make(K)
            float(f(x, jnp.asarray(0.0, dt)))  # compile+warm; float() = sync
            t0 = time.perf_counter()
            for r in range(1, reps + 1):
                float(f(x, jnp.asarray(r * 31.0, dt)))
            ts[K] = (time.perf_counter() - t0) / reps
        return max((ts[K_hi] - ts[K_lo]) / (K_hi - K_lo), 1e-9)

    rng = np.random.default_rng(0)
    for n in sizes:
        A = jnp.asarray(rng.standard_normal((B, n, n)), dt)
        spd = jnp.matmul(A, jnp.swapaxes(A, -1, -2), precision=HI) + n * jnp.eye(n, dtype=dt)

        ops = {
            "gemm": (
                lambda X: jnp.matmul(X, X, precision=HI),
                2.0 * B * n**3,
                A,
            ),
            "syrk_chol": (
                lambda X: tri.cholesky(
                    jnp.matmul(X, jnp.swapaxes(X, -1, -2), precision=HI)
                    + n * jnp.eye(n, dtype=dt)
                ),
                B * (n**3 + n**3 / 3.0),
                A,
            ),
            "tril_inverse": (
                lambda X: tri.tril_inverse(jnp.tril(X) + n * jnp.eye(n, dtype=dt)),
                B * n**3 / 3.0,
                A,
            ),
        }
        for name, (fn, flops, x) in ops.items():
            dt_s = slope_time(fn, x)
            tflops = flops / dt_s / 1e12
            print(
                json.dumps(
                    {
                        "metric": f"{name}_n{n}",
                        "value": round(tflops, 3),
                        "unit": f"TFLOP/s (batch={B}, f32)",
                        "vs_baseline": round(tflops / args.peak_tflops, 4),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
