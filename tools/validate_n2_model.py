"""Validate the ``cond.suggest_n2`` cost model against measured latency.

Sweeps N2 over the divisor grid for the benchmark problem (single
instance — the latency-bound regime the model's ``lat_floor`` term is
about) and prints measured ms/solve for ``cond.solve_partial_cond``
(condense + condensed IPM + expand) next to the model's predicted
ranking.  Also times ``cond.condense`` alone at N2=1 (full condensing)
— the number behind the N^2-flops-variant decision paragraph in
cond.py: the one-off composition-based build is a small fraction of a
single IPM solve, so the reference's N^2-flops recursions
(d_cond.c:239,483) would optimize a non-bottleneck.

Timing: K in-graph solves via lax.scan, per-iteration perturbed b with
the carry chained into the next input, slope between two K values,
float() sync (axon relay rules — see CLAUDE.md).

Usage: python tools/validate_n2_model.py [--N 30] [--n2-grid 1,2,3,5,6,10,15,30]
"""

import argparse
import dataclasses
import json
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

    from hpmpc_tpu.models import cond, ipm
    from hpmpc_tpu.utils.mass_spring import mass_spring_qp

    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=30)
    p.add_argument("--n2-grid", default="1,2,3,5,6,10,15,30")
    p.add_argument("--k-iters", type=int, default=8)
    args = p.parse_args()

    dt = jnp.float32
    dims, qp = mass_spring_qp(8, 3, args.N, dtype=dt)
    cfg = ipm.IPMConfig(k_max=args.k_iters, mu_tol=0.0)

    def slope(fn, K_lo=2, K_hi=10, reps=2):
        def make(K):
            @jax.jit
            def run(seed):
                def body(acc, i):
                    q = dataclasses.replace(
                        qp, b=qp.b * (1.0 + 1e-5 * (i + seed) + 1e-30 * acc)
                    )
                    return fn(q), None
                acc, _ = lax.scan(body, jnp.asarray(0.0, dt),
                                  jnp.arange(K, dtype=dt))
                return acc
            return run
        ts = {}
        for K in (K_lo, K_hi):
            f = make(K)
            float(f(jnp.asarray(0.0, dt)))
            t0 = time.perf_counter()
            for r in range(1, reps + 1):
                float(f(jnp.asarray(r * 31.0, dt)))
            ts[K] = (time.perf_counter() - t0) / reps
        return max((ts[K_hi] - ts[K_lo]) / (K_hi - K_lo), 1e-9)

    grid = [int(x) for x in args.n2_grid.split(",") if int(x) <= args.N]
    measured = {}
    for N2 in grid:
        def fn(q, N2=N2):
            sol, sol2 = cond.solve_partial_cond(dims, q, cfg, N2)
            return jnp.sum(sol.z) + jnp.sum(sol2.stat)
        t = slope(fn)
        measured[N2] = t * 1e3
        print(json.dumps({
            "metric": "partial_cond_latency_ms", "N2": N2,
            "value": round(t * 1e3, 3),
            "unit": f"ms/solve (single instance, N={args.N}, f32)",
        }), flush=True)

    best_measured = min(measured, key=measured.get)
    predicted = cond.suggest_n2(dims, k_iters=args.k_iters, batch=1)
    print(json.dumps({
        "metric": "suggest_n2_validation",
        "best_measured_N2": best_measured,
        "predicted_N2": predicted,
        "measured_ms": {str(k): round(v, 3) for k, v in measured.items()},
        "pred_within_1.25x_of_best": bool(
            measured[predicted] <= 1.25 * measured[best_measured]
        ),
    }), flush=True)

    # condense-alone timing for the N^2-variant decision (full condensing)
    pl1 = cond.plan(dims, 1)
    def fcond(q):
        qp2 = cond.condense(q, pl1)
        return jnp.sum(qp2.H) + jnp.sum(qp2.g) + jnp.sum(qp2.b)
    t_c = slope(fcond)
    print(json.dumps({
        "metric": "full_condense_build_ms",
        "value": round(t_c * 1e3, 3),
        "unit": f"ms/build (single instance, N={args.N}, composition/N^3 "
                "class; compare the solve numbers above)",
    }), flush=True)


if __name__ == "__main__":
    main()
