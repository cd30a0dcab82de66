"""Warm-start saving on the throughput engines (closed-loop RTI style).

The reference's hot loop takes ``warm_start`` in the same solver call
(``d_ip2_res_hard.c:116`` arg 6); here a batched closed-loop run drifts
every instance's affine term per tick and re-solves either COLD or
WARM-started from the previous tick's iterate (``z0``/``pi0`` through
``parallel.batch.solve_batched`` — the round-3 engine warm path).

Reports, per mode: mean IPM iterations per tick and ms per tick
(slope between two in-graph tick counts, bench.py methodology).  The
iteration saving is the product story: a deployed MPC re-solve batch
converges in fewer iterations from the previous optimum.
"""

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

    from hpmpc_tpu.models import ipm
    from hpmpc_tpu.parallel import batch as pbatch
    from hpmpc_tpu.utils.mass_spring import mass_spring_qp

    B = int(os.environ.get("HPMPC_BENCH_BATCH", "4096"))
    dt = jnp.float32
    dims, qp = mass_spring_qp(8, 3, 30, ngN=8, dtype=dt)
    qpb = pbatch.broadcast_qp(qp, B)
    rng = np.random.default_rng(0)
    qpb = dataclasses.replace(
        qpb, b=qpb.b * jnp.asarray(
            1 + 0.05 * rng.standard_normal(B), dt)[:, None, None])

    # converge properly (mu_tol>0) so warm starts can SAVE iterations
    cfg_c = ipm.IPMConfig(k_max=8, mu_tol=1e-4, alpha_min=1e-8,
                          use_pallas=jax.default_backend() == "tpu")
    cfg_w = dataclasses.replace(cfg_c, warm_start=True)

    def make_loop(warm):
        @jax.jit
        def run(q0, T, seed):
            sol0 = pbatch.solve_batched(dims, q0, cfg_c)

            def body(i, carry):
                z, pi, acc, kksum = carry
                q = dataclasses.replace(
                    q0, b=q0.b * (1.0 + 2e-3 * (i.astype(dt) + 1)
                                  + 1e-5 * seed + 1e-30 * acc))
                if warm:
                    sol = pbatch.solve_batched(dims, q, cfg_w,
                                               z0=z, pi0=pi)
                else:
                    sol = pbatch.solve_batched(dims, q, cfg_c)
                return (sol.z, sol.pi,
                        acc + jnp.sum(sol.z[:, 0, : dims.NU]),
                        kksum + jnp.mean(sol.kk.astype(jnp.float32)))

            z, pi, acc, kksum = lax.fori_loop(
                0, T, body,
                (sol0.z, sol0.pi, jnp.asarray(0.0, dt),
                 jnp.asarray(0.0, jnp.float32)))
            return acc, kksum / T.astype(jnp.float32)

        return run

    for name, warm in (("cold", False), ("warm", True)):
        f = make_loop(warm)
        acc, mkk = f(qpb, jnp.asarray(2, jnp.int32), jnp.asarray(0.0, dt))
        acc, mkk = float(acc), float(mkk)
        assert np.isfinite(acc)
        ts = {}
        for T in (2, 8):
            reps = []
            for r in (1, 2, 3):
                t0 = time.perf_counter()
                out, mkk_j = f(qpb, jnp.asarray(T, jnp.int32),
                               jnp.asarray(r * 41.0, dt))
                float(out)
                reps.append(time.perf_counter() - t0)
                mkk = float(mkk_j)
            ts[T] = min(reps)
        per_tick = max((ts[8] - ts[2]) / 6, 1e-9)
        print(json.dumps({
            "metric": f"rti_{name}_per_tick",
            "value": round(B / per_tick, 1),
            "unit": (f"re-solves/s ({name}-start closed-loop tick, "
                     f"mass-spring nx=8 nu=3 N=30 nb=7 ngN=8, mu_tol=1e-4,"
                     f" batch={B}, f32, mean_iters={mkk:.2f}, "
                     f"{per_tick*1e3:.3f} ms/tick)"),
            "vs_baseline": 0.0,
            "mean_iters": round(mkk, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
