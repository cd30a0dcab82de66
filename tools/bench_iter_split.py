"""Phase-2 per-iteration cost split of the flat IPM engine (real TPU).

What it measures.  The headline bench (bench.py) gives ms/batch for whole
solves; this tool separates that into
  * ms per phase-2 IPM iteration (the loop body: sv + fwd + trs + fwd +
    resid Pallas kernels plus the XLA step/alpha/gate glue), and
  * the fixed per-batch cost (init, residual bootstrap, output assembly).

Method.  Two compiled programs at static ``k_max`` values with
``mu_switch=1e9`` (phase 1 skipped: mu0 < the switch threshold) and
``mu_tol=0`` / ``alpha_min=0.0`` so EVERY instance runs exactly ``k_max``
phase-2 iterations (the NaN-guard freezes divergent iterates but the loop
keeps paying full per-trip work — which is the point).  Per-batch time at
each k_max is itself a K-solve in-graph slope (bench.py methodology: seed
perturbation defeats the relay's dispatch memoization, ``float()`` forces
completion, MIN over reps cancels additive relay noise).  Then

    ms_per_iter = (T(k_hi) - T(k_lo)) / (k_hi - k_lo)
    fixed_ms    = T(k_lo) - k_lo * ms_per_iter

Compare ms_per_iter against the isolated kernel times from
tools/bench_kernel_roofline.py: the difference is the XLA glue share —
that comparison decides whether the next lever is kernel traffic or a
fused step-primitives kernel (the reference fuses exactly these loops in
its ``mpc_solvers/c99/d_aux_ip_c99_lib4.c`` primitives).

Run: python tools/bench_iter_split.py   (TPU; two cold compiles ~10-15 min
each on first use, cached in .jax_cache afterwards)
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp
    from jax import lax

    from hpmpc_tpu.models import ipm
    from hpmpc_tpu.parallel import batch as pbatch
    from hpmpc_tpu.utils.mass_spring import mass_spring_qp

    dtype = jnp.float32
    BATCH = int(os.environ.get("HPMPC_BENCH_BATCH", "4096"))
    K_LO, K_HI = 4, 12

    dims, qp = mass_spring_qp(8, 3, 30, ngN=8, dtype=dtype)
    qpb = pbatch.broadcast_qp(qp, BATCH)
    rng = np.random.default_rng(0)
    scales = jnp.asarray(1.0 + 0.05 * rng.standard_normal(BATCH), dtype)
    qpb = dataclasses.replace(qpb, b=qpb.b * scales[:, None, None])

    def make_run(k_max):
        cfg = ipm.IPMConfig(
            k_max=k_max, mu_tol=0.0, alpha_min=0.0, mu_switch=1e9,
            use_pallas=True,
        )

        @jax.jit
        def run(q, K, seed):
            def body(i, acc):
                qi = dataclasses.replace(
                    q, b=q.b * (1.0 + 1e-4 * (i.astype(dtype) + seed))
                )
                sol = pbatch.solve_batched(dims, qi, cfg)
                return acc + jnp.sum(sol.z) + jnp.sum(sol.kk)

            return lax.fori_loop(0, K, body, jnp.asarray(0.0, dtype))

        return run

    def time_batch(run):
        # warmup/compile
        float(run(qpb, 1, jnp.asarray(0.0, dtype)))
        times = {}
        for K in (2, 6):
            reps = []
            for r in range(1, 5):
                t0 = time.perf_counter()
                out = float(run(qpb, K, jnp.asarray(r * 53.0 + K, dtype)))
                reps.append(time.perf_counter() - t0)
                assert np.isfinite(out)
            times[K] = min(reps)
        return (times[6] - times[2]) / 4.0  # s per batch-solve

    t_lo = time_batch(make_run(K_LO))
    t_hi = time_batch(make_run(K_HI))
    ms_per_iter = (t_hi - t_lo) / (K_HI - K_LO) * 1e3
    fixed_ms = t_lo * 1e3 - K_LO * ms_per_iter

    print(json.dumps({
        "metric": "ipm_phase2_iter_split",
        "ms_per_iter": round(ms_per_iter, 4),
        "fixed_ms_per_batch": round(fixed_ms, 4),
        "unit": (
            f"phase-2 only, batch={BATCH}, mass-spring nx=8 nu=3 N=30 "
            f"nb=7 ngN=8, f32, k_max {K_LO} vs {K_HI}, K=2..6 in-graph slope"
        ),
    }))


if __name__ == "__main__":
    main()
