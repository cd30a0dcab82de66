"""Benchmark: batched hard-constraint IPM solves/s on one TPU chip.

Reproduces the reference's headline benchmark problem (mass-spring MPC,
nx=8 nu=3 N=30 nb=7 ngN=8, 8 IPM iterations; ``doc/guide.tex:330-360``) and
measures end-to-end solves/second for a large instance batch.

Baseline: the reference does 3185 solves/s on one Ivy Bridge core
(3.14e-4 s/solve, ``doc/guide.tex:355-360``).  Driver target: >= 10,000
solves/s per TPU chip (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hpmpc_tpu.models import ipm
    from hpmpc_tpu.parallel import batch as pbatch
    from hpmpc_tpu.utils.mass_spring import mass_spring_qp

    dtype = jnp.float32
    BATCH = 4096
    K_MAX = 8  # reference converges in 8 iterations on this problem

    dims, qp = mass_spring_qp(8, 3, 30, ngN=8, dtype=dtype)
    qpb = pbatch.broadcast_qp(qp, BATCH)
    # perturb b across instances so no degenerate batch shortcuts exist
    rng = np.random.default_rng(0)
    scales = jnp.asarray(
        1.0 + 0.05 * rng.standard_normal(BATCH), dtype
    )
    import dataclasses

    qpb = dataclasses.replace(qpb, b=qpb.b * scales[:, None, None])
    # mu_tol=0 forces exactly k_max iterations per instance: the same work
    # per solve as the reference's 8-iteration run (no early-exit flattery)
    cfg = ipm.IPMConfig(k_max=K_MAX, mu_tol=0.0, alpha_min=1e-8)

    @jax.jit
    def run(q, eps):
        # eps perturbs b so no layer (XLA, runtime, relay) can cache results
        q = dataclasses.replace(q, b=q.b * (1.0 + eps))
        sol = pbatch.solve_batched(dims, q, cfg)
        return sol.z, sol.kk

    z, kk = run(qpb, jnp.asarray(0.0, dtype))
    jax.block_until_ready(z)  # compile + warmup
    assert not bool(jnp.isnan(z).any()), "NaN in warmup solves"
    mean_kk = float(jnp.mean(kk.astype(jnp.float32)))

    reps = 5
    t0 = time.perf_counter()
    for i in range(reps):
        z, kk = run(qpb, jnp.asarray(1e-4 * (i + 1), dtype))
        jax.block_until_ready(z)  # per-call sync: no async pipelining flattery
    dt_s = (time.perf_counter() - t0) / reps

    # work-normalized: the f32 path stops at its precision floor (~5-6
    # iterations, mu ~ 1e-4); count iteration throughput and express it as
    # equivalent 8-iteration solves so the number is comparable to the
    # reference's 8-iteration f64 benchmark solve
    solves_per_s = (BATCH * mean_kk / K_MAX) / dt_s
    baseline = 3185.0  # reference: 1/3.14e-4 solves/s, one CPU core
    print(
        json.dumps(
            {
                "metric": "ipm_solves_per_s_per_chip",
                "value": round(solves_per_s, 1),
                "unit": (
                    f"equivalent 8-iteration solves/s (mass-spring nx=8 nu=3 N=30 "
                    f"nb=7 ngN=8, batch={BATCH}, f32, mean_iters={mean_kk:.2f})"
                ),
                "vs_baseline": round(solves_per_s / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
