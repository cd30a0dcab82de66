"""Soft-IPM TPU bench: Pallas KKT route vs the vmapped-XLA route.

The reference's soft benchmark problem (mass-spring with soft state
constraints, ``test_problems/test_d_ip_soft.c:165-258``) batched to 4096
instances.  Measures solves/s for both KKT backends of
:mod:`hpmpc_tpu.models.ipm_soft` — ``use_pallas`` dispatches the
factor/solve pair to the fused stage kernels via
``ipm.make_pallas_chain_kkt``.

Methodology follows bench.py: K solves in-graph via ``lax.scan`` with
per-iteration perturbed data AND the carry chained into the next
iteration's input (relay memoization/hoisting defences — see
CLAUDE.md), per-solve time = slope between K values.

Prints one JSON line per route plus the speedup.
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

    from hpmpc_tpu.models import ipm, ipm_soft
    from hpmpc_tpu.parallel import batch as pbatch
    from hpmpc_tpu.utils.mass_spring import mass_spring_soft_qp

    B = 4096
    K_ITERS = 8
    dt = jnp.float32
    NH = int(os.environ.get("HPMPC_SOFT_BENCH_N", "30"))
    dims, qp, soft = mass_spring_soft_qp(8, 3, NH, Z=10.0, dtype=dt)
    qps = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), qp
    )
    softs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), soft
    )
    rng = np.random.default_rng(0)
    pert = jnp.asarray(1 + 0.02 * rng.standard_normal(B), dt)[:, None, None]
    qps = dataclasses.replace(qps, g=qps.g * pert)

    idxbs = np.asarray(soft.idxbs)

    def make_run(cfg, K, flat=False):
        @jax.jit
        def run(seed):
            def body(acc, i):
                q = dataclasses.replace(
                    qps, g=qps.g * (1.0 + 1e-5 * (i + seed) + 1e-30 * acc)
                )
                if flat:
                    sol = pbatch.solve_batched_soft(
                        dims, q, softs, cfg, idxbs=idxbs
                    )
                else:
                    sol = jax.vmap(
                        lambda qq, ss: ipm_soft.solve(dims, qq, ss, cfg)
                    )(q, softs)
                return jnp.sum(sol.z) + jnp.sum(sol.stat), None
            acc, _ = lax.scan(body, jnp.asarray(0.0, dt),
                              jnp.arange(K, dtype=dt))
            return acc
        return run

    def slope(cfg, K_lo=2, K_hi=6, reps=2, flat=False):
        ts = {}
        for K in (K_lo, K_hi):
            f = make_run(cfg, K, flat=flat)
            float(f(jnp.asarray(0.0, dt)))
            t0 = time.perf_counter()
            for r in range(1, reps + 1):
                float(f(jnp.asarray(r * 31.0, dt)))
            ts[K] = (time.perf_counter() - t0) / reps
        return max((ts[K_hi] - ts[K_lo]) / (K_hi - K_lo), 1e-9)

    cfg_x = ipm.IPMConfig(k_max=K_ITERS, mu0=100.0, mu_tol=0.0)
    cfg_p = dataclasses.replace(cfg_x, use_pallas=True)

    # engine knobs are read per trace inside the dispatch
    # (parallel/batch.py + models/ipm_soft_lanes.py); warm routes first so
    # a timeout mid-run still leaves the earlier JSON lines
    only = os.environ.get("HPMPC_SOFT_ROWS")  # comma list to filter
    t_x = None
    for name, env, cfg, flat in (
        ("xla", {"HPMPC_RESIDENT": "0", "HPMPC_LANES_LOOP": "0",
                 "HPMPC_MEGA_SWEEPS": "0"}, cfg_x, False),
        ("pallas", {"HPMPC_RESIDENT": "0", "HPMPC_LANES_LOOP": "0",
                    "HPMPC_MEGA_SWEEPS": "0"}, cfg_p, False),
        ("flat", {"HPMPC_RESIDENT": "0", "HPMPC_LANES_LOOP": "0",
                  "HPMPC_MEGA_SWEEPS": "0"}, cfg_p, True),
        ("lanes", {"HPMPC_RESIDENT": "0", "HPMPC_LANES_LOOP": "1",
                   "HPMPC_MEGA_SWEEPS": "0"}, cfg_p, True),
        ("mega", {"HPMPC_RESIDENT": "0", "HPMPC_LANES_LOOP": "1",
                  "HPMPC_MEGA_SWEEPS": "1"}, cfg_p, True),
        # 4th generation: the whole soft IPM in one pallas_call (the
        # library default where it fits; models/ipm_soft_resident.py)
        ("resident", {"HPMPC_RESIDENT": "1"}, cfg_p, True),
    ):
        if only and name not in only.split(","):
            continue
        os.environ.update(env)
        try:
            t = slope(cfg, flat=flat)
        except Exception as e:  # report the row, keep the ladder
            print(json.dumps({
                "metric": f"soft_ipm_solves_per_s_{name}",
                "value": 0.0, "vs_baseline": 0.0,
                "error": f"{type(e).__name__}: {e}"[:300],
            }), flush=True)
            continue
        if t_x is None:
            t_x = t
        print(json.dumps({
            "metric": f"soft_ipm_solves_per_s_{name}",
            "value": round(B / t, 1),
            "unit": f"{K_ITERS}-iteration soft solves/s "
                    f"(nx=8 nu=3 N={NH} soft-ns=4, batch={B}, f32; "
                    f"{t * 1e3:.2f} ms/batch)",
            "vs_baseline": round(t_x / t, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
