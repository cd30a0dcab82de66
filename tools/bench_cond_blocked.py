"""Partial condensing composed with the blocked batched Riccati at large
nx (VERDICT r04 next-step #6).

At nx >= 192 the blocked engine's win over the XLA route shrinks to
~1.05-1.31x — the remainder is MXU-bound batched matmul.  The reference's
own answer at that end is horizon restructuring
(``lqcp_solvers/d_part_cond.c:926``): trade stage count N for stage size
``nz2 = T nu + nx``.  Flops per iteration ~ N2 * nz2^3 vs N * nz^3 — at
nx >> nu the cubic barely grows while the stage count drops, so the model
predicts a real win (e.g. nx=192 nu=24 N=30 -> N2=10: 0.61x the flops).

Measures, per nx in --sizes and N2 in --n2s (plus suggest_n2's pick):
solves/s of ``cond.solve_batched_partial_cond`` (vmapped condense ->
batched IPM on the condensed problem -> vmapped expand) vs the plain
batched route at the same fixed iteration count, with a cross-check that
both routes agree on the controls.  One JSON line per measurement.

Usage: python tools/bench_cond_blocked.py [--sizes 128,192] [--n2s 5,10,15]
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
    from hpmpc_tpu.parallel import batch as pbatch
    from hpmpc_tpu.utils.mass_spring import mass_spring_qp

    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="128,192")
    p.add_argument("--n2s", default="5,10,15")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--N", type=int, default=30)
    args = p.parse_args()

    dt = jnp.float32
    KI = 8

    def slope(run, K_lo=2, K_hi=6, reps=3):
        float(run(jnp.asarray(0.0, dt), K_lo))  # compile
        float(run(jnp.asarray(0.0, dt), K_hi))
        ts = {}
        for K in (K_lo, K_hi):
            rts = []
            for r in range(1, reps + 1):
                t0 = time.perf_counter()
                float(run(jnp.asarray(r * 31.0 + K, dt), K))
                rts.append(time.perf_counter() - t0)
            ts[K] = min(rts)
        return max((ts[K_hi] - ts[K_lo]) / (K_hi - K_lo), 1e-9)

    for nx in [int(s) for s in args.sizes.split(",")]:
        nu = nx // 8
        # batch sizing follows the size sweep's protocol: HBM/relay
        # working sets cap B at large nx (r04 rows: 512 at nx=128,
        # 256 at nx>=192)
        B = min(args.batch, 512 if nx <= 128 else 256)
        dims, qp = mass_spring_qp(nx, nu, args.N, dtype=dt)
        qpb = pbatch.broadcast_qp(qp, B)
        rng = np.random.default_rng(0)
        qpb = dataclasses.replace(
            qpb,
            b=qpb.b * jnp.asarray(
                1 + 0.02 * rng.standard_normal(B), dt)[:, None, None],
        )
        cfg = ipm.IPMConfig(k_max=KI, mu_tol=0.0, alpha_min=1e-8,
                            use_pallas=jax.default_backend() == "tpu")

        # the QP is a jit ARGUMENT everywhere below — closing over it
        # bakes GBs of constants into the module (relay 413s / compile
        # flakes; memory note: keep QPs as jit arguments)
        def make_plain():
            @jax.jit
            def run(q0, seed, K):
                def body(i, acc):
                    q = dataclasses.replace(
                        q0, b=q0.b * (1.0 + 1e-4 * (i.astype(dt) + seed)))
                    sol = pbatch.solve_batched(dims, q, cfg)
                    return acc + jnp.sum(sol.z[:, 0, :dims.NU])
                return lax.fori_loop(0, K, body, jnp.asarray(0.0, dt))
            return lambda seed, K: run(qpb, seed, K)

        t_plain = slope(make_plain())
        sol_p = jax.jit(
            lambda q: pbatch.solve_batched(dims, q, cfg))(qpb)
        u_p = np.asarray(sol_p.z[:, 0, :dims.NU], np.float64)
        print(json.dumps({
            "metric": f"cond_blocked_nx{nx}_plain",
            "value": round(B / t_plain, 1),
            "unit": (f"8-iteration solves/s, plain batched route "
                     f"(mass-spring nx={nx} nu={nu} N={args.N}, "
                     f"batch={B}, f32, {t_plain*1e3:.2f} ms/batch)"),
            "vs_baseline": 0.0,
        }), flush=True)

        n2_list = sorted({int(s) for s in args.n2s.split(",")}
                         | {cond.suggest_n2(dims, batch=B)})
        for N2 in n2_list:
            if N2 >= args.N:
                continue
            try:
                def make_cond(N2=N2):
                    @jax.jit
                    def run(q0, seed, K):
                        def body(i, acc):
                            q = dataclasses.replace(
                                q0, b=q0.b * (1.0 + 1e-4 * (
                                    i.astype(dt) + seed)))
                            exp, _ = cond.solve_batched_partial_cond(
                                dims, q, cfg, N2)
                            return acc + jnp.sum(exp.z[:, 0, :dims.NU])
                        return lax.fori_loop(0, K, body,
                                             jnp.asarray(0.0, dt))
                    return lambda seed, K: run(qpb, seed, K)

                t_c = slope(make_cond())
                exp, _ = jax.jit(
                    lambda q: cond.solve_batched_partial_cond(
                        dims, q, cfg, N2))(qpb)
                u_c = np.asarray(exp.z[:, 0, :dims.NU], np.float64)
                du = float(np.median(np.max(
                    np.abs(u_c - u_p), axis=1)) / max(
                        1.0, float(np.abs(u_p).max())))
                print(json.dumps({
                    "metric": f"cond_blocked_nx{nx}_N2_{N2}",
                    "value": round(B / t_c, 1),
                    "unit": (f"8-iteration solves/s via partial cond "
                             f"N2={N2} (suggest_n2="
                             f"{cond.suggest_n2(dims, batch=B)}; "
                             f"{t_c*1e3:.2f} ms/batch, speedup vs plain "
                             f"{t_plain/t_c:.2f}x, median rel du vs "
                             f"plain {du:.1e})"),
                    "vs_baseline": round(t_plain / t_c, 3),
                }), flush=True)
            except Exception as e:  # noqa: BLE001 — report, keep sweeping
                print(json.dumps({
                    "metric": f"cond_blocked_nx{nx}_N2_{N2}",
                    "value": 0.0,
                    "unit": f"ERROR: {str(e)[:160]}",
                    "vs_baseline": 0.0,
                }), flush=True)


if __name__ == "__main__":
    main()
