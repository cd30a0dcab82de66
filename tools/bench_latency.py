"""Single-instance solve LATENCY benchmark (deployment-style MPC).

The headline bench (bench.py) measures batched throughput; a deployed MPC
controller instead cares about the latency of ONE solve per control tick.
This sweeps the three single-instance strategies over horizon lengths:

  * sequential Riccati backend (the default; O(N) depth per KKT solve)
  * parallel-in-time backend (``ipm.chain_backend_par``; O(log N) depth via
    ``jax.lax.associative_scan`` — the capability the reference lacks, its
    only lever being partial condensing, ``d_part_cond.c:926``)
  * partial condensing N2=4 + sequential IPM (the reference's own lever)

Timing: K solves in-graph via lax.scan with per-solve perturbed b, slope
between two K values, float() sync (see bench.py for why; the axon relay
otherwise fakes timings).

Usage: python tools/bench_latency.py [--horizons 10,30,64]
Prints one JSON line per (strategy, N).
"""

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from hpmpc_tpu.models import cond, ipm
    from hpmpc_tpu.utils.mass_spring import mass_spring_qp

    p = argparse.ArgumentParser()
    p.add_argument("--horizons", default="10,30,64")
    # K span sets the noise floor: the relay's per-call jitter is ~±10 ms
    # and the slope divides it by (K_hi - K_lo) — at the old 8..64 span
    # that is ±180 us of noise on ~300 us/solve quantities (measured
    # r04/r05: tick rows swung 290 -> 2319 us run to run).  64..512 puts
    # the floor at ~±22 us.
    p.add_argument("--k-lo", type=int, default=64)
    p.add_argument("--k-hi", type=int, default=512)
    args = p.parse_args()

    dtype = jnp.float32
    cfg = ipm.IPMConfig(k_max=8, mu_tol=0.0, alpha_min=1e-8)

    def slope_time(solve_fn, qp, K_lo, K_hi, reps=2):
        def make(K):
            @jax.jit
            def run(q, seed):
                def body(acc, i):
                    qi = dataclasses.replace(q, b=q.b * (1.0 + 1e-4 * (i + seed)))
                    sol = solve_fn(qi)
                    return acc + jnp.sum(sol.z) + jnp.sum(sol.kk), None

                acc, _ = lax.scan(
                    body, jnp.asarray(0.0, dtype), jnp.arange(K, dtype=dtype)
                )
                return acc

            return run

        ts = {}
        for K in (K_lo, K_hi):
            f = make(K)
            out = float(f(qp, jnp.asarray(0.0, dtype)))  # compile; float()=sync
            assert np.isfinite(out)
            rts = []
            for r in range(1, max(reps, 4) + 1):
                t0 = time.perf_counter()
                float(f(qp, jnp.asarray(r * 37.0, dtype)))
                rts.append(time.perf_counter() - t0)
            # relay dispatch noise is additive: MIN over reps, per K
            # (mean-of-2 swung the r04 block/tick rows by 2-6x)
            ts[K] = min(rts)
        return max((ts[K_hi] - ts[K_lo]) / (K_hi - K_lo), 1e-9)

    for N in [int(s) for s in args.horizons.split(",")]:
        dims, qp = mass_spring_qp(8, 3, N, dtype=dtype)
        mu_scal = 1.0 / dims.n_constr
        oh = ipm._box_onehot(qp)
        bk_par = ipm.chain_backend_par(dims, qp, oh, mu_scal)

        from hpmpc_tpu.models import ipm_resident
        from hpmpc_tpu.parallel import batch as pbatch
        from hpmpc_tpu.ops import resident_kernel as rk

        cfg_p = dataclasses.replace(cfg, use_pallas=True)

        def resident_block(q):
            # 4th generation: whole IPM in one pallas_call (legacy
            # phase-1 d_ip2_hard semantics), padded to one lane block
            qb = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (1024,) + x.shape), q)
            sol = ipm_resident.solve_batched_resident(dims, qb, cfg_p)
            return jax.tree_util.tree_map(lambda a: a[0], sol)

        # deployment tick: converge to the f32 floor instead of fixed
        # work — the resident engine's batch-liveness skip and the
        # engines' while-loop exit both show here
        cfg_tick = dataclasses.replace(cfg_p, mu_tol=1e-4)

        def resident_tick(q):
            qb = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (1024,) + x.shape), q)
            sol = ipm_resident.solve_batched_resident(dims, qb, cfg_tick)
            return jax.tree_util.tree_map(lambda a: a[0], sol)

        # 5th-generation dense condensed-QP engine (models/ipm_dense):
        # full condensing + terminal elimination -> ONE dense QP, whole
        # IPM in one pallas_call; the only sequential depth is the
        # nz-column Cholesky.  Matrices condensed once (deployment
        # steady state); the vector condense (raw b -> dense rhs) runs
        # per tick through the exact affine maps.
        from collections import namedtuple

        from hpmpc_tpu.models import ipm_dense

        _ZK = namedtuple("_ZK", ["z", "kk"])
        dplan = ipm_dense.plan_dense(dims, qp)

        def dense_tick(q):
            r = ipm_dense.solve_dense_tick(
                dplan, q.b.reshape(-1), cfg_tick)
            return _ZK(z=r.y, kk=r.kk)

        # warm RTI twin: every tick seeds from a reference solve of the
        # UNPERTURBED problem (a stand-in for "previous tick's iterate"
        # that stays correct under the bench's per-solve b perturbation)
        _y_warm = ipm_dense.solve_dense_tick(
            dplan, qp.b.reshape(-1), cfg_tick).y

        def dense_warm_tick(q):
            r = ipm_dense.solve_dense_tick(
                dplan, q.b.reshape(-1), cfg_tick, y0=_y_warm)
            return _ZK(z=r.y, kk=r.kk)

        strategies = {
            "seq": lambda q: ipm.solve(dims, q, cfg),
            "par_in_time": lambda q: ipm.solve(dims, q, cfg, backend=bk_par),
            # pad the instance into one 1024-lane block and ride the
            # mega engine (parallel/batch.solve_single)
            "mega_block": lambda q: pbatch.solve_single(dims, q, cfg_p),
            "mega_tick": lambda q: pbatch.solve_single(dims, q, cfg_tick),
        }
        if dplan.nz <= 128 and dplan.ngd <= 128:
            strategies["dense_tick"] = dense_tick
            strategies["dense_warm_tick"] = dense_warm_tick
        if rk.resident_fits(8, 3, dims.NB, N):
            strategies["resident_block"] = resident_block
            strategies["resident_tick"] = resident_tick
        if N >= 8:
            strategies["partial_cond_N2_4"] = lambda q: cond.solve_partial_cond(
                dims, q, cfg, 4
            )[0]

        for name, fn in strategies.items():
            dt_s = slope_time(fn, qp, args.k_lo, args.k_hi)
            print(
                json.dumps(
                    {
                        "metric": f"latency_us_{name}_N{N}",
                        "value": round(dt_s * 1e6, 1),
                        "unit": "us/solve (single instance, f32, mass-spring nx=8 nu=3)",
                        "vs_baseline": round(314.0 / (dt_s * 1e6), 3),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
