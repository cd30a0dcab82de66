"""Benchmark: batched hard-constraint IPM solves/s on one TPU chip.

Reproduces the reference's headline benchmark problem (mass-spring MPC,
nx=8 nu=3 N=30 nb=7 ngN=8, 8 IPM iterations; ``doc/guide.tex:330-360``) and
measures device-side end-to-end solves/second for a large instance batch.

Methodology: K independent full solves (per-solve perturbed b) run inside
ONE jitted call via a dynamic-trip-count ``fori_loop``; per-solve time is
the SLOPE between a K=2 and a K=10 call, which cancels dispatch/transfer
overhead (this harness reaches the chip through a network relay whose
per-call latency and output shipping would otherwise dominate by 100x;
solutions are materialized in HBM and checksummed on device, plus the u_0
controls — what an MPC deployment actually ships off-chip — are extracted
per solve).  K being a runtime scalar means the WHOLE bench is a single
XLA program: one compile (persisted in ``.jax_cache``) serves every K and
the iteration-count probe.

Work-normalization: the f32 path stops at its precision floor (~5-6 of the
8 reference iterations, mu ~ 1e-4); throughput is expressed as equivalent
8-iteration solves so the number is comparable to the reference's
8-iteration f64 benchmark (3,185 solves/s on one Ivy Bridge core).

Robustness: compiled executables persist across processes in
``.jax_cache`` (the axon remote-compile path honours it, measured), so a
warm run completes in well under a minute.  A watchdog thread guarantees
ONE JSON line is printed even if a cold compile outlives the caller's
timeout: it reports this run's measurement if one completed, else the last
completed run's persisted value tagged as a fallback.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import dataclasses
import json
import os
import threading
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
_LAST = os.path.join(_REPO, ".bench_last.json")
_LAST_PAR = os.path.join(_REPO, ".bench_last_parity.json")
_BASELINE = 3185.0  # reference: 1/3.14e-4 solves/s, one CPU core

_t_start = time.time()
_result = {}  # filled as measurements land; watchdog may print it early
_printed = threading.Event()
_done = threading.Event()  # both lines printed normally


def _emit(payload):
    if not _printed.is_set():
        _printed.set()
        print(json.dumps(payload), flush=True)


def _watchdog(budget_s: float):
    """If the run outlives ``budget_s`` (cold compile through a degraded
    relay), print best-effort JSON lines and hard-exit so the caller's
    timeout never yields an empty record."""
    while not _done.wait(timeout=5.0):
        if time.time() - _t_start < budget_s:
            continue
        if "value" in _result:
            _emit(_result)
        elif os.path.exists(_LAST):
            last = json.load(open(_LAST))
            last["unit"] += " [fallback: last completed run, this run timed out]"
            _emit(last)
        else:
            _emit(
                {
                    "metric": "ipm_solves_per_s_per_chip",
                    "value": 0.0,
                    "unit": "TIMEOUT before first measurement (cold compile)",
                    "vs_baseline": 0.0,
                }
            )
        # second line: parity-tolerance measurement, from this run if it
        # landed, else the last persisted one
        if os.path.exists(_LAST_PAR):
            par = json.load(open(_LAST_PAR))
            if time.time() - os.path.getmtime(_LAST_PAR) > 60:
                par["unit"] += " [fallback: last completed parity run]"
            print(json.dumps(par), flush=True)
        os._exit(0)
    # measurements printed normally; nothing to do


def main():
    budget = float(os.environ.get("HPMPC_BENCH_BUDGET_S", "1380"))
    threading.Thread(target=_watchdog, args=(budget,), daemon=True).start()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp
    from jax import lax

    from hpmpc_tpu.models import ipm
    from hpmpc_tpu.parallel import batch as pbatch
    from hpmpc_tpu.utils.mass_spring import mass_spring_qp

    dtype = jnp.float32
    BATCH = int(os.environ.get("HPMPC_BENCH_BATCH", "4096"))
    K_MAX = 8  # reference converges in 8 iterations on this problem

    dims, qp = mass_spring_qp(8, 3, 30, ngN=8, dtype=dtype)
    qpb = pbatch.broadcast_qp(qp, BATCH)
    rng = np.random.default_rng(0)
    scales = jnp.asarray(1.0 + 0.05 * rng.standard_normal(BATCH), dtype)
    qpb = dataclasses.replace(qpb, b=qpb.b * scales[:, None, None])
    # mu_tol=0 runs every instance to its floor: same per-iteration work as
    # the reference's 8-iteration run, counted via mean_kk below.
    # use_pallas routes solve_batched to the flat-state batch-level engine
    # (models/ipm_fast.py): lanes-form Pallas Riccati/residual kernels plus
    # tile-friendly (batch, flat) loop state — ~30x over the vmapped XLA path
    # mu_switch=0 pins the LEGACY no-residual semantics (d_ip2_hard) the
    # work-normalized headline has always measured: every iteration is a
    # phase-1 iteration to the f32 barrier floor.  Under that contract the
    # library dispatch (select_engine) picks the 4th-generation resident
    # engine by construction — the headline row measures the SHIPPED
    # default, and the engine actually dispatched is stamped below.
    cfg = ipm.IPMConfig(
        k_max=K_MAX, mu_tol=0.0, alpha_min=1e-8, mu_switch=0.0,
        use_pallas=jax.default_backend() == "tpu",
    )
    engine = pbatch.select_engine(dims, cfg, BATCH, dtype)

    @jax.jit
    def run(q, K, seed):
        """K solves (runtime trip count) + the mean iteration count of the
        last batch — one compiled program serves warmup, probe and timing."""

        def body(i, carry):
            acc, _ = carry
            qi = dataclasses.replace(
                q, b=q.b * (1.0 + 1e-4 * (i.astype(dtype) + seed))
            )
            sol = pbatch.solve_batched(dims, qi, cfg)
            # u_0 controls: the output an MPC deployment ships off-chip
            u0 = sol.z[:, 0, : dims.NU]
            chk = jnp.sum(sol.z) + jnp.sum(u0) + jnp.sum(sol.kk)
            return acc + chk, jnp.mean(sol.kk.astype(jnp.float32))

        return lax.fori_loop(
            0, K, body,
            (jnp.asarray(0.0, dtype), jnp.asarray(0.0, jnp.float32)),
        )

    # compile + warmup + iteration-count probe in one dispatch
    acc, mean_kk = run(qpb, 1, jnp.asarray(0.0, dtype))
    acc, mean_kk = float(acc), float(mean_kk)
    assert np.isfinite(acc), "non-finite checksum"
    assert mean_kk > 3.0, f"suspicious iteration count {mean_kk}"

    times = {}
    for K in (2, 10):
        reps = 4
        rep_times = []
        for r in range(1, reps + 1):
            # float() forces completion — on this harness's relay,
            # block_until_ready returns before execution finishes; the
            # per-rep seed defeats the relay's dispatch memoization
            t0 = time.perf_counter()
            out = float(run(qpb, K, jnp.asarray(r * 37.0 + K, dtype))[0])
            rep_times.append(time.perf_counter() - t0)
            assert np.isfinite(out)
        # relay dispatch noise is strictly additive, so the MIN over reps
        # is the tightest estimate of true device time (mean-of-reps swung
        # 268k-343k solves/s run to run; min stabilizes it)
        times[K] = min(rep_times)

    per_solve_s = (times[10] - times[2]) / (10 - 2)
    solves_per_s = (BATCH * mean_kk / K_MAX) / per_solve_s
    payload = {
        "metric": "ipm_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": (
            f"equivalent 8-iteration solves/s (mass-spring nx=8 nu=3 N=30 "
            f"nb=7 ngN=8, batch={BATCH}, f32, mean_iters={mean_kk:.2f}, "
            f"slope K=2..10 in-graph, {per_solve_s*1e3:.3f} ms/batch, "
            f"engine={engine} [library default dispatch])"
        ),
        "vs_baseline": round(solves_per_s / _BASELINE, 2),
    }
    _result.update(payload)
    with open(_LAST, "w") as f:
        json.dump(payload, f)
    _emit(payload)

    # ---- second line: TRUE solves/s at reference tolerance --------------
    # The headline above is work-normalized at the f32 barrier floor
    # (mu ~ 1e-4).  This measurement runs the reference's own accuracy
    # protocol: all 8 IPM iterations (doc/guide.tex:362-380 converges in 8
    # at mu_tol=1e-8) with ITER_REF=1 iterative refinement
    # (d_ip2_res_hard.c:48) on the lanes engine — proven to reach <=1e-6
    # control parity with the f64 solver at MATCHED iteration count
    # (one correction pass restores the full parity; a second changes the
    # error by <3% while doubling the refinement kernel cost — measured)
    # (tests/test_stage_kernel.py::test_flat_ipm_iter_ref_reaches_f64_parity).
    # No work normalization: value = batches * BATCH / elapsed.
    try:
        _parity_measurement(jax, jnp, lax, ipm, pbatch, dims, qpb, dtype,
                            BATCH, K_MAX)
    except Exception as e:  # line 1 is already out; salvage what we can
        if os.path.exists(_LAST_PAR):
            par = json.load(open(_LAST_PAR))
            par["unit"] += f" [fallback: this parity run failed: {e!r:.80}]"
            print(json.dumps(par), flush=True)
    _done.set()


def _parity_measurement(jax, jnp, lax, ipm, pbatch, dims, qpb, dtype,
                        BATCH, K_MAX):
    cfg_par = ipm.IPMConfig(
        k_max=K_MAX, mu_tol=0.0, alpha_min=1e-8, iter_ref=1,
        # mu-gated refinement: correction re-solves only run once some
        # instance's mu drops below 1e-3 (conditioning ~1/mu) — the
        # resident stage-1 engine carries the trajectory unrefined to
        # 1e-3 (f32 direction error ~ eps/mu ~ 1e-4 relative there);
        # final control parity <=1e-6 is test-proven at this threshold
        # (tests/test_stage_kernel.py::test_flat_ipm_iter_ref_reaches_f64_parity)
        iter_ref_mu_thr=1e-3,
        use_pallas=jax.default_backend() == "tpu",
    )
    engine_p = pbatch.select_engine(dims, cfg_par, BATCH, dtype)

    @jax.jit
    def run_par(q, K, seed):
        def body(i, acc):
            qi = dataclasses.replace(
                q, b=q.b * (1.0 + 1e-4 * (i.astype(dtype) + seed))
            )
            sol = pbatch.solve_batched(dims, qi, cfg_par)
            u0 = sol.z[:, 0, : dims.NU]
            return acc + jnp.sum(sol.z) + jnp.sum(u0)

        return lax.fori_loop(0, K, body, jnp.asarray(0.0, dtype))

    acc_p = float(run_par(qpb, 1, jnp.asarray(0.0, dtype)))
    assert np.isfinite(acc_p), "non-finite parity checksum"

    times_p = {}
    for K in (2, 10):
        rep_times = []
        for r in range(1, 5):
            t0 = time.perf_counter()
            out = float(run_par(qpb, K, jnp.asarray(r * 53.0 + K, dtype)))
            rep_times.append(time.perf_counter() - t0)
            assert np.isfinite(out)
        times_p[K] = min(rep_times)

    per_solve_p = (times_p[10] - times_p[2]) / (10 - 2)
    solves_p = BATCH / per_solve_p
    payload_p = {
        "metric": "ipm_solves_per_s_per_chip_at_parity",
        "value": round(solves_p, 1),
        "unit": (
            f"true 8-iteration solves/s at reference tolerance (two-stage:"
            f" fast stage-1 engine to mu<=1e-3, then lanes + iter_ref=1 via"
            f" hot continuation; <=1e-6 control parity with f64 at matched"
            f" iterations; mass-spring nx=8 nu=3 N=30 nb=7 ngN=8, "
            f"batch={BATCH}, slope K=2..10 in-graph, "
            f"{per_solve_p*1e3:.3f} ms/batch, engine={engine_p} "
            f"[library default dispatch])"
        ),
        "vs_baseline": round(solves_p / _BASELINE, 2),
    }
    with open(_LAST_PAR, "w") as f:
        json.dump(payload_p, f)
    print(json.dumps(payload_p), flush=True)


if __name__ == "__main__":
    main()
