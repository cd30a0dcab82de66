"""Solver-level problem-size sweep on real TPU: solves/s per engine per
(nx, nu), with TRUE-residual parity verdicts.

The reference's canonical benchmark protocol sweeps problem size
(``test_problems/test_d_ric_mpc.c:283-284``, n = 4...300; design envelope
nx <= ~300, ``doc/guide.tex:27``) — this is the solver-level TPU
equivalent.  For each size it measures the structured vmapped-XLA route
and the Pallas engine generations (flat / mega in the per-scalar band;
the blocked batched Riccati in the medium/large band) on the mass-spring
problem at N=30, and judges each engine's returned iterate with the f64
HOST oracle (``utils/resid64``): backward-error-relative residuals are
evaluation-noise-free and conditioning-independent, so "the engines must
be equally converged" is an assertable statement even where on-chip f32
``inf_norm_res`` is dominated by cancellation (round-3's nx=16 nu=3
"blowup" was exactly that).

Anchor protocol (ADVICE r3): the f32 XLA route anchors each size; if its
own relative residuals show divergence (measured at nx>=96: the f32 D&C
Cholesky loses SPD on some instances) — or for every row of the large
band — a TRUSTED anchor is recomputed for a sub-batch by a SUBPROCESS
running the structured solver in f64 on CPU (``tools/_cpu_f64_anchor.py``)
and the engine is judged against that.

Measurement floor: the K-slope span escalates (2,6) -> (6,22) -> (22,86)
until the timing delta clears 40 ms, so sub-millisecond batches (the
round-3 "475x" artifact at nx=16 nu=1) are timed over enough work.

Engines that fail to compile or exceed VMEM at a size are reported as
failed rows — that boundary IS the dispatch rule's data
(``parallel/batch.py`` engine-selection notes).

Prints one JSON line per (size, engine): solves/s, parity verdicts,
ms/batch.  Rows never abort the sweep; ``parity_ok`` carries the verdict.
"""

import dataclasses
import json
import os
import subprocess
import sys
import tempfile
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# (nx, nu, batch): batch shrinks at large nx to keep the (B, N+1, NZ, NZ)
# factor stack + inputs inside HBM (nx=256: 2 x 2.6 GB at B=256)
# (nx, nu, batch[, N]): batch and horizon shrink at large nx (HBM and
# remote-compile-helper limits; the reference's own sweep protocol uses
# N=10, test_d_ric_mpc.c:330)
SIZES = ((8, 3, 1024, 30), (16, 1, 1024, 30), (16, 3, 1024, 30),
         (24, 3, 1024, 30), (32, 4, 1024, 30), (48, 6, 1024, 30),
         (64, 8, 1024, 30), (96, 12, 1024, 30), (128, 16, 512, 30),
         (192, 24, 256, 10), (256, 32, 256, 10))
ENGINES = ("xla", "flat", "mega")
# Past the per-scalar engines' VMEM envelope (engine_fits False) the
# pallas dispatch rides the blocked batched Riccati instead
# (models/riccati_blocked + ops/batch_chol) — measured as its own row.
ENGINES_LARGE = ("xla", "blocked")

K_ITERS = 8
# anchor health: max backward-error-relative stationarity residual the
# f32 anchor may show before it is considered diverged at that size
REL_ANCHOR_HEALTHY = 1e-3
# engine gates vs a healthy f32 anchor (batch-max, f64-oracle relative)
GATE_RATIO = 10.0
GATE_RQ_FLOOR = 1e-4
GATE_RB_FLOOR = 1e-5

# optional CLI: nx,nu[,B[,N]] tuples, e.g. `bench_size_sweep.py 32,4`
if len(sys.argv) > 1:
    _parsed = []
    for a in sys.argv[1:]:
        parts = [int(v) for v in a.split(",")]
        parts += [1024, 30][len(parts) - 2:]
        _parsed.append(tuple(parts[:4]))
    SIZES = tuple(_parsed)


def _f64_anchor(dims, qp_np, b_batched, idx, k_max, mu_tol=0.0):
    """Run the CPU-f64 subprocess anchor on sub-batch ``idx``; returns the
    loaded npz dict or None on failure.  ``qp_np``: UNBATCHED stage data;
    ``b_batched``: the (B, N, NX) per-instance dynamics offsets."""
    with tempfile.TemporaryDirectory() as td:
        fin = os.path.join(td, "in.npz")
        fout = os.path.join(td, "out.npz")
        payload = {f"qp_{k}": v for k, v in qp_np.items()}
        payload["b_batched"] = np.asarray(b_batched)[idx]
        payload.update(
            N=dims.N, nx=dims.NX, nu=dims.NU,
            nb=np.asarray(dims.nb), ng=np.asarray(dims.ng),
            k_max=k_max, mu_tol=mu_tol, alpha_min=1e-8,
        )
        np.savez(fin, **payload)
        helper = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "_cpu_f64_anchor.py")
        try:
            subprocess.run([sys.executable, helper, fin, fout],
                           check=True, timeout=1800,
                           capture_output=True)
            d = np.load(fout)
            return {k: d[k] for k in d.files}
        except Exception as e:  # noqa: BLE001 — report, don't abort
            print(json.dumps({"f64_anchor_error": str(e)[:200]}),
                  file=sys.stderr, flush=True)
            return None


def _converged_parity(row, dims, qp_np, qpb, qp_light, cfg, jax, jnp,
                      pbatch, true_residuals_sol, conv_cache):
    """Converged-endpoint parity for sizes where the fixed K_ITERS
    budget leaves every route mid-path: run THIS engine (env already
    pinned) at k_max=30 to mu_tol=1e-3 (safely above the f32 duality
    floor ~1e-4, so stalls can't masquerade as failures) on the
    full batch, the f64 CPU anchor at the SAME tolerance on a
    sub-batch, and compare solutions where both converged — matched
    stopping rule, endpoint-to-endpoint.

    Verdict: >=90% of engine instances converge; the engine's relative
    backward error at its endpoints is f32-clean (p99 <= 1e-4); the
    converged endpoints agree with f64's to 2e-2 relative (both stop at
    the FIRST iterate under 1e-3, so endpoints differ by up to one
    near-convergence step)."""
    import dataclasses as _dc

    ok, why = True, []
    cfgc = _dc.replace(cfg, k_max=30, mu_tol=1e-3)
    solc = jax.jit(
        lambda q: pbatch.solve_batched(dims, q, cfgc))(qpb)
    solc = jax.tree.map(np.asarray, solc)
    resc, relc = true_residuals_sol(qp_light, solc)
    B = qpb.b.shape[0]
    conv = np.asarray(solc.status) == 0
    row["conv_frac_eng"] = float(conv.mean())
    row["conv_rel_rq_p99"] = float(np.quantile(relc[:, 0], 0.99))

    # f32 BASELINE for "how convergent can f32 be here": the framework's
    # own structured XLA route at the same stopping rule (measured at
    # (16,1): only ~65% of instances reach mu 1e-3 in 30 iterations in
    # ANY f32 route, while f64 reaches ~92% — an absolute conv gate
    # would condemn correct engines for the dtype's floor)
    if "xla_conv" not in conv_cache:
        cfgx = _dc.replace(cfgc, use_pallas=False)
        solx = jax.jit(
            lambda q: pbatch.solve_batched(dims, q, cfgx))(qpb)
        solx = jax.tree.map(np.asarray, solx)
        _, relx = true_residuals_sol(qp_light, solx)
        conv_cache["xla_conv"] = (
            float((np.asarray(solx.status) == 0).mean()),
            float(np.quantile(relx[:, 0], 0.99)),
        )
    xla_cf, xla_p99 = conv_cache["xla_conv"]
    row["conv_frac_xla"] = xla_cf
    row["conv_rel_rq_p99_xla"] = xla_p99
    if conv.mean() < xla_cf - 0.05:
        ok, why = False, why + ["converges less than the f32 xla route"]
    if row["conv_rel_rq_p99"] > max(3.0 * xla_p99, 1e-4):
        ok, why = False, why + ["rel rq p99 above 3x the f32 xla route"]

    # f64 anchor sub-batch (round 5 fix): conv_frac_f64_sub was
    # previously estimated from 12 instances, 4 of them BIASED to the
    # engine's worst residuals — at (16,1) that read 91.7% where the
    # honest f64 fraction is ~67% (measured CPU full-comparison: the
    # "missing" instances diverge in f64 TOO — duals blow up; one
    # actuator + perturbed b + tight bounds make them infeasible-like).
    # Now: 64 unbiased instances estimate the f64 conv fraction and the
    # divergent fraction; the worst-4 stay in the anchor run for the
    # endpoint-parity check only.
    unb = np.linspace(0, B - 1, 64, dtype=int)
    worst = np.argsort(-relc[:, 0])[:4]
    sub = np.unique(np.concatenate([worst, unb]))
    unb_mask = np.isin(sub, unb)
    f64 = _f64_anchor(dims, qp_np, qpb.b, sub, 30, mu_tol=1e-3)
    if f64 is not None:
        st64 = np.asarray(f64["status"])
        mu64 = np.asarray(f64["inf_norm_res"])[:, 3]
        conv64_all = st64 == 0
        conv64 = conv64_all[unb_mask]
        row["conv_frac_f64_sub"] = float(conv64.mean())
        row["divergent_frac_f64"] = float(
            ((st64 != 0) & (mu64 > 1e-1))[unb_mask].mean())
        both = conv[sub] & conv64_all
        if both.any():
            z64 = f64["z"][both]
            ze = np.asarray(solc.z, np.float64)[sub][both]
            dz = float(np.abs(ze - z64).max()
                       / max(np.abs(z64).max(), 1.0))
            row["dz_conv_vs_f64_rel"] = dz
            if dz > 2e-2:
                ok, why = False, why + ["converged endpoint vs f64"]
        elif not conv64.any():
            # even f64 needs more than 30 iterations at this size
            # (measured nx=96 N=30: conv_frac_f64 = 0) — endpoint
            # comparison is undefined for every dtype; the verdict
            # rests on the conv-frac-vs-xla and backward-error-vs-xla
            # gates above, which are dtype-fair
            row["conv_check"] = ("no route converges at k_max=30; "
                                 "judged on backward error vs the f32 "
                                 "xla route")
        else:
            ok, why = False, why + ["f64 converges where engine doesn't"]

    # f32-floor escalation (round 5, IPMConfig.escalate_stalled): the
    # converged-deployment answer to the dtype gap — stalled instances
    # re-solved once in mixed precision (f64 state + f32 kernels) and
    # merged.  Gate: escalated conv within 3 points of the (unbiased)
    # f64 anchor fraction.  Only measured inside the flat engine's size
    # envelope (beyond it the f64 re-solve would take the emulated-f64
    # structured path — not a mode anyone ships).
    from hpmpc_tpu.ops import stage_kernel as _sk

    if _sk.engine_fits(int(dims.NX), int(dims.NU)):
        cfge = _dc.replace(cfgc, escalate_stalled=True)
        sole = jax.jit(
            lambda q: pbatch.solve_batched(dims, q, cfge))(qpb)
        conv_esc = np.asarray(jax.device_get(sole.status)) == 0
        row["conv_frac_eng_esc"] = float(conv_esc.mean())
        if conv_esc.mean() < conv.mean() - 1e-9:
            ok, why = False, why + ["escalation reduced convergence"]
        if f64 is not None:
            # PAIRED comparison on the anchor's unbiased instances —
            # the 64-sample f64 fraction alone carries ~6-point binomial
            # noise (measured: anchor 78.1% where the full-batch f64
            # fraction is ~67%), which a full-batch-vs-subsample gate
            # would misread as an escalation shortfall
            esc_sub = conv_esc[sub][unb_mask]
            row["conv_esc_vs_f64_paired"] = float(
                (esc_sub == conv64).mean())
            if (esc_sub < conv64).mean() > 0.03:
                ok, why = False, why + [
                    "escalated conv loses >3% of f64-converged "
                    "instances (paired)"]
    return ok, why


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
    from hpmpc_tpu.utils.resid64 import true_residuals_sol

    dt = jnp.float32
    failures = []

    for nx, nu, B, NH in SIZES:
        dims, qp = mass_spring_qp(nx, nu, NH, dtype=dt)
        qpb = pbatch.broadcast_qp(qp, B)
        rng = np.random.default_rng(0)
        qpb = dataclasses.replace(
            qpb,
            b=qpb.b * jnp.asarray(
                1 + 0.02 * rng.standard_normal(B), dt
            )[:, None, None],
        )
        # UNBATCHED stage data for the host oracle / f64 anchor (the batch
        # differs only in b — keeps f64 host copies at large NZ small)
        qp_np = {f.name: np.asarray(getattr(qp, f.name))
                 for f in dataclasses.fields(qp)}
        qp_light = dataclasses.replace(qp, b=qpb.b)
        cfg_x = ipm.IPMConfig(k_max=K_ITERS, mu_tol=0.0, alpha_min=1e-8)
        cfg_p = dataclasses.replace(cfg_x, use_pallas=True)

        def make_run(cfg):
            # runtime trip count (bench.py's trick): ONE compiled module
            # serves every K — at nx>=32 the unrolled per-scalar kernels
            # push the module near the compile relay's 10 MB payload cap,
            # so the timing graph must not grow with K.  The QP is an
            # ARGUMENT (closing over it embeds the per-instance b as a
            # module constant — 8 MB at nx=64 alone breaches the relay
            # cap: HTTP 413).
            @jax.jit
            def run(q0, K, seed):
                def body(i, acc):
                    q = dataclasses.replace(
                        q0,
                        b=q0.b * (1.0 + 1e-5 * (i.astype(dt) + seed)
                                  + 1e-30 * acc),
                    )
                    sol = pbatch.solve_batched(dims, q, cfg)
                    return acc + jnp.sum(sol.z) + jnp.sum(
                        sol.kk.astype(dt))

                return lax.fori_loop(0, K, body, jnp.asarray(0.0, dt))

            return run

        def slope(cfg, row):
            """min-over-reps K-slope with floor escalation: widen the K
            span until the timing delta clears 40 ms of device work."""
            f = make_run(cfg)
            float(f(qpb, 2, jnp.asarray(0.0, dt)))  # compile + warm
            for K_lo, K_hi in ((2, 6), (6, 22), (22, 86)):
                ts = {}
                for K in (K_lo, K_hi):
                    rts = []
                    for r in range(1, 3):
                        t0 = time.perf_counter()
                        float(f(qpb, K, jnp.asarray(r * 31.0 + K, dt)))
                        rts.append(time.perf_counter() - t0)
                    ts[K] = min(rts)
                dt_span = ts[K_hi] - ts[K_lo]
                row["k_span"] = [K_lo, K_hi]
                if dt_span >= 0.04:
                    row["floor_cleared"] = True
                    return max(dt_span / (K_hi - K_lo), 1e-9)
            row["floor_cleared"] = False  # even 64 extra solves < 40 ms
            return max(dt_span / (K_hi - K_lo), 1e-9)

        def one_solve(cfg):
            return jax.jit(
                lambda q: pbatch.solve_batched(dims, q, cfg)
            )(qpb)

        from hpmpc_tpu.ops import stage_kernel as _sk

        large_band = not _sk.engine_fits(nx, nu)
        engines = ENGINES_LARGE if large_band else ENGINES
        anchor = None          # (sol, res, rel) of the f32 XLA route
        conv_cache = {}        # per-size converged-run anchors
        anchor_f64 = None      # cached f64 sub-batch anchor
        f64_idx = None
        t_x = None
        for engine in engines:
            os.environ["HPMPC_RESIDENT"] = "0"
            os.environ["HPMPC_LANES_LOOP"] = (
                "1" if engine == "mega" else "0")
            os.environ["HPMPC_MEGA_SWEEPS"] = (
                "1" if engine == "mega" else "0")
            cfg = cfg_x if engine == "xla" else cfg_p
            row = {
                "metric": f"size_sweep_nx{nx}_nu{nu}_{engine}",
                "unit": (f"8-iteration solves/s (mass-spring nx={nx} "
                         f"nu={nu} N={NH}, batch={B}, f32)"),
            }
            if engine != "xla":
                row["dispatch_engine"] = pbatch.select_engine(
                    dims, cfg, B, dt)
            try:
                t0 = time.time()
                sol = one_solve(cfg)
                sol = jax.tree.map(np.asarray, sol)
                row["compile_s"] = round(time.time() - t0, 1)
                assert np.isfinite(sol.z).all(), "non-finite solution"
                res, rel = true_residuals_sol(qp_light, sol)
                row["true_res_max"] = [float(v) for v in res.max(axis=0)]
                row["rel_rq_max"] = float(rel[:, 0].max())
                row["rel_rq_p50"] = float(np.median(rel[:, 0]))
                row["rel_rb_max"] = float(rel[:, 1].max())

                if engine == "xla":
                    healthy = bool(rel[:, 0].max() < REL_ANCHOR_HEALTHY)
                    anchor = (sol, res, rel, healthy)
                    row["anchor_healthy"] = healthy
                else:
                    ok = True
                    why = []
                    if anchor is not None:
                        sx, rx_abs, rx, healthy = anchor
                        kk_match = float(np.mean(sol.kk == sx.kk))
                        dz = float(np.max(np.abs(
                            np.asarray(sol.z, np.float64)
                            - np.asarray(sx.z, np.float64))))
                        row["parity_max_dz"] = dz
                        row["parity_kk_match"] = round(kk_match, 4)
                        ratio = rel[:, 0] / np.maximum(rx[:, 0], 1e-16)
                        row["rel_rq_ratio_p50"] = float(np.median(ratio))
                        row["rel_rq_ratio_max"] = float(ratio.max())
                    if anchor is not None and anchor[3]:
                        rx = anchor[2]
                        if kk_match < 0.9:
                            ok, why = False, why + ["kk_match<0.9"]
                        if row["rel_rq_ratio_p50"] > 3.0:
                            ok, why = False, why + ["median rq ratio>3"]
                        if rel[:, 0].max() > max(
                                GATE_RATIO * rx[:, 0].max(),
                                GATE_RQ_FLOOR):
                            ok, why = False, why + ["rq above gate"]
                        if rel[:, 1].max() > max(
                                GATE_RATIO * rx[:, 1].max(),
                                GATE_RB_FLOOR):
                            ok, why = False, why + ["rb above gate"]
                    else:
                        # anchor diverged or absent: judge against the
                        # f64 CPU subprocess anchor on a sub-batch
                        row["anchor_diverged"] = True
                        mid_path = bool(res[:, 3].max() > 1e-2)
                        row["mid_path_at_K"] = mid_path
                        if mid_path:
                            # At K_ITERS no route has CONVERGED at this
                            # size (mu still large, e.g. 6.6 at nx=96)
                            # — mid-path trajectory comparisons across
                            # dtypes are chaotic (tiny rounding flips
                            # alphas and the paths separate), so the
                            # correctness statement is a SEPARATE
                            # converged solve: engine at k_max=30 to
                            # mu_tol=1e-6 vs the f64 anchor on a
                            # sub-batch — endpoint solutions, not paths.
                            ok, why = _converged_parity(
                                row, dims, qp_np, qpb, qp_light, cfg,
                                jax, jnp, pbatch, true_residuals_sol,
                                conv_cache)
                        elif anchor_f64 is None and f64_idx is None:
                            worst = np.argsort(-rel[:, 0])[:8]
                            spread = np.linspace(
                                0, B - 1, 8, dtype=int)
                            f64_idx = np.unique(
                                np.concatenate([worst, spread]))
                            anchor_f64 = _f64_anchor(
                                dims, qp_np, qpb.b, f64_idx, K_ITERS)
                        if not mid_path and anchor_f64 is not None:
                            z64 = anchor_f64["z"]
                            ze = np.asarray(
                                sol.z, np.float64)[f64_idx]
                            zscale = max(np.abs(z64).max(), 1.0)
                            dz64 = float(
                                np.abs(ze - z64).max() / zscale)
                            row["dz_vs_f64_rel"] = dz64
                            row["kk_match_f64"] = float(np.mean(
                                sol.kk[f64_idx] == anchor_f64["kk"]))
                            if dz64 > 5e-2:
                                ok, why = False, why + [
                                    "traj vs f64 anchor"]
                            # Residual verdicts relative to the f64
                            # anchor.  Stationarity is judged by the
                            # STALL FRACTION, not the batch max: at the
                            # f32 floor a <=2% tail of instances stalls
                            # with large duals (phase-1 conditioning has
                            # outrun f32 — the same happens to the f32
                            # XLA route; see step_ok) while their
                            # CONTROLS stay within the trajectory gate
                            # above — f64_idx includes exactly the
                            # worst-rel instances, so dz_vs_f64 covers
                            # them.  Dynamics feasibility (rb) has no
                            # such excuse and is gated vs f64's own.
                            r64 = anchor_f64["inf_norm_res"]
                            row["f64_res_max"] = [
                                float(v) for v in r64.max(axis=0)]
                            stall = float(np.mean(rel[:, 0] > 1e-2))
                            row["floor_stall_frac"] = stall
                            if stall > 0.02:
                                ok, why = False, why + [
                                    "floor-stall frac > 2%"]
                            sub = res[f64_idx]
                            if sub[:, 1].max() > max(
                                    10.0 * r64[:, 1].max(), 1e-4):
                                ok, why = False, why + [
                                    "rb vs f64 anchor"]
                        elif not mid_path:
                            # no trusted anchor at all: fall back to the
                            # absolute backward-error floors
                            if rel[:, 0].max() > GATE_RQ_FLOOR:
                                ok, why = False, why + ["rq above floor"]
                            if rel[:, 1].max() > GATE_RB_FLOOR:
                                ok, why = False, why + ["rb above floor"]
                    row["parity_ok"] = ok
                    if not ok:
                        row["parity_why"] = why
                        failures.append(row["metric"])

                t = slope(cfg, row)
                if engine == "xla":
                    t_x = t
                row["value"] = round(B / t, 1)
                row["ms_per_batch"] = round(t * 1e3, 3)
                row["vs_baseline"] = round(t_x / t, 2) if t_x else 0.0
            except Exception as e:  # report the boundary, keep sweeping
                row["value"] = 0.0
                row["vs_baseline"] = 0.0
                row["error"] = f"{type(e).__name__}: {e}"[:300]
                traceback.print_exc(file=sys.stderr)
                failures.append(row["metric"])
            print(json.dumps(row), flush=True)

    print(json.dumps({"metric": "size_sweep_summary",
                      "failures": failures,
                      "ok": not failures}), flush=True)


if __name__ == "__main__":
    main()
