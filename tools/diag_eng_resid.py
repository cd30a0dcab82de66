"""TRUE-residual diagnosis of the engine routes at a given (nx, nu).

Round-3's size sweep reported on-chip f32 ``inf_norm_res`` blowups at
(16, 3): flat rq 176 / mega rq 12977 vs XLA 0.385, with traj parity
dz=1.4e-2.  Hypotheses: (a) real per-instance divergence inside the
engine kernels, (b) f32 residual-EVALUATION noise at an iterate with
large duals (cancellation scales with |lam|, not with backward error).

This tool decides: it solves the same randomized batch on every route,
recomputes each returned iterate's residuals in f64 numpy on the host
(utils/resid64 — evaluation noise-free), and prints per-route absolute
AND backward-error-relative residuals plus the worst instances.  If the
relative backward errors agree across routes, the iterates are equally
converged and the blowup is measurement noise; if the engine's relative
residual is genuinely orders worse on some instances, those instances
identify the kernel bug.

Usage: python tools/diag_eng_resid.py [nx nu [engines...]]
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from hpmpc_tpu.models import ipm
    from hpmpc_tpu.parallel import batch as pbatch
    from hpmpc_tpu.utils.mass_spring import mass_spring_qp
    from hpmpc_tpu.utils.resid64 import true_residuals_sol

    nx, nu = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (16, 3)
    engines = tuple(sys.argv[3:]) or ("xla", "flat", "mega")
    B = 1024
    dt = jnp.float32
    dims, qp = mass_spring_qp(nx, nu, 30, dtype=dt)
    qpb = pbatch.broadcast_qp(qp, B)
    rng = np.random.default_rng(0)
    qpb = dataclasses.replace(
        qpb,
        b=qpb.b * jnp.asarray(
            1 + 0.02 * rng.standard_normal(B), dt)[:, None, None],
    )
    cfg_x = ipm.IPMConfig(k_max=8, mu_tol=0.0, alpha_min=1e-8)
    cfg_p = dataclasses.replace(cfg_x, use_pallas=True)

    out = {}
    rels = {}
    for eng in engines:
        os.environ["HPMPC_LANES_LOOP"] = "1" if eng == "mega" else "0"
        os.environ["HPMPC_MEGA_SWEEPS"] = "1" if eng == "mega" else "0"
        cfg = cfg_x if eng == "xla" else cfg_p
        sol = jax.jit(lambda q, c=cfg: pbatch.solve_batched(dims, q, c))(qpb)
        sol = jax.tree.map(np.asarray, sol)
        res, rel = true_residuals_sol(qpb, sol)
        chip = np.asarray(sol.inf_norm_res, np.float64)
        rels[eng] = (res, rel, sol)
        worst = np.argsort(-rel[:, 0])[:5]
        out[eng] = {
            "chip_res_max": [float(v) for v in chip.max(axis=0)],
            "true_res_max": [float(v) for v in res.max(axis=0)],
            "rel_backward_err_max": [float(v) for v in rel.max(axis=0)],
            "rel_rq_p50": float(np.median(rel[:, 0])),
            "rel_rq_p99": float(np.quantile(rel[:, 0], 0.99)),
            "worst_instances": [int(i) for i in worst],
            "worst_rel_rq": [float(rel[i, 0]) for i in worst],
            "kk_hist": np.bincount(
                np.asarray(sol.kk).astype(int), minlength=9).tolist(),
        }
        print(json.dumps({eng: out[eng]}), flush=True)

    if "xla" in rels:
        rx = rels["xla"][1]
        for eng in engines:
            if eng == "xla":
                continue
            re_ = rels[eng][1]
            ratio = re_[:, 0] / np.maximum(rx[:, 0], 1e-16)
            print(json.dumps({
                f"{eng}_vs_xla_rel_rq_ratio": {
                    "p50": float(np.median(ratio)),
                    "p99": float(np.quantile(ratio, 0.99)),
                    "max": float(ratio.max()),
                    "argmax": int(np.argmax(ratio)),
                }}), flush=True)
            # dz on the worst-ratio instance
            i = int(np.argmax(ratio))
            zx = np.asarray(rels["xla"][2].z[i], np.float64)
            ze = np.asarray(rels[eng][2].z[i], np.float64)
            sx, se = rels["xla"][2], rels[eng][2]
            print(json.dumps({
                f"{eng}_worst_instance_detail": {
                    "i": i,
                    "dz": float(np.abs(zx - ze).max()),
                    "kk_xla": int(sx.kk[i]),
                    "kk_eng": int(se.kk[i]),
                    "rel_rq_xla": float(rx[i, 0]),
                    "rel_rq_eng": float(re_[i, 0]),
                    "abs_rq_xla": float(rels["xla"][0][i, 0]),
                    "abs_rq_eng": float(rels[eng][0][i, 0]),
                    "lam_b_max_xla": float(np.abs(sx.lam_b[i]).max()),
                    "lam_b_max_eng": float(np.abs(se.lam_b[i]).max()),
                    "lam_g_max_xla": float(np.abs(sx.lam_g[i]).max()),
                    "lam_g_max_eng": float(np.abs(se.lam_g[i]).max()),
                    "t_b_min_xla": float(np.abs(sx.t_b[i]).min()),
                    "t_b_min_eng": float(np.abs(se.t_b[i]).min()),
                    "t_g_min_xla": float(np.abs(sx.t_g[i]).min()),
                    "t_g_min_eng": float(np.abs(se.t_g[i]).min()),
                    "status_xla": int(sx.status[i]),
                    "status_eng": int(se.status[i]),
                    # stat rows: [sigma, alpha_aff, mu_aff, alpha, mu]
                    "stat_xla": np.asarray(
                        sx.stat[i], np.float64).round(8).tolist(),
                    "stat_eng": np.asarray(
                        se.stat[i], np.float64).round(8).tolist(),
                }}), flush=True)


if __name__ == "__main__":
    main()
