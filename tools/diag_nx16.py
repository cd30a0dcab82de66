"""Diagnose the size-sweep parity failure at nx=16, nu=1 (BASELINE config).

The sweep (tools/bench_size_sweep.py) compares raw iterates z between the
structured XLA route and the flat Pallas engine; at nx=16 nu=1 (a weakly
actuated mass-spring chain: 8 masses, 1 force) it reported
dz=6.8e-2 / kk_match=0.967.  Two hypotheses:

  (a) kernel bug at NZ=17 (sublane crossing),
  (b) f32 conditioning: both engines converge to valid solutions but
      rounding differences flip iteration counts / active sets on
      marginal instances, so raw-iterate comparison is the wrong metric.

The decisive evidence is per-instance KKT residuals (inf_norm_res): if the
flat engine's residuals match the XLA route's on every instance (including
the kk-mismatched ones), the kernels are correct and the sweep needs a
residual-based parity check instead of raw dz.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("HPMPC_LANES_LOOP", "0")
os.environ.setdefault("HPMPC_MEGA_SWEEPS", "0")


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

    B = 1024
    nx, nu = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (16, 1)
    dt = jnp.float32
    dims, qp = mass_spring_qp(nx, nu, 30, dtype=dt)
    qpb = pbatch.broadcast_qp(qp, B)
    rng = np.random.default_rng(0)
    qpb = dataclasses.replace(
        qpb,
        b=qpb.b * jnp.asarray(1 + 0.02 * rng.standard_normal(B), dt)[:, None, None],
    )
    cfg_x = ipm.IPMConfig(k_max=8, mu_tol=0.0, alpha_min=1e-8)
    cfg_p = dataclasses.replace(cfg_x, use_pallas=True)

    sols = {}
    for name, cfg in (("xla", cfg_x), ("flat", cfg_p)):
        sol = jax.jit(lambda q, c=cfg: pbatch.solve_batched(dims, q, c))(qpb)
        sols[name] = jax.tree.map(lambda a: np.asarray(a, np.float64), sol)
        print(f"{name}: done", flush=True)

    zx, zf = sols["xla"].z, sols["flat"].z
    kx, kf = sols["xla"].kk, sols["flat"].kk
    rx, rf = sols["xla"].inf_norm_res, sols["flat"].inf_norm_res  # (B, 4)
    dz = np.abs(zx - zf).reshape(B, -1).max(axis=1)
    match = kx == kf
    out = {
        "kk_match_frac": float(np.mean(match)),
        "dz_max_all": float(dz.max()),
        "dz_max_kk_matched": float(dz[match].max()) if match.any() else None,
        "dz_max_kk_mismatched": float(dz[~match].max()) if (~match).any() else None,
        "z_scale": float(np.abs(zx).max()),
        "kk_hist_xla": np.bincount(kx.astype(int), minlength=9).tolist(),
        "kk_hist_flat": np.bincount(kf.astype(int), minlength=9).tolist(),
    }
    # Residual comparison: each column {|rq|inf, |rb|inf, |rd|inf, mu}
    names = ["rq", "rb", "rd", "mu"]
    for j, nm in enumerate(names):
        out[f"{nm}_xla_max"] = float(rx[:, j].max())
        out[f"{nm}_flat_max"] = float(rf[:, j].max())
        out[f"{nm}_xla_max_on_mismatch"] = (
            float(rx[~match, j].max()) if (~match).any() else None)
        out[f"{nm}_flat_max_on_mismatch"] = (
            float(rf[~match, j].max()) if (~match).any() else None)
    # worst-dz instance detail
    i = int(dz.argmax())
    out["worst"] = {
        "i": i, "dz": float(dz[i]), "kk_xla": int(kx[i]), "kk_flat": int(kf[i]),
        "res_xla": rx[i].tolist(), "res_flat": rf[i].tolist(),
        "status_xla": int(sols["xla"].status[i]),
        "status_flat": int(sols["flat"].status[i]),
    }
    # worst-dz instance among kk-matched (kernel-bug signal if large)
    if match.any():
        dzm = np.where(match, dz, -1.0)
        im = int(dzm.argmax())
        out["worst_matched"] = {
            "i": im, "dz": float(dz[im]), "kk": int(kx[im]),
            "res_xla": rx[im].tolist(), "res_flat": rf[im].tolist(),
        }
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
