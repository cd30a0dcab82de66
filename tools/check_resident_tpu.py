"""Hardware validation of the solver-resident (giga) engines: parity vs
the lanes engines, on real Mosaic (interpret-mode parity is already
asserted by tests/test_resident.py / tests/test_soft_resident.py).

Default: the HARD engine vs lanes in the legacy phase-1 configuration
(mu_switch = mu_tol).  ``--soft``: the SOFT resident engine vs the soft
lanes engine (no pinning needed — the soft solver is single-phase).
Prints one JSON line per run."""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main_soft():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from hpmpc_tpu.models import ipm, ipm_soft_lanes, ipm_soft_resident
    from hpmpc_tpu.utils.mass_spring import mass_spring_soft_qp

    B = 1024
    dt = jnp.float32
    dims, qp, soft = mass_spring_soft_qp(8, 3, 30, Z=10.0, dtype=dt)
    bc = lambda x: jax.tree_util.tree_map(  # noqa: E731
        lambda v: jnp.broadcast_to(v, (B,) + v.shape), x)
    qps, softs = bc(qp), bc(soft)
    rng = np.random.default_rng(0)
    qps = dataclasses.replace(
        qps, g=qps.g * jnp.asarray(
            1 + 0.02 * rng.standard_normal(B), dt)[:, None, None])
    idxbs_t = tuple(tuple(int(i) for i in row)
                    for row in np.asarray(soft.idxbs))
    cfg = ipm.IPMConfig(k_max=8, mu0=100.0, mu_tol=1e-4, alpha_min=1e-8,
                        use_pallas=True)

    os.environ["HPMPC_MEGA_SWEEPS"] = "0"
    sol_r = jax.jit(
        lambda q, s: ipm_soft_resident.solve_batched_soft_resident(
            dims, q, s, cfg, idxbs_t)
    )(qps, softs)
    sol_l = jax.jit(
        lambda q, s: ipm_soft_lanes.solve_batched_soft_lanes(
            dims, q, s, cfg, idxbs_t)
    )(qps, softs)

    kk_r = np.asarray(sol_r.kk)
    kk_l = np.asarray(sol_l.kk)
    match = kk_r == kk_l
    z_r = np.asarray(sol_r.z, np.float64)
    z_l = np.asarray(sol_l.z, np.float64)
    dz = float(np.max(np.abs(z_r[match] - z_l[match]))) if match.any() else -1
    out = {
        "metric": "soft_resident_engine_tpu_parity",
        "kk_match": float(np.mean(match)),
        "dz_kk_matched": dz,
        "kk_hist_resident": np.bincount(kk_r, minlength=9).tolist(),
        "kk_hist_lanes": np.bincount(kk_l, minlength=9).tolist(),
        "status_resident": np.bincount(
            np.asarray(sol_r.status), minlength=3).tolist(),
        "ok": bool(np.mean(match) > 0.99 and 0 <= dz <= 5e-3),
    }
    print(json.dumps(out), flush=True)
    assert out["ok"], out


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from hpmpc_tpu.models import ipm, ipm_lanes, ipm_resident
    from hpmpc_tpu.parallel import batch as pbatch
    from hpmpc_tpu.utils.mass_spring import mass_spring_qp

    B = 1024
    dt = jnp.float32
    dims, qp = mass_spring_qp(8, 3, 30, dtype=dt)
    qpb = pbatch.broadcast_qp(qp, B)
    rng = np.random.default_rng(0)
    qpb = dataclasses.replace(
        qpb, b=qpb.b * jnp.asarray(
            1 + 0.02 * rng.standard_normal(B), dt)[:, None, None])
    cfg = ipm.IPMConfig(k_max=8, mu_tol=1e-4, alpha_min=1e-8,
                        use_pallas=True)
    cfg1 = dataclasses.replace(cfg, mu_switch=cfg.mu_tol)

    os.environ["HPMPC_MEGA_SWEEPS"] = "0"
    sol_r = jax.jit(
        lambda q: ipm_resident.solve_batched_resident(dims, q, cfg)
    )(qpb)
    sol_l = jax.jit(
        lambda q: ipm_lanes.solve_batched_lanes(dims, q, cfg1)
    )(qpb)

    kk_r = np.asarray(sol_r.kk)
    kk_l = np.asarray(sol_l.kk)
    match = kk_r == kk_l
    z_r = np.asarray(sol_r.z, np.float64)
    z_l = np.asarray(sol_l.z, np.float64)
    dz = float(np.max(np.abs(z_r[match] - z_l[match]))) if match.any() else -1
    out = {
        "metric": "resident_engine_tpu_parity",
        "kk_match": float(np.mean(match)),
        "dz_kk_matched": dz,
        "kk_hist_resident": np.bincount(kk_r, minlength=9).tolist(),
        "kk_hist_lanes": np.bincount(kk_l, minlength=9).tolist(),
        "status_resident": np.bincount(
            np.asarray(sol_r.status), minlength=3).tolist(),
        "ok": bool(np.mean(match) > 0.99 and 0 <= dz <= 5e-3),
    }
    print(json.dumps(out), flush=True)
    assert out["ok"], out


if __name__ == "__main__":
    if "--soft" in sys.argv:
        main_soft()
    else:
        main()
