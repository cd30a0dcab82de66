"""Hardware repro for the resident engine's non-finite checksum on the
flagship problem (ngN=8): sweep (N, ngN, k_max) cases and report
finiteness + iteration histograms; dump the stat rows of a bad
instance when found."""

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

    from hpmpc_tpu.models import ipm, ipm_resident
    from hpmpc_tpu.parallel import batch as pbatch
    from hpmpc_tpu.utils.mass_spring import mass_spring_qp

    for N, ngN, kmax in ((4, 8, 8), (30, 8, 3), (30, 8, 8)):
        dims, qp = mass_spring_qp(8, 3, N, ngN=ngN, dtype=jnp.float32)
        qpb = pbatch.broadcast_qp(qp, 1024)
        rng = np.random.default_rng(0)
        qpb = dataclasses.replace(qpb, b=qpb.b * jnp.asarray(
            1 + 0.05 * rng.standard_normal(1024),
            jnp.float32)[:, None, None])
        cfg = ipm.IPMConfig(k_max=kmax, mu_tol=0.0, alpha_min=1e-8,
                            use_pallas=True)
        sol = jax.jit(lambda q, c=cfg, d=dims:
                      ipm_resident.solve_batched_resident(d, q, c))(qpb)
        z = np.asarray(sol.z)
        st = np.asarray(sol.stat)
        bad = (~np.isfinite(z.reshape(1024, -1))).any(axis=1)
        print(json.dumps({
            "N": N, "ngN": ngN, "k_max": kmax,
            "finite": bool(np.isfinite(z).all()),
            "bad": int(bad.sum()),
            "kk": np.bincount(np.asarray(sol.kk),
                              minlength=kmax + 1).tolist(),
            "stat_finite": bool(np.isfinite(st).all()),
        }), flush=True)
        if bad.any():
            i = int(np.argmax(bad))
            print("instance", i, "stat rows (sigma,a_aff,mu_aff,a2,mu):")
            print(np.array2string(st[i], precision=3), flush=True)


if __name__ == "__main__":
    main()
