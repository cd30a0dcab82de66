"""Real-Mosaic validation of the dense condensed-QP latency kernel
(ops/dense_kernel): run the N=30 flagship tick on the TPU, compare
against the pure-JAX oracle (same device, XLA route) and print one JSON
line — kk must match, controls to f32 roundoff scale.

Usage: python tools/check_dense_tpu.py
"""

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

    from hpmpc_tpu.models import ipm, ipm_dense
    from hpmpc_tpu.utils.mass_spring import mass_spring_qp

    dims, qp = mass_spring_qp(8, 3, 30, dtype=jnp.float32)
    cfg = ipm.IPMConfig(k_max=8, mu_tol=1e-4, alpha_min=1e-8)
    plan = ipm_dense.plan_dense(dims, qp)
    bflat = qp.b.reshape(-1)

    ref = jax.jit(lambda bf: ipm_dense.solve_dense_ref(
        plan, bf, cfg))(bflat)
    res = jax.jit(lambda bf: ipm_dense.solve_dense_tick(
        plan, bf, cfg))(bflat)
    kk_ok = int(res.kk) == int(ref.kk)
    du = float(np.abs(np.asarray(res.y, np.float64)
                      - np.asarray(ref.y, np.float64)).max())
    print(json.dumps({
        "metric": "dense_kernel_tpu_parity",
        "value": 1.0 if (kk_ok and du < 1e-3) else 0.0,
        "unit": (f"real-Mosaic dense tick vs XLA oracle (N=30 nz=90 "
                 f"ngd=120): kk {int(res.kk)} vs {int(ref.kk)}, "
                 f"status {int(res.status)} vs {int(ref.status)}, "
                 f"mu {float(res.mu):.2e} vs {float(ref.mu):.2e}, "
                 f"max|dy|={du:.2e}"),
        "vs_baseline": 0.0,
    }), flush=True)


if __name__ == "__main__":
    main()
