"""Module-size probe (VERDICT r04 next-step #4): measure the LOWERED
module text size of the programs that flake the remote compile helper
(~100-130 MB MLIR -> HTTP 500): the soft resident engine at N=20 vs 30,
the hard resident at N=30, and the blocked/structured route at nx=192
N=10 vs N=30.  Lowering is LOCAL (no compile RPC is issued); one JSON
line per program with the module byte size, so the trace-size work can
target the actual offender instead of guesses.

Usage: python tools/probe_module_size.py [--which soft,hard,blocked]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _size(f, *args):
    lowered = f.lower(*args)
    try:
        txt = lowered.as_text()
    except Exception as e:  # noqa: BLE001
        return {"error": str(e)[:120]}
    return {"bytes": len(txt)}


def main():
    import jax
    import jax.numpy as jnp

    from hpmpc_tpu.models import ipm
    from hpmpc_tpu.parallel import batch as pbatch
    from hpmpc_tpu.utils.mass_spring import mass_spring_qp, \
        mass_spring_soft_qp

    p = argparse.ArgumentParser()
    p.add_argument("--which", default="soft,hard,blocked")
    args = p.parse_args()
    which = set(args.which.split(","))

    def bc(x, B):
        return jax.tree_util.tree_map(
            lambda v: jnp.broadcast_to(v, (B,) + v.shape), x)

    if "soft" in which:
        for N in (20, 30):
            dims, qp, soft = mass_spring_soft_qp(8, 3, N,
                                                 dtype=jnp.float32)
            qpb, softb = bc(qp, 1024), bc(soft, 1024)
            idxbs = tuple(tuple(int(i) for i in row)
                          for row in np.asarray(soft.idxbs))
            cfg = ipm.IPMConfig(k_max=8, mu_tol=1e-4, use_pallas=True)
            from hpmpc_tpu.models import ipm_soft_resident

            f = jax.jit(
                lambda q, s: ipm_soft_resident.
                solve_batched_soft_resident(dims, q, s, cfg, idxbs))
            print(json.dumps({"program": f"soft_resident_N{N}",
                              **_size(f, qpb, softb)}), flush=True)

    if "hard" in which:
        for N in (20, 30):
            dims, qp = mass_spring_qp(8, 3, N, ngN=8, dtype=jnp.float32)
            qpb = bc(qp, 1024)
            cfg = ipm.IPMConfig(k_max=8, mu_tol=1e-4, mu_switch=0.0,
                                use_pallas=True)
            from hpmpc_tpu.models import ipm_resident

            f = jax.jit(
                lambda q: ipm_resident.solve_batched_resident(
                    dims, q, cfg))
            print(json.dumps({"program": f"hard_resident_N{N}",
                              **_size(f, qpb)}), flush=True)

    if "blocked" in which:
        for N in (10, 30):
            dims, qp = mass_spring_qp(192, 24, N, dtype=jnp.float32)
            qpb = bc(qp, 256)
            rng = np.random.default_rng(0)
            qpb = dataclasses.replace(
                qpb, b=qpb.b * jnp.asarray(
                    1 + 0.02 * rng.standard_normal(256),
                    jnp.float32)[:, None, None])
            cfg = ipm.IPMConfig(k_max=8, mu_tol=0.0, alpha_min=1e-8,
                                use_pallas=True)
            f = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg))
            print(json.dumps({"program": f"blocked_nx192_N{N}",
                              **_size(f, qpb)}), flush=True)


if __name__ == "__main__":
    main()
