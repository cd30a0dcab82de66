"""Real-Mosaic validation of the engines-under-shard_map path
(solve_sharded with cfg.use_pallas) on the one available TPU chip.

The CPU mesh tests (tests/test_sharding.py, dryrun step 6) prove correct
PARTITIONING on 2-8 virtual devices in interpret mode; this tool proves
the same shard_map-wrapped pallas_calls COMPILE AND EXECUTE under real
Mosaic — the piece interpret mode cannot cover.  With one chip the mesh
is trivial (1 device), which still exercises the full jit(shard_map(
engine)) lowering pipeline.  Asserts bit-equality with the plain
solve_batched engine result and prints one JSON line per engine.
"""

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

    from hpmpc_tpu.models import ipm
    from hpmpc_tpu.parallel import batch as pbatch
    from hpmpc_tpu.utils.mass_spring import mass_spring_qp

    B = 1024
    dt = jnp.float32
    dims, qp = mass_spring_qp(8, 3, 30, ngN=8, dtype=dt)
    qpb = pbatch.broadcast_qp(qp, B)
    rng = np.random.default_rng(0)
    qpb = dataclasses.replace(
        qpb,
        b=qpb.b * jnp.asarray(
            1 + 0.02 * rng.standard_normal(B), dt)[:, None, None],
    )
    cfg = ipm.IPMConfig(k_max=8, mu_tol=0.0, alpha_min=1e-8,
                        use_pallas=True)

    for engine in ("flat", "mega"):
        os.environ["HPMPC_RESIDENT"] = "0"
        os.environ["HPMPC_LANES_LOOP"] = "1" if engine == "mega" else "0"
        os.environ["HPMPC_MEGA_SWEEPS"] = "1" if engine == "mega" else "0"
        row = {"metric": f"shardmap_engine_{engine}"}
        try:
            t0 = time.time()
            sol_plain = jax.jit(
                lambda q: pbatch.solve_batched(dims, q, cfg))(qpb)
            mesh = pbatch.make_mesh(1)
            qps = pbatch.shard_qp(qpb, mesh)
            sol_sh = pbatch.solve_sharded(dims, qps, cfg, mesh)
            jax.block_until_ready(sol_sh.z)
            row["compile_s"] = round(time.time() - t0, 1)
            dz = float(np.max(np.abs(
                np.asarray(sol_sh.z) - np.asarray(sol_plain.z))))
            kk_eq = bool(np.array_equal(np.asarray(sol_sh.kk),
                                        np.asarray(sol_plain.kk)))
            row["max_dz"] = dz
            row["kk_equal"] = kk_eq
            row["ok"] = bool(dz == 0.0 and kk_eq)
            assert row["ok"], f"shard_map {engine} mismatch dz={dz}"
        except Exception as e:  # noqa: BLE001
            row["ok"] = False
            row["error"] = f"{type(e).__name__}: {e}"[:300]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
