"""Real-Mosaic validation of the LARGE-TREE fused mode: the
HBM-streamed backward accumulator (``ops/tree_kernel._tree_bwd_kernel``
``hbm_acc``) vs the VMEM-resident path, plus a beyond-VMEM-cap tree vs
the level-batched XLA route.

Interpret parity is tests/test_tree_flat.py::
test_tree_flat_hbm_accumulator_matches_vmem; this proves the DMA
lowering compiles and executes on hardware.  Prints one JSON line per
check; on success the HPMPC_TREE_HBM default can be flipped ON.
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

    from hpmpc_tpu.models import ipm, tree
    from hpmpc_tpu.ops import tree_kernel as tk
    from hpmpc_tpu.parallel import batch as pbatch
    from hpmpc_tpu.utils.mass_spring import mass_spring_tree_qp

    B = 1024
    dt = jnp.float32

    # 1. same small tree through both accumulator placements: bit-equal
    tdef, dims, qp = mass_spring_tree_qp(md=2, Nr=2, Nh=8, nx=4, nu=2)
    qpb = pbatch.broadcast_qp(qp, B)
    rng = np.random.default_rng(0)
    qpb = dataclasses.replace(
        qpb, b=qpb.b * jnp.asarray(
            1 + 0.02 * rng.standard_normal(B), dt)[:, None, None])
    cfg = ipm.IPMConfig(k_max=3, mu_tol=1e-4, use_pallas=True)

    row = {"metric": "tree_hbm_accumulator_tpu"}
    try:
        t0 = time.time()
        sol_v = jax.jit(
            lambda q: tree.solve_tree_ipm_flat(tdef, dims, q, cfg))(qpb)
        sol_v = jax.tree.map(np.asarray, sol_v)
        orig = tk.tree_fits_fused
        tk.tree_fits_fused = lambda n, NZ: False
        tk.tree_factor_solve_flat.clear_cache()
        try:
            sol_h = jax.jit(
                lambda q: tree.solve_tree_ipm_flat(tdef, dims, q, cfg)
            )(qpb)
            sol_h = jax.tree.map(np.asarray, sol_h)
        finally:
            tk.tree_fits_fused = orig
            tk.tree_factor_solve_flat.clear_cache()
        row["compile_s"] = round(time.time() - t0, 1)
        dz = float(np.max(np.abs(sol_h.z - sol_v.z)))
        row["max_dz"] = dz
        row["kk_equal"] = bool(np.array_equal(sol_h.kk, sol_v.kk))
        row["ok"] = bool(dz == 0.0 and row["kk_equal"])
    except Exception as e:  # noqa: BLE001
        row["ok"] = False
        row["error"] = f"{type(e).__name__}: {e}"[:300]
    print(json.dumps(row), flush=True)

    # 2. a tree past the VMEM cap (511 nodes) vs the XLA route
    tdef2, dims2, qp2 = mass_spring_tree_qp(md=2, Nr=8, Nh=8, nx=4, nu=2)
    row2 = {"metric": "tree_hbm_511_nodes_tpu",
            "n_nodes": tdef2.n_nodes,
            "fits_vmem": tk.tree_fits_fused(tdef2.n_nodes, dims2.NZ),
            "fits_hbm": tk.tree_fits_fused_hbm(tdef2.n_nodes, dims2.NZ)}
    try:
        os.environ["HPMPC_TREE_HBM"] = "1"
        qpb2 = pbatch.broadcast_qp(qp2, B)
        qpb2 = dataclasses.replace(
            qpb2, b=qpb2.b * jnp.asarray(
                1 + 0.02 * rng.standard_normal(B), dt)[:, None, None])
        cfg2 = ipm.IPMConfig(k_max=2, mu_tol=1e-4, use_pallas=True)
        t0 = time.time()
        sol_f = jax.jit(
            lambda q: pbatch.solve_batched_tree(tdef2, dims2, q, cfg2)
        )(qpb2)
        sol_f = jax.tree.map(np.asarray, sol_f)
        row2["compile_s"] = round(time.time() - t0, 1)
        # XLA reference on a 64-instance sub-batch (full batch too slow)
        sub = jax.tree_util.tree_map(lambda x: x[:64], qpb2)
        cfg2x = dataclasses.replace(cfg2, use_pallas=False)
        sol_x = jax.jit(jax.vmap(
            lambda q: tree.solve_tree_ipm(tdef2, dims2, q, cfg2x)))(sub)
        sol_x = jax.tree.map(np.asarray, sol_x)
        dz = float(np.max(np.abs(sol_f.z[:64] - sol_x.z)))
        row2["max_dz_vs_xla"] = dz
        row2["kk_match"] = float(np.mean(sol_f.kk[:64] == sol_x.kk))
        row2["ok"] = bool(dz < 5e-3 and row2["kk_match"] > 0.95)
    except Exception as e:  # noqa: BLE001
        row2["ok"] = False
        row2["error"] = f"{type(e).__name__}: {e}"[:300]
    print(json.dumps(row2), flush=True)


if __name__ == "__main__":
    main()
