"""Subprocess helper: f64 CPU anchor solve for the size sweep.

When the size sweep's f32 XLA anchor diverges on hardware (measured at
nx>=96: the f32 D&C Cholesky loses SPD on some instances), parity against
it is meaningless.  This helper recomputes a TRUSTED anchor for a small
sub-batch: the structured solver in f64 on CPU at matched iteration
budget.  Runs in its OWN process so the TPU process's config (f32,
axon backend) is untouched.

Usage: python tools/_cpu_f64_anchor.py <in.npz> <out.npz>
``in.npz``: qp leaves under ``qp_<name>``, plus dims fields and cfg
scalars (see bench_size_sweep).  Writes z, pi, kk, inf_norm_res (f64).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(fin, fout):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from hpmpc_tpu.models import ipm
    from hpmpc_tpu.ocp import OCPDims, OCPQP

    d = np.load(fin, allow_pickle=False)
    qp_leaves = {
        k[3:]: d[k] for k in d.files if k.startswith("qp_")
    }
    # rebuild the QP container in f64 (int leaves stay int); leaves are
    # UNBATCHED stage data — broadcast to the sub-batch, then install the
    # per-instance b
    fields = {}
    for name, arr in qp_leaves.items():
        if np.issubdtype(arr.dtype, np.floating):
            fields[name] = jnp.asarray(arr, jnp.float64)
        else:
            fields[name] = jnp.asarray(arr)
    bb = jnp.asarray(d["b_batched"], jnp.float64)
    Bs = bb.shape[0]
    fields = {k: jnp.broadcast_to(v, (Bs,) + v.shape)
              for k, v in fields.items()}
    fields["b"] = bb
    qp = OCPQP(**fields)

    N = int(d["N"])
    nx = int(d["nx"])
    nu = int(d["nu"])
    nb = d["nb"]
    ng = d["ng"]
    # static per-stage box index lists from the padded (N+1, NB) array
    # (nb[n] leading entries are the real ones; the rest is padding)
    idxb_pad = np.asarray(qp_leaves["idxb"])
    idxb = [[int(v) for v in idxb_pad[n][: int(nb[n])]]
            for n in range(N + 1)]
    dims = OCPDims.create(N, nx, nu, [int(v) for v in nb],
                          [int(v) for v in ng], idxb=idxb)
    cfg = ipm.IPMConfig(
        k_max=int(d["k_max"]), mu_tol=float(d["mu_tol"]),
        alpha_min=float(d["alpha_min"]),
    )
    sol = jax.jit(jax.vmap(lambda q: ipm.solve(dims, q, cfg)))(qp)
    np.savez(
        fout,
        z=np.asarray(sol.z, np.float64),
        pi=np.asarray(sol.pi, np.float64),
        kk=np.asarray(sol.kk),
        status=np.asarray(sol.status),
        inf_norm_res=np.asarray(sol.inf_norm_res, np.float64),
    )


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
