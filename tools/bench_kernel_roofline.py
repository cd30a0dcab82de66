"""Roofline measurement of the fused Riccati stage kernels.

The reference normalizes its kernel benchmarks against per-architecture
theoretical peak flops (``test_problems/test_blas_d.c:87-127``).  The TPU
analogue for these memory-bound small-matrix sweeps is the HBM roofline:
each kernel's achieved bytes/s against the chip's published bandwidth
(v5e: ~819 GB/s), plus achieved FLOP/s for context.

Byte accounting is exact from the BlockSpecs: every input block is read
once per grid step and every output block written once (stage-sequential
grid, no reuse across steps except VMEM scratch, which never touches HBM).

Prints one JSON line per kernel.  Usage:
    python tools/bench_kernel_roofline.py [--batch 4096] [--N 30]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from hpmpc_tpu.parallel import batch as pbatch
    from hpmpc_tpu.ops import stage_kernel as sk
    from hpmpc_tpu.utils.mass_spring import mass_spring_qp

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--N", type=int, default=30)
    p.add_argument("--peak-gbs", type=float, default=819.0,
                   help="per-chip HBM bandwidth for normalization (v5e)")
    p.add_argument("--only", default=None,
                   help="run a single case (sv|trs|resid|prep|alpha|corr|"
                        "residfull) — each case costs two remote compiles; "
                        "split runs to fit timeouts")
    args = p.parse_args()

    dtype = jnp.float32
    B = args.batch
    dims, qp = mass_spring_qp(8, 3, args.N, dtype=dtype)
    qpb = pbatch.broadcast_qp(qp, B)
    N, NU, NX, NZ = dims.N, dims.NU, dims.NX, dims.NZ
    Np1 = N + 1
    NZF, NXF = Np1 * NZ, N * NX

    NT = sk._sym_nt(NZ)  # packed symmetric H stream (66 at NZ=11)
    Hl = sk._to_lanes(sk.sym_compress(qpb.H), B)
    Fl = sk._to_lanes(qpb.F, B)
    gF = (qpb.g * qpb.z_mask).reshape(B, NZF)
    bF = qpb.b.reshape(B, NXF)
    pad_diagF = qpb.pad_diag.reshape(B, NZF)
    ngt_l = jnp.zeros((B // sk.BI, 1, NT, sk.SUBS, sk.LANES), dtype)

    f4 = 4  # bytes per f32
    # exact HBM traffic per call, from the BlockSpecs (lanes arrays are
    # tile-dense: physical == logical bytes)
    bytes_bwd = f4 * B * (
        Np1 * NT           # Hl in (packed symmetric lower triangle)
        + Np1 * NZ         # dvec in
        + Np1 * NT         # ng slot in (1 slot, read per stage)
        + Np1 * NZ         # g in
        + Np1 * NZ * NX    # F in (clipped index still streams per stage)
        + Np1 * NX         # b in
        + Np1 * NZ * NU    # Ll out (split factor)
        + Np1 * NX * NX    # Lxx out
        + Np1 * NU         # eu out
        + Np1 * NX         # px out
        + N * NX           # Pb out
    )
    bytes_fwd = f4 * B * (
        Np1 * NZ * NU + Np1 * NX * NX  # Ll + Lxx, ONE fetch each
        + Np1 * NU + Np1 * NX + Np1 * NZ * NX + Np1 * NX  # eu, px, F, b
        + Np1 * NZ + N * NX  # z, pi out
    )
    bytes_trs = f4 * B * (
        Np1 * NZ * NU + Np1 * NZ + Np1 * NZ * NX + Np1 * NX  # Ll, g, F, Pb
        + Np1 * NU + Np1 * NX  # eu, px out
    )
    bytes_resid = f4 * B * (
        Np1 * NT + Np1 * NZ * NX + Np1 * NZ + Np1 * NX  # H(packed), F, z, pi
        + 2 * Np1 * NZ + Np1 * NX  # hz, fpi, fz out
    )

    # FLOP counts (multiply-add = 2): bwd per stage ~ trmm W (NZ^2 NX) +
    # syrk (NZ^2 NX) + chol (NZ^3/3) + solves; coarse but honest
    flops_bwd = 2 * B * N * (2 * NZ * NZ * NX + NZ**3 / 3 + NZ * NZ)
    flops_fwd = 2 * B * N * (NZ * NX + NU * NU + NX * NX * 2)
    flops_resid = 2 * B * Np1 * (NZ * NZ + 2 * NZ * NX)

    def slope(fn, K_lo=8, K_hi=64, reps=2):
        def make(K):
            @jax.jit
            def run(seed):
                def body(acc, i):
                    # acc feeds the next input: forces true serial deps
                    return acc + fn(1.0 + 1e-5 * (i + seed)
                                    + 1e-30 * acc), None
                acc, _ = lax.scan(
                    body, jnp.asarray(0.0, dtype), jnp.arange(K, dtype=dtype)
                )
                return acc
            return run

        ts = {}
        for K in (K_lo, K_hi):
            f = make(K)
            float(f(jnp.asarray(0.0, dtype)))
            t0 = time.perf_counter()
            for r in range(1, reps + 1):
                float(f(jnp.asarray(r * 31.0, dtype)))
            ts[K] = (time.perf_counter() - t0) / reps
        return max((ts[K_hi] - ts[K_lo]) / (K_hi - K_lo), 1e-9)

    def k_factor(s):
        z, pi, (Ll, Lxx, Pb) = sk.factor_solve_folded_flat(
            Hl, pad_diagF + s, ngt_l, (), gF * s, Fl, bF, NU, NZ, NX
        )
        return jnp.sum(z) + jnp.sum(pi)

    Ll0 = Lxx0 = Pb0 = None
    if args.only in (None, "trs"):
        _, _, (Ll0, Lxx0, Pb0) = jax.jit(
            lambda: sk.factor_solve_folded_flat(
                Hl, pad_diagF + 1.0, ngt_l, (), gF, Fl, bF, NU, NZ, NX
            )
        )()

    def k_trs(s):
        z, pi = sk.solve_flat(Ll0, Lxx0, Pb0, gF * s, Fl, bF, NU, NZ, NX)
        return jnp.sum(z) + jnp.sum(pi)

    zF = gF * 0.1
    piF = bF * 0.1

    def k_resid(s):
        hz, fz, fp = sk.resid_terms_flat(Hl, Fl, zF * s, piF * s, NZ, NX)
        return jnp.sum(hz) + jnp.sum(fz) + jnp.sum(fp)

    # ---- step-primitive kernels (ops/step_kernel.py, lanes engine) ------
    from hpmpc_tpu.ops import step_kernel as stk

    NB = dims.NB
    NB2 = 2 * NB
    idx_np = np.zeros((Np1, NB), np.int32)
    for n in range(Np1):
        nun = dims.nu[n]
        for k in range(dims.nb[n]):
            j = int(dims.idxb[n][k])
            idx_np[n, k] = j if j < nun else NU + (j - nun)
    idxT = jnp.asarray(idx_np)

    def lanes3(x):
        return sk._to_lanes(x, B)

    mb1 = qpb.nb_mask
    mbL = lanes3(jnp.concatenate([mb1, mb1], -1))
    dcatL = lanes3(jnp.concatenate([qpb.d_lb, qpb.d_ub], -1))
    rng0 = np.random.default_rng(0)
    lamL = lanes3(jnp.asarray(
        rng0.uniform(0.1, 2.0, (B, Np1, NB2)), dtype))
    tL = lanes3(jnp.asarray(
        rng0.uniform(0.1, 2.0, (B, Np1, NB2)), dtype))
    gL = lanes3(qpb.g * qpb.z_mask)
    pdL = lanes3(qpb.pad_diag)
    bLn = lanes3(qpb.b)
    zLn = lanes3(qpb.g * 0.1)
    piLn = lanes3(qpb.b * 0.1)
    zmL = lanes3(qpb.z_mask)
    xmL = lanes3(qpb.x_mask[:, 1:])
    smL = jnp.full((B // sk.BI, 1, sk.SUBS, sk.LANES), 0.05, dtype)

    def k_prep(s):
        dv, ge = stk.prep_flat(
            idxT, lamL * s, tL, dcatL, None, mbL, gL, pdL,
            NB=NB, NZ=NZ, phase2=False,
        )
        return jnp.sum(dv) + jnp.sum(ge)

    def k_alpha(s):
        outs = stk.alpha_sums_flat(
            idxT, zLn * s, lamL, tL, dcatL, None, None, mbL,
            NB=NB, NZ=NZ, phase2=False,
        )
        return sum(jnp.sum(o) for o in outs[:2]) + jnp.sum(outs[2])

    def k_corr(s):
        ge2, co = stk.corr_geff_flat(
            idxT, lamL * s, tL, dcatL, None, lamL, tL, smL, gL, mbL,
            NB=NB, NZ=NZ, phase2=False,
        )
        return jnp.sum(ge2) + jnp.sum(co)

    def k_residfull(s):
        outs = stk.resid_full_flat(
            idxT, Hl, Fl, zLn * s, piLn, gL, bLn, lamL, tL, dcatL, mbL,
            zmL, xmL, NB=NB, NU=NU, NZ=NZ, NX=NX,
        )
        return sum(jnp.sum(o) for o in outs)

    bytes_prep = f4 * B * (4 * Np1 * NB2 + 4 * Np1 * NZ)
    bytes_alpha = f4 * B * (
        Np1 * NZ + 4 * Np1 * NB2 + 2 * Np1 * NB2 + 4 * Np1
    )
    bytes_corr = f4 * B * (6 * Np1 * NB2 + 1 + 2 * Np1 * NZ + Np1 * NB2)
    bytes_residfull = f4 * B * (
        Np1 * NT + Np1 * NZ * NX + 2 * Np1 * NZ + 2 * Np1 * NX  # H F z z+
        + Np1 * NZ + Np1 * NX                                    # g b
        + 4 * Np1 * NB2 + Np1 * NZ + Np1 * NX                    # box, masks
        + Np1 * NZ + Np1 * NX + 2 * Np1 * NB2 + Np1              # outs
    )
    flops_step = 2 * B * Np1 * (10 * NB2 + NB)  # order-of-magnitude
    flops_residfull = flops_resid + 2 * B * Np1 * 6 * NB2

    cases = [
        ("sv", "riccati_sv_fused", k_factor, bytes_bwd + bytes_fwd,
         flops_bwd + flops_fwd),
        ("trs", "riccati_trs_fused", k_trs, bytes_trs + bytes_fwd,
         flops_bwd / 3 + flops_fwd),
        ("resid", "residual_matvecs", k_resid, bytes_resid, flops_resid),
        ("prep", "step_prep", k_prep, bytes_prep, flops_step),
        ("alpha", "step_alpha_sums", k_alpha, bytes_alpha, flops_step),
        ("corr", "step_corr_geff", k_corr, bytes_corr, flops_step),
        ("residfull", "step_resid_full", k_residfull, bytes_residfull,
         flops_residfull),
    ]
    cases = [(n, f, b, fl) for key, n, f, b, fl in cases
             if args.only in (None, key)]
    for name, fn, nbytes, nflops in cases:
        dt_s = slope(fn)
        gbs = nbytes / dt_s / 1e9
        print(
            json.dumps(
                {
                    "metric": f"{name}_GBps",
                    "value": round(gbs, 1),
                    "unit": (
                        f"GB/s achieved (batch={B}, N={args.N}, f32; "
                        f"{nflops / dt_s / 1e12:.2f} TFLOP/s; "
                        f"{dt_s * 1e3:.3f} ms/call)"
                    ),
                    "vs_baseline": round(gbs / args.peak_gbs, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
