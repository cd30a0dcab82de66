"""Hardware calibration for ops/batch_chol: per-(n, TB) compile/run the
batched Cholesky kernel, report ms/call and parity vs the D&C — and on
Mosaic stack-OOM, the error text (which states the actual scoped-VMEM
need, the datum behind ``_need_bytes``).

Usage: python tools/calib_chol_vmem.py [n ...]   (default 40 72 108 144)
"""

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
    from jax import lax

    from hpmpc_tpu.ops import batch_chol, tri

    sizes = ([int(a) for a in sys.argv[1:]] or [40, 72, 108, 144])
    B = 1024
    dt = jnp.float32

    for n in sizes:
        rng = np.random.default_rng(0)
        A0 = np.asarray(rng.standard_normal((B, n, n)), np.float32)
        SPD = jnp.asarray(
            A0 @ A0.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32), dt)
        Ld = None
        for tb in (8, 16, 32, 64):
            try:
                f = lambda x: batch_chol.cholesky(x, tb=tb)

                @jax.jit
                def run(M, K, seed):
                    def body(i, acc):
                        x = M * (1.0 + 1e-6 * (i.astype(dt) + seed)
                                 + 1e-30 * acc)
                        return acc + jnp.sum(f(x))
                    return lax.fori_loop(0, K, body, jnp.asarray(0.0, dt))

                float(run(SPD, 2, jnp.asarray(0.0, dt)))
                ts = {}
                for K in (2, 10):
                    t0 = time.perf_counter()
                    for r in (1, 2, 3):
                        float(run(SPD, K, jnp.asarray(r * 13.0, dt)))
                    ts[K] = (time.perf_counter() - t0) / 3
                ms = max((ts[10] - ts[2]) / 8, 1e-9) * 1e3
                need = batch_chol._need_bytes(tb, n, 4) / (1 << 20)
                msg = f"{ms:8.3f} ms/call  (model {need:.1f} MiB)"
                if Ld is None:
                    Ld = np.asarray(jax.jit(tri.cholesky)(SPD), np.float64)
                Lp = np.asarray(jax.jit(f)(SPD), np.float64)
                rel = np.max(np.abs(Lp - Ld)) / np.max(np.abs(Ld))
                msg += f"  rel {rel:.1e}"
            except Exception as e:
                txt = str(e)
                # surface the Mosaic OOM size report if present
                key = "Scoped allocation with size"
                pos = txt.find(key)
                msg = ("OOM/ERR: " + (txt[pos:pos + 90] if pos >= 0
                                      else txt[:140]).replace("\n", " "))
            print(f"n={n:4d} TB={tb:3d}  {msg}", flush=True)


if __name__ == "__main__":
    main()
