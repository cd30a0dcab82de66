"""Minimum-latency closed-loop MPC through the 5th-generation DENSE
engine: condense once, then every control tick is ONE warm-started dense
IPM solve from the raw dynamics offsets — the 201us/74us (N=30/N=10,
v5e, wide-K protocol) deployment path.

The tick contract: the condensed matrices are fixed across ticks (the
plant model and costs don't change); the new measured state enters
through ``b_0 = b + A x0`` exactly like the stage engines' closed loop,
and the plan's exact affine maps recondense the vectors inside the tick.
``warm`` seeds each tick from the previous tick's iterate (RTI hot
loop).

Run: python examples/dense_tick_mpc.py
"""

import dataclasses
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from hpmpc_tpu.models import ipm, ipm_dense
from hpmpc_tpu.utils.mass_spring import mass_spring_ab, mass_spring_qp


def main():
    nx, nu, N = 8, 3, 12
    A, B = mass_spring_ab(nx, nu, 0.5)
    dims, qp0 = mass_spring_qp(nx, nu, N, A=A, B=B)
    qp0 = dataclasses.replace(qp0, g=qp0.g * 0.0)
    b_nom = 0.1 * np.ones(nx)

    plan = ipm_dense.plan_dense(dims, qp0)
    cfg = ipm.IPMConfig(k_max=10, mu_tol=1e-5, alpha_min=1e-8)
    tick = jax.jit(
        lambda bf, y0: ipm_dense.solve_dense_tick(
            plan, bf, cfg, use_kernel=False, y0=y0)
    )  # oracle path keeps the example CPU-fast; the kernel twin is
    #    parity-tested in tests/test_ipm_dense.py

    def bflat_for(x0):
        b = qp0.b.at[0].set(jnp.asarray(b_nom + A @ x0, qp0.dtype))
        return b.reshape(-1)

    x = np.r_[2.5, 2.5, np.zeros(nx - 2)]
    y = jnp.zeros((plan.nz,), qp0.dtype)
    kks = []
    rng = np.random.default_rng(0)
    for t in range(40):
        res = tick(bflat_for(x), y)
        assert int(res.status) == 0, f"tick {t} failed"
        u0 = np.asarray(res.u0)
        assert np.all(np.abs(u0) <= 0.5 + 1e-5), "input bound violated"
        x = A @ x + B @ u0 + 0.01 * rng.standard_normal(nx)
        y = res.y
        kks.append(int(res.kk))
        if t % 8 == 0:
            print(f"t={t:2d}  u0={np.round(u0, 3)}  "
                  f"|x|={np.linalg.norm(x):.4f}  kk={int(res.kk)}  "
                  f"mu={float(res.mu):.2e}")
    assert np.linalg.norm(x) < 1.5, "controller failed to regulate"
    # warm ticks converge in fewer iterations than the cold start
    assert np.mean(kks[5:]) < kks[0], (kks[0], np.mean(kks[5:]))
    print(f"regulated under input bounds; cold kk={kks[0]}, warm mean "
          f"kk={np.mean(kks[5:]):.1f}: OK")


if __name__ == "__main__":
    main()
