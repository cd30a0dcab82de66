"""Closed-loop MPC demo: full IPM solve at t=0, then ONE warm Newton
iteration per control tick (the Real-Time Iteration scheme) warm-started
from the previous tick's full iterate.

This is the deployment pattern the reference's single-Newton variant exists
for (``d_ip2_res_mpc_hard_tv_single_newton_step``, ``d_ip2_res_hard.c:1348``):
each tick re-factorizes once at the warm iterate and takes one
predictor-corrector step against the new measured state — microseconds per
tick instead of a full solve, while the iterate tracks the moving optimum.

Run: python examples/closed_loop_mpc.py
"""

import dataclasses
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from hpmpc_tpu.models import ipm
from hpmpc_tpu.utils.mass_spring import mass_spring_ab, mass_spring_qp


def main():
    nx, nu, N = 8, 3, 30
    A, B = mass_spring_ab(nx, nu, 0.5)
    dims, qp0 = mass_spring_qp(nx, nu, N, A=A, B=B)
    # zero the linear cost terms (the reference test's q=0.1/r=0.2 shift the
    # optimal equilibrium away from the origin) -> a true regulator
    qp0 = dataclasses.replace(qp0, g=qp0.g * 0.0)

    # The packed problem eliminates x0 into b_0 = b + A x0 (x0 = [2.5, 2.5,
    # 0...] inside mass_spring_qp).  In closed loop we just rewrite that row.
    b_nom = 0.1 * np.ones(nx)

    def qp_for(x0):
        b = qp0.b.at[0].set(jnp.asarray(b_nom + A @ x0, qp0.dtype))
        return dataclasses.replace(qp0, b=b)

    cold_solve = jax.jit(
        lambda q: ipm.solve(dims, q, ipm.IPMConfig(k_max=30, mu_tol=1e-8))
    )
    rti_cfg = ipm.IPMConfig(k_max=2)  # two warm Newton steps per tick
    # (one suffices for small disturbances; this demo moves the state by
    #  ~|x|/N per tick plus noise, where a second step keeps mu tracking)
    rti_step = jax.jit(
        lambda q, s: ipm.solve_single_newton(
            dims, q, rti_cfg, s.z, s.pi, s.lam_b, s.t_b, s.lam_g, s.t_g
        )
    )

    x = np.r_[2.5, 2.5, np.zeros(nx - 2)]
    sol = cold_solve(qp_for(x))
    print(f"t= 0  cold solve: {int(sol.kk)} iterations, mu={float(sol.inf_norm_res[3]):.2e}")

    rng = np.random.default_rng(0)
    for t in range(1, 41):
        u0 = np.asarray(sol.z[0, :nu])
        assert np.all(np.abs(u0) <= 0.5 + 1e-9), "input bound violated"
        # plant step (with a little process noise)
        x = A @ x + B @ u0 + 0.01 * rng.standard_normal(nx)
        sol = rti_step(qp_for(x), sol)
        if t % 4 == 0:
            print(
                f"t={t:2d}  u0={np.round(u0, 3)}  |x|={np.linalg.norm(x):.4f}  "
                f"rti mu={float(sol.inf_norm_res[3]):.2e}"
            )
    assert np.linalg.norm(x) < 1.5, "controller failed to regulate"
    print("regulated to the origin under input bounds: OK")


if __name__ == "__main__":
    main()
