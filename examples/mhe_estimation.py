"""Moving-horizon estimation demo on the reference's own measurement data.

Uses ``mhe_measure.dat`` (the nx=12/nw=5/ny=3, 100-sample measurement record
the reference ships for ``test_problems/test_d_ric_mhe.c``) and runs the
covariance-form square-root filter/smoother (``solve_cov``; the reference's
``d_ric_trf/trs_mhe``) plus the information-form solver it cross-validates
against (``factor_solve``; ``d_ric_trf/trs_mhe_if``).

Run: python examples/mhe_estimation.py
"""

import pathlib
import sys

_ROOT = str(pathlib.Path(__file__).resolve().parents[1])
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp
import numpy as np

from hpmpc_tpu.models import mhe
from hpmpc_tpu.utils.mass_spring import mass_spring_ab
from hpmpc_tpu.utils.mhe_data import load_mhe_measure


def main():
    nx_d, nw_d, ny_d, Ns, y_all = load_mhe_measure(
        _ROOT + "/tests/golden/mhe_measure.dat"
    )
    print(f"measurement record: nx={nx_d} nw={nw_d} ny={ny_d} samples={Ns}")

    # the reference test's estimation model: mass-spring dynamics, first-ny
    # states measured, process noise through the input channels
    N = 20  # estimation horizon
    A, Bw = mass_spring_ab(nx_d, nw_d, 0.5)
    C = np.zeros((ny_d, nx_d))
    C[:, :ny_d] = np.eye(ny_d)

    dt = jnp.float64
    data = mhe.MHECovData(
        A=jnp.asarray(np.stack([A] * N), dt),
        G=jnp.asarray(np.stack([Bw] * N), dt),
        f=jnp.zeros((N, nx_d), dt),
        C=jnp.asarray(np.stack([C] * (N + 1)), dt),
        y=jnp.asarray(y_all[: N + 1], dt),
        W=jnp.asarray(np.stack([10.0 * np.eye(ny_d)] * (N + 1)), dt),
        R=jnp.asarray(np.stack([np.eye(nw_d)] * N), dt),
        r=jnp.zeros((N, nw_d), dt),
        Lp0=jnp.asarray(np.eye(nx_d), dt),
        xp0=jnp.zeros((nx_d,), dt),
    )

    sol = jax.jit(mhe.solve_cov)(data)
    print("smoothed state estimates (first 3 coords):")
    for n in range(0, N + 1, 5):
        print(f"  x[{n:2d}] = {np.round(np.asarray(sol.x[n][:3]), 4)}"
              f"   measured y = {np.round(y_all[n], 4)}")

    # cross-check: the information-form solver on the equivalent problem
    sol_if = jax.jit(lambda d: mhe.factor_solve(d))(data.as_information())
    err = float(jnp.max(jnp.abs(sol.x - sol_if[0].x)))
    print(f"covariance vs information form: max|dx| = {err:.2e}")
    assert err < 1e-8

    # the filtered estimates track the measured coordinates
    resid = np.asarray(sol.xe)[1:, :ny_d] - y_all[1 : N + 1]
    print(f"filtered innovation rms = {np.sqrt((resid**2).mean()):.4f}")
    assert np.sqrt((resid**2).mean()) < 1.0
    print("OK")


if __name__ == "__main__":
    main()
