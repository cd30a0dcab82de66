"""The f64 host oracle must agree with the in-graph residual evaluator."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hpmpc_tpu.models import ipm
from hpmpc_tpu.parallel import batch as pbatch
from hpmpc_tpu.utils.mass_spring import mass_spring_qp
from hpmpc_tpu.utils.resid64 import true_residuals_sol


def test_oracle_matches_in_graph_residuals():
    B = 4
    dims, qp = mass_spring_qp(8, 3, 12, dtype=jnp.float64)
    qpb = pbatch.broadcast_qp(qp, B)
    rng = np.random.default_rng(3)
    qpb = dataclasses.replace(
        qpb,
        b=qpb.b * jnp.asarray(
            1 + 0.05 * rng.standard_normal(B), jnp.float64)[:, None, None],
    )
    cfg = ipm.IPMConfig(k_max=8, mu_tol=0.0, alpha_min=1e-8)
    sol = jax.vmap(lambda q: ipm.solve(dims, q, cfg))(qpb)

    res, rel = true_residuals_sol(qpb, sol)
    got = np.asarray(sol.inf_norm_res, np.float64)  # (B, 4)
    # f64 solve + f64 oracle: identical formulas, near-identical results
    assert res.shape == got.shape
    np.testing.assert_allclose(res, got, rtol=1e-9, atol=1e-12)
    # the solves converge, so relative backward errors are tiny
    assert rel[:, 0].max() < 1e-9
    assert rel[:, 1].max() < 1e-9
