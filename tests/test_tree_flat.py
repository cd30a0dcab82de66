"""Flat-state tree IPM engine (interpret mode on CPU): the fused tree
Pallas kernels driven through the shared flat loop must reproduce the
level-batched structured tree IPM iterate-for-iterate."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from hpmpc_tpu.models import ipm, tree
from hpmpc_tpu.ocp import OCPDims, OCPQP
from hpmpc_tpu.parallel import batch as pbatch
from hpmpc_tpu.utils.mass_spring import mass_spring_ab


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    yield


def _tree_qp(md=2, Nr=1, Nh=3, nx=4, nu=2, u_max=0.35, ng_nodes=(),
             dtype=jnp.float32):
    """Input-boxed tree QP on a mass-spring plant (the tree analogue of
    the chain test problems); optional 1-row general constraint
    (sum of inputs bounded) on ``ng_nodes``."""
    A, B_ = mass_spring_ab(nx, nu)
    tdef = tree.TreeDef.from_md_nr_nh(md, Nr, Nh)
    n, dad = tdef.n_nodes, tdef.dad
    is_leaf = [True] * n
    for k in range(1, n):
        is_leaf[dad[k]] = False

    nx_v = [0] + [nx] * (n - 1)
    nu_v = [0 if is_leaf[k] else nu for k in range(n)]
    nb_v = list(nu_v)
    ng_v = [1 if k in ng_nodes else 0 for k in range(n)]
    idxb = [np.arange(m, dtype=np.int32) for m in nb_v]
    dims = OCPDims.create(n - 1, nx_v, nu_v, nb_v, ng_v, idxb=idxb)
    NU, NX, NZ, NB, NG = dims.NU, dims.NX, dims.NZ, dims.NB, dims.NG

    # per-EDGE-varying dynamics: a uniform F would mask edge-index-mapping
    # bugs in the fused kernels (every clipped/misrouted fetch would read
    # identical data); scale each edge's A by a distinct factor instead
    F = np.zeros((n - 1, NZ, NX))
    for k in range(1, n):
        p = dad[k]
        Ak = A * (1.0 + 0.03 * (k % 5))
        F[k - 1, : nu_v[p], :nx] = B_.T[: nu_v[p]]
        F[k - 1, NU : NU + nx_v[p], :nx] = Ak.T[: nx_v[p]]
    b = np.zeros((n - 1, NX))
    b[:, :nx] = 0.1  # persistent offset keeps the problem off the origin
    b[:, 0] += 0.02 * np.arange(n - 1)  # per-edge-varying offsets too

    H = np.zeros((n, NZ, NZ))
    rng = np.random.default_rng(3)
    for k in range(n):
        H[k, : nu_v[k], : nu_v[k]] = 0.5 * np.eye(nu_v[k])
        Qk = np.eye(nx_v[k]) + 0.05 * np.diag(rng.random(nx_v[k]))
        H[k, NU : NU + nx_v[k], NU : NU + nx_v[k]] = Qk
    g = np.zeros((n, NZ))
    g[:, NU : NU + nx] = 0.05

    idxb_p = np.zeros((n, NB), dtype=np.int32)
    d_lb = np.zeros((n, NB))
    d_ub = np.zeros((n, NB))
    for k in range(n):
        idxb_p[k, : nb_v[k]] = np.arange(nb_v[k])
        d_lb[k, : nb_v[k]] = -u_max
        d_ub[k, : nb_v[k]] = u_max

    C = np.zeros((n, NG, NZ))
    d_lg = np.zeros((n, NG))
    d_ug = np.zeros((n, NG))
    for k in ng_nodes:
        C[k, 0, : nu_v[k]] = 1.0
        C[k, 0, NU : NU + nx_v[k]] = 0.3
        d_lg[k, 0] = -1.2
        d_ug[k, 0] = 1.2

    as_j = lambda x: jnp.asarray(x, dtype)
    qp = OCPQP(
        F=as_j(F), b=as_j(b), H=as_j(H), g=as_j(g),
        idxb=jnp.asarray(idxb_p), d_lb=as_j(d_lb), d_ub=as_j(d_ub),
        C=as_j(C), d_lg=as_j(d_lg), d_ug=as_j(d_ug),
        z_mask=as_j(dims.z_mask()), x_mask=as_j(dims.x_mask()),
        nb_mask=as_j(dims.nb_mask()), ng_mask=as_j(dims.ng_mask()),
    )
    return tdef, dims, qp


def _batched(qp, B=1024):
    qpb = pbatch.broadcast_qp(qp, B)
    rng = np.random.default_rng(0)
    return dataclasses.replace(
        qpb,
        b=qpb.b
        * jnp.asarray(
            1 + 0.02 * rng.standard_normal(B), qp.b.dtype
        )[:, None, None],
    )


@pytest.mark.parametrize("ng_nodes", [(), (0, 5)])
def test_tree_flat_matches_structured(interpret_pallas, ng_nodes):
    tdef, dims, qp = _tree_qp(ng_nodes=ng_nodes)
    qpb = _batched(qp)
    cfg = ipm.IPMConfig(k_max=3, mu_tol=1e-4)

    sol_f = jax.jit(
        lambda q: tree.solve_tree_ipm_flat(tdef, dims, q, cfg)
    )(qpb)
    sol_s = jax.jit(
        jax.vmap(lambda q: tree.solve_tree_ipm(tdef, dims, q, cfg))
    )(qpb)

    assert bool(jnp.all(sol_f.kk == sol_s.kk))
    np.testing.assert_allclose(
        np.asarray(sol_f.z), np.asarray(sol_s.z), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(sol_f.pi), np.asarray(sol_s.pi), atol=5e-3
    )
    # per-iteration stat trace rows agree (sigma, alphas, mus)
    np.testing.assert_allclose(
        np.asarray(sol_f.stat), np.asarray(sol_s.stat), atol=5e-4
    )


def test_solve_batched_tree_dispatch(interpret_pallas):
    """The batch-level dispatcher routes use_pallas to the flat engine and
    otherwise to the vmapped XLA path; both agree."""
    tdef, dims, qp = _tree_qp()
    qpb = _batched(qp)
    cfg_x = ipm.IPMConfig(k_max=3, mu_tol=1e-4)
    cfg_p = dataclasses.replace(cfg_x, use_pallas=True)
    sol_p = jax.jit(
        lambda q: pbatch.solve_batched_tree(tdef, dims, q, cfg_p)
    )(qpb)
    sol_x = jax.jit(
        lambda q: pbatch.solve_batched_tree(tdef, dims, q, cfg_x)
    )(qpb)
    assert bool(jnp.all(sol_p.kk == sol_x.kk))
    np.testing.assert_allclose(
        np.asarray(sol_p.z), np.asarray(sol_x.z), atol=5e-4
    )


def test_tree_flat_converges_deeper(interpret_pallas):
    """Branchier tree (md=2, Nr=2) run closer to convergence."""
    tdef, dims, qp = _tree_qp(md=2, Nr=2, Nh=4)
    qpb = _batched(qp)
    cfg = ipm.IPMConfig(k_max=12, mu_tol=1e-5, reg_eps=1e-6)
    sol = jax.jit(
        lambda q: tree.solve_tree_ipm_flat(tdef, dims, q, cfg)
    )(qpb)
    assert bool(jnp.all(sol.status == 0)), np.asarray(sol.status)
    # KKT residuals of the converged batch are small
    assert float(jnp.max(sol.inf_norm_res[:, 3])) < 1e-5
