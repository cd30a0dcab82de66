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
from hpmpc_tpu.utils.mass_spring import mass_spring_tree_qp


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    yield


def _tree_qp(**kw):
    return mass_spring_tree_qp(**kw)


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


def test_tree_flat_warm_start(interpret_pallas):
    """Warm start rides the fused engine (VERDICT r3 #7: the old
    ``not cfg.warm_start`` gate dropped closed-loop tree-RTI re-solves to
    the level-batched XLA route).  Seeding with a prior solution must (a)
    stay on the flat engine, (b) agree with the warm-started structured
    route iterate-for-iterate, (c) converge at least as fast as cold."""
    tdef, dims, qp = _tree_qp()
    qpb = _batched(qp)
    cfg_cold = ipm.IPMConfig(k_max=6, mu_tol=1e-5, use_pallas=True)
    sol_cold = jax.jit(
        lambda q: pbatch.solve_batched_tree(tdef, dims, q, cfg_cold)
    )(qpb)

    cfg_w = dataclasses.replace(cfg_cold, warm_start=True, k_max=4)
    sol_w = jax.jit(
        lambda q, z, p: pbatch.solve_batched_tree(
            tdef, dims, q, cfg_w, z0=z, pi0=p)
    )(qpb, sol_cold.z, sol_cold.pi)

    cfg_wx = dataclasses.replace(cfg_w, use_pallas=False)
    sol_wx = jax.jit(
        jax.vmap(lambda q, z, p: tree.solve_tree_ipm(
            tdef, dims, q, cfg_wx, z0=z, pi0=p))
    )(qpb, sol_cold.z, sol_cold.pi)

    assert bool(jnp.all(sol_w.kk == sol_wx.kk))
    np.testing.assert_allclose(
        np.asarray(sol_w.z), np.asarray(sol_wx.z), atol=5e-4
    )
    # warm re-solve from the converged point needs fewer iterations than
    # the cold solve took
    assert int(jnp.max(sol_w.kk)) <= int(jnp.max(sol_cold.kk))


def test_tree_flat_71_nodes(interpret_pallas):
    """Reference tree-benchmark scale (md=2 Nr=3 Nh=10 -> 71 nodes,
    ``test_problems/test_d_tree_ip_hard_libstr.c:61-66``): the fused
    path must stay on and agree with the structured route — the old
    16 MiB scoped-VMEM accumulator ceiling capped the fused kernels at
    ~40 nodes; the raised ``pcall`` budget admits ~240."""
    from hpmpc_tpu.ops import tree_kernel as tk

    tdef, dims, qp = _tree_qp(md=2, Nr=3, Nh=10)
    assert tdef.n_nodes == 71
    assert tk.tree_fits_fused(tdef.n_nodes, dims.NZ)
    qpb = _batched(qp)
    cfg = ipm.IPMConfig(k_max=2, mu_tol=1e-4, use_pallas=True)

    sol_f = jax.jit(
        lambda q: pbatch.solve_batched_tree(tdef, dims, q, cfg)
    )(qpb)
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    sol_s = jax.jit(
        jax.vmap(lambda q: tree.solve_tree_ipm(tdef, dims, q, cfg_x))
    )(qpb)
    assert bool(jnp.all(sol_f.kk == sol_s.kk))
    np.testing.assert_allclose(
        np.asarray(sol_f.z), np.asarray(sol_s.z), atol=5e-4
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


def test_tree_flat_hbm_accumulator_matches_vmem(interpret_pallas,
                                                monkeypatch):
    """LARGE-TREE mode (VERDICT r3 #7): the backward accumulator streamed
    through HBM with explicit DMAs must reproduce the VMEM-resident slab
    path BIT-FOR-BIT (same arithmetic, different placement).  Forced here
    by shrinking the VMEM gate; the dispatcher picks it automatically on
    trees past the VMEM cap when HPMPC_TREE_HBM=1."""
    from hpmpc_tpu.ops import tree_kernel as tk

    tdef, dims, qp = _tree_qp()
    qpb = _batched(qp)
    cfg = ipm.IPMConfig(k_max=3, mu_tol=1e-4)

    sol_vmem = jax.jit(
        lambda q: tree.solve_tree_ipm_flat(tdef, dims, q, cfg)
    )(qpb)

    monkeypatch.setattr(tk, "tree_fits_fused", lambda n, NZ: False)
    # the wrapper is jitted with static args only — drop its cache so the
    # patched gate actually retraces the HBM variant
    tk.tree_factor_solve_flat.clear_cache()
    sol_hbm = jax.jit(
        lambda q: tree.solve_tree_ipm_flat(tdef, dims, q, cfg)
    )(qpb)

    np.testing.assert_array_equal(np.asarray(sol_hbm.z),
                                  np.asarray(sol_vmem.z))
    np.testing.assert_array_equal(np.asarray(sol_hbm.kk),
                                  np.asarray(sol_vmem.kk))
    np.testing.assert_array_equal(np.asarray(sol_hbm.stat),
                                  np.asarray(sol_vmem.stat))
