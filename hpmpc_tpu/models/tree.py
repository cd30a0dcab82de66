"""Scenario-tree robust MPC: tree Riccati recursion + tree IPM.

TPU-native re-design of the reference's tree solvers
(``lqcp_solvers/d_tree_back_ric_rec_libstr.c:42-704``,
``mpc_solvers/d_tree_ip2_res_hard_libstr.c:80``, node structure
``include/tree.h:34-44``).  The reference walks nodes sequentially
(children -> parent); here every DEPTH LEVEL is processed as one batched
step — all node factorizations/solves of a level run as a single batched
Cholesky/matmul, which is both idiomatic JAX and faster on the MXU.

Representation: nodes 0..n_nodes-1 in breadth-first order (root = 0); node
arrays reuse the :class:`~..ocp.OCPQP` container with axis 0 = nodes
(``H/g/constraints`` per node) and EDGE data ``F[e]/b[e]`` on the edge
``dad(e+1) -> e+1`` (edge e corresponds to node e+1, so the shapes match
the chain layout: n_nodes = dims.N + 1 node rows, dims.N edge rows).  The
per-level node index lists are static (baked into the jitted program), so
the level loop unrolls.

Backward sweep per node (same per-node core as the chain,
``d_tree_back_ric_rec_libstr.c:79-264``):

    M_n = H_n + sum_{children c} W_c W_c',   W_c = F_c Lxx_c
    m_n = g_n + sum_{children c} F_c (P_c b_c + p_c)
    L_n = chol(M_n)

Forward sweep root -> leaves; equality multipliers per edge.

The tree IPM is the SAME two-phase Mehrotra algorithm as the chain solver:
:func:`solve_tree_ipm` injects a tree :class:`~.ipm.KKTBackend` into
``ipm.solve`` — constraint handling, step primitives, stat trace and exit
conditions are shared code.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ocp import OCPDims, OCPQP
from ..ops.tri import cholesky, solve_tril, solve_triu
from . import ipm

_HI = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class TreeDef:
    """Static tree topology (hashable; safe as a jit static argument).

    dad[k] = parent of node k (dad[0] = -1); nodes are breadth-first so
    every parent index is smaller than its children's.
    """

    dad: tuple

    @property
    def n_nodes(self) -> int:
        return len(self.dad)

    @property
    def depth(self) -> tuple:
        d = [0] * self.n_nodes
        for k in range(1, self.n_nodes):
            d[k] = d[self.dad[k]] + 1
        return tuple(d)

    @property
    def levels(self) -> tuple:
        """tuple of tuples: node ids per depth, shallow -> deep."""
        dep = self.depth
        nlev = max(dep) + 1
        lev = [[] for _ in range(nlev)]
        for k, d in enumerate(dep):
            lev[d].append(k)
        return tuple(tuple(l) for l in lev)

    @staticmethod
    def from_md_nr_nh(md: int, Nr: int, Nh: int) -> "TreeDef":
        """The reference's ``setup_tree(md, Nr, Nh)``
        (``test_problems/test_d_tree_ric_libstr.c:61-93``): md-way branching
        for the first Nr stages, then single chains out to depth Nh.
        Node count: (Nh-Nr) md^Nr + (md^{Nr+1}-1)/(md-1) for md>1."""
        dad = [-1]
        frontier = [0]
        for d in range(Nh):
            new_frontier = []
            for p in frontier:
                n_child = md if d < Nr else 1
                for _ in range(n_child):
                    dad.append(p)
                    new_frontier.append(len(dad) - 1)
            frontier = new_frontier
        return TreeDef(dad=tuple(dad))


class TreeFactor(NamedTuple):
    L: jax.Array  # (n_nodes, NZ, NZ)
    eu: jax.Array  # (n_nodes, NU) pre-solved u gradients
    px: jax.Array  # (n_nodes, NX) value-function gradients
    Pb: jax.Array  # (n_edges, NX) cached P_c b_c per edge


def _level_arrays(tdef: TreeDef):
    levels = [np.asarray(l, dtype=np.int64) for l in tdef.levels]
    dad = np.asarray(tdef.dad, dtype=np.int64)
    return levels, dad


def tree_factor_solve(tdef: TreeDef, qp: OCPQP, H_eff, g_eff, rhs_b, NU):
    """Factorize + solve the tree KKT system (reference sv,
    ``d_tree_back_ric_rec_libstr.c:42``).  Level-batched.

    Returns (z, pi, factor) with z (n_nodes, NZ), pi (n_edges, NX) — the
    multiplier of the edge into node e+1 stored at pi[e] (chain layout).
    """
    n = tdef.n_nodes
    NZ = H_eff.shape[-1]
    NX = qp.F.shape[-1]
    dt = H_eff.dtype
    levels, dad = _level_arrays(tdef)

    S = jnp.zeros((n, NZ, NZ), dt)  # accumulated child syrk terms
    mg = jnp.zeros((n, NZ), dt)  # accumulated child gradient terms
    L = jnp.zeros((n, NZ, NZ), dt)
    eu = jnp.zeros((n, NU), dt)
    px = jnp.zeros((n, NZ - NU), dt)
    Pb = jnp.zeros((n - 1, NX), dt)

    # backward: deepest level first
    for lev in reversed(levels):
        M = H_eff[lev] + S[lev]
        m = g_eff[lev] + mg[lev]
        L_l = cholesky(M)
        eu_l = solve_tril(L_l[:, :NU, :NU], m[:, :NU, None])[..., 0]
        px_l = m[:, NU:] - jnp.einsum("kxu,ku->kx", L_l[:, NU:, :NU], eu_l)
        L = L.at[lev].set(L_l)
        eu = eu.at[lev].set(eu_l)
        px = px.at[lev].set(px_l)
        if lev[0] == 0:
            break  # root has no incoming edge
        # contributions to parents through the incoming edges
        edg = lev - 1
        Lxx = L_l[:, NU:, NU:]
        W = jnp.einsum("kzx,kxy->kzy", qp.F[edg], Lxx)  # F_c Lxx_c
        Pb_l = jnp.einsum(
            "kxy,ky->kx", Lxx, jnp.einsum("kyx,ky->kx", Lxx, rhs_b[edg])
        )
        Pb = Pb.at[edg].set(Pb_l)
        S_c = jnp.matmul(W, jnp.swapaxes(W, -1, -2), precision=_HI)
        m_c = jnp.einsum("kzx,kx->kz", qp.F[edg], Pb_l + px_l)
        S = S.at[dad[lev]].add(S_c)
        mg = mg.at[dad[lev]].add(m_c)

    return _tree_forward(tdef, qp, (L, eu, px, Pb), rhs_b, NU)


def tree_resolve(tdef: TreeDef, qp: OCPQP, factor: TreeFactor, g_eff, rhs_b, NU):
    """Solve with a retained factor for a new gradient (reference trs,
    ``d_tree_back_ric_rec_libstr.c:309``; Pb reused)."""
    n = tdef.n_nodes
    NZ = factor.L.shape[-1]
    dt = g_eff.dtype
    levels, dad = _level_arrays(tdef)
    L = factor.L

    mg = jnp.zeros((n, NZ), dt)
    eu = jnp.zeros((n, NU), dt)
    px = jnp.zeros((n, NZ - NU), dt)
    for lev in reversed(levels):
        m = g_eff[lev] + mg[lev]
        L_l = L[lev]
        eu_l = solve_tril(L_l[:, :NU, :NU], m[:, :NU, None])[..., 0]
        px_l = m[:, NU:] - jnp.einsum("kxu,ku->kx", L_l[:, NU:, :NU], eu_l)
        eu = eu.at[lev].set(eu_l)
        px = px.at[lev].set(px_l)
        if lev[0] == 0:
            break
        edg = lev - 1
        m_c = jnp.einsum("kzx,kx->kz", qp.F[edg], factor.Pb[edg] + px_l)
        mg = mg.at[dad[lev]].add(m_c)

    z, pi, _ = _tree_forward(
        tdef, qp, (L, eu, px, factor.Pb), rhs_b, NU
    )
    return z, pi


def _tree_forward(tdef: TreeDef, qp: OCPQP, fac, rhs_b, NU):
    L, eu, px, Pb = fac
    n = tdef.n_nodes
    NZ = L.shape[-1]
    NX = qp.F.shape[-1]
    dt = L.dtype
    levels, dad = _level_arrays(tdef)

    z = jnp.zeros((n, NZ), dt)
    pi = jnp.zeros((n - 1, NX), dt)

    # root: free (padded/eliminated) initial state, then u
    Lxx0 = L[0, NU:, NU:]
    x0 = -solve_triu(Lxx0.T, solve_tril(Lxx0, px[0]))
    u0 = -solve_triu(
        L[0, :NU, :NU].T, eu[0] + L[0, NU:, :NU].T @ x0
    )
    z = z.at[0, :NU].set(u0).at[0, NU:].set(x0)

    for lev in levels[1:]:
        edg = lev - 1
        z_dad = z[dad[lev]]
        x_l = rhs_b[edg] + jnp.einsum("kzx,kz->kx", qp.F[edg], z_dad)
        Lxx = L[lev][:, NU:, NU:]
        pi_l = (
            jnp.einsum(
                "kxy,ky->kx", Lxx, jnp.einsum("kyx,ky->kx", Lxx, x_l)
            )
            + px[lev]
        )
        u_l = -jax.vmap(lambda Luu, rhs: solve_triu(Luu.T, rhs))(
            L[lev][:, :NU, :NU],
            eu[lev] + jnp.einsum("kxu,kx->ku", L[lev][:, NU:, :NU], x_l),
        )
        z = z.at[lev, :NU].set(u_l)
        z = z.at[lev, NU:].set(x_l)
        pi = pi.at[edg].set(pi_l)

    return z, pi, TreeFactor(L=L, eu=eu, px=px, Pb=Pb)


def tree_residuals(tdef: TreeDef, qp: OCPQP, oh, mu_scal, z, pi, lam_b, t_b, lam_g, t_g, rhs_b):
    """Tree-topology KKT residuals (reference
    ``d_tree_res_ip_res_hard_libstr.c:66``): like the chain's but the
    stationarity couples each node to its children's edge multipliers and
    its own incoming edge; rb lives on edges (indexed by child node)."""
    n = tdef.n_nodes
    NU = qp.H.shape[-1] - qp.x_mask.shape[-1]
    _, dad = _level_arrays(tdef)
    mb, mg_ = qp.nb_mask, qp.ng_mask

    rq = qp.g * qp.z_mask + jnp.einsum("nzw,nw->nz", qp.H, z)
    # own incoming edge: -pi_e on the x part of node e+1 (root has none)
    rq = rq.at[1:, NU:].add(-pi)
    # children edges: + F_e pi_e accumulated at the parent
    contrib = jnp.einsum("kzx,kx->kz", qp.F, pi)
    rq = rq.at[dad[1:]].add(contrib)
    # inequality terms (same as chain)
    rq = rq + ipm._scatter_box(oh, (lam_b[:, 1] - lam_b[:, 0]) * mb)
    rq = rq + jnp.einsum("ngz,ng->nz", qp.C, (lam_g[:, 1] - lam_g[:, 0]) * mg_)
    rq = rq * qp.z_mask

    rb = (
        rhs_b + jnp.einsum("kzx,kz->kx", qp.F, z[dad[1:]]) - z[1:, NU:]
    ) * qp.x_mask[1:]

    zb = ipm._gather_box(oh, z)
    rd_b = jnp.stack(
        [qp.d_lb - zb + t_b[:, 0], qp.d_ub - zb - t_b[:, 1]], axis=1
    ) * mb[:, None, :]
    cz = ipm._cz(qp, z)
    rd_g = jnp.stack(
        [qp.d_lg + t_g[:, 0] - cz, qp.d_ug - t_g[:, 1] - cz], axis=1
    ) * mg_[:, None, :]
    rm_b = lam_b * t_b * mb[:, None, :]
    rm_g = lam_g * t_g * mg_[:, None, :]
    mu = (jnp.sum(rm_b) + jnp.sum(rm_g)) * mu_scal
    return ipm.Residuals(rq=rq, rb=rb, rd_b=rd_b, rd_g=rd_g, rm_b=rm_b, rm_g=rm_g, mu=mu)


def tree_backend(
    tdef: TreeDef, dims: OCPDims, qp: OCPQP, reg_eps: float = 0.0
) -> ipm.KKTBackend:
    """Build the tree KKTBackend for ipm.solve."""
    NU = dims.NU
    oh = ipm._box_onehot(qp)
    mu_scal = jnp.asarray(1.0 / max(dims.n_constr, 1), qp.dtype)
    ng_stages = tuple(n for n in range(dims.N + 1) if dims.ng[n] > 0)

    def factor_solve(Qx_b, Qx_g, g_eff, rhs_b):
        H_eff = ipm._build_Heff(
            qp, oh, Qx_b, Qx_g, reg=reg_eps, ng_stages=ng_stages
        )
        z, pi, fac = tree_factor_solve(tdef, qp, H_eff, g_eff, rhs_b, NU)
        return z, pi, (fac,)

    def resolve(fstate, g_eff, rhs_b):
        (fac,) = fstate
        return tree_resolve(tdef, qp, fac, g_eff, rhs_b, NU)

    def residuals(z, pi, lam_b, t_b, lam_g, t_g, rhs_b):
        return tree_residuals(
            tdef, qp, oh, mu_scal, z, pi, lam_b, t_b, lam_g, t_g, rhs_b
        )

    return ipm.KKTBackend(factor_solve=factor_solve, resolve=resolve, residuals=residuals)


def solve_tree_ipm(tdef: TreeDef, dims: OCPDims, qp: OCPQP,
                   cfg: ipm.IPMConfig, z0=None, pi0=None):
    """Tree IPM (``d_tree_ip2_res_mpc_hard_libstr``): the shared two-phase
    Mehrotra loop with the tree backend injected.

    ``dims`` must describe the NODE arrays: dims.N + 1 == n_nodes (the
    chain-specific fields nx/nu are per-node here; masks drive everything).

    ``z0`` (n_nodes, NZ) / ``pi0`` (n_nodes-1, NX) with ``cfg.warm_start``
    seed the iterate (the reference tree solver's ``warm_start`` argument,
    ``d_tree_ip2_res_hard_libstr.c:80``) — closed-loop tree-RTI re-solves
    start from the previous tick's node trajectory.
    """
    assert dims.N + 1 == tdef.n_nodes
    return ipm.solve(
        dims, qp, cfg, z0=z0, pi0=pi0,
        backend=tree_backend(tdef, dims, qp, reg_eps=cfg.reg_eps)
    )


def solve_tree_ipm_sharded(
    tdef: TreeDef, dims: OCPDims, qp: OCPQP, cfg: ipm.IPMConfig, mesh,
    axis: str = "node",
):
    """Shard ONE large tree's NODE axis across a device mesh (SURVEY §2.10
    tree axis — the third sharding axis, beyond batch and horizon).

    Every per-level operation of the tree Riccati and of the IPM's
    barrier/step math is data-parallel over the nodes of that level (the
    reference's own observation — ``d_tree_back_ric_rec_libstr.c`` nodes
    within a level are independent; it exploits it with OpenMP threads,
    we exploit it with a ``NamedSharding`` over the node axis), so a
    sharding constraint on the node-stacked arrays partitions the level
    work across devices and XLA inserts the parent-child combine
    collectives (the ``dad[lev]`` scatter-adds become cross-device
    reductions on ICI).

    Most effective for trees whose levels are wide (md^Nr scenarios wide
    after the robust horizon): the deepest levels — where almost all
    nodes live — split evenly; the thin levels near the root execute
    mostly on one device, which is the same critical path the reference
    has.  Returns the ordinary :class:`~.ipm.IPMSolution` over nodes.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = tdef.n_nodes

    def constrain(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] in (n, n - 1):
            spec = P(axis, *([None] * (x.ndim - 1)))
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, spec)
            )
        return x

    @jax.jit
    def run(q):
        q = jax.tree_util.tree_map(constrain, q)
        return solve_tree_ipm(tdef, dims, q, cfg)

    return run(qp)


# ---------------------------------------------------------------------------
# batched flat-state tree engine (TPU throughput path)
# ---------------------------------------------------------------------------


def _flat_tree_kkt_factory(tdef: TreeDef):
    """KKT-kernel backend for :func:`~.ipm_fast.solve_batched_flat`: swaps
    the chain's fused Pallas sweeps for the tree kernels
    (:mod:`~..ops.tree_kernel`) while reusing the flat engine's step /
    alpha / gating machinery — the flat-engine analogue of injecting
    :func:`tree_backend` into ``ipm.solve``."""

    def factory(dims, qp, kdt, ng_stages):
        import types

        from ..ops import stage_kernel as sk
        from ..ops import tree_kernel as tk

        n = tdef.n_nodes
        NE = n - 1
        NU, NX, NZ = dims.NU, dims.NX, dims.NZ
        B = qp.b.shape[0]
        _HIp = jax.lax.Precision.HIGHEST

        dad_arr = jnp.asarray(
            np.maximum(np.asarray(tdef.dad), 0).reshape(1, n), jnp.int32
        )
        Hl = sk._to_lanes(sk.sym_compress(qp.H.astype(kdt)), B)
        Fl = sk._to_lanes(qp.F.astype(kdt), B)

        # edge-major F_e pi_e terms -> dad-node rows of rq (0/1 selection
        # matmul: the tree twin of the chain's contiguous-slice add)
        mdad_np = np.zeros((NE * NZ, n * NZ), np.float32)
        for e in range(NE):
            d = tdef.dad[e + 1]
            for i in range(NZ):
                mdad_np[e * NZ + i, d * NZ + i] = 1.0
        Mdad = jnp.asarray(mdad_np, qp.dtype)

        def factor(dvecF, ngl, g_eff, rhs_bF):
            # affine pi is dead in the shared flat loop (iter_ref is
            # asserted off for tree): skip it + the Lxx forward stream
            return tk.tree_factor_solve_flat(
                dad_arr, Hl, dvecF, ngl, ng_stages, g_eff, Fl, rhs_bF,
                NU, NZ, NX, want_pi=False,
            )

        def resolve(fstate, g_eff, rhs_bF):
            Ll_l, Lxx_l, Pb_l = fstate
            return tk.tree_solve_flat(
                dad_arr, Ll_l, Lxx_l, Pb_l, g_eff, Fl, rhs_bF, NU, NZ, NX
            )

        def resid_terms(zF, piF):
            return tk.tree_resid_terms_flat(
                dad_arr, Hl, Fl, zF, piF, NZ, NX
            )

        def apply_fpi(rq, fpiF):
            return rq + jnp.dot(fpiF, Mdad, precision=_HIp)

        return types.SimpleNamespace(
            factor=factor, resolve=resolve,
            resid_terms=resid_terms, apply_fpi=apply_fpi,
        )

    return factory


def solve_tree_ipm_flat(
    tdef: TreeDef, dims: OCPDims, qp: OCPQP, cfg: ipm.IPMConfig,
    z0=None, pi0=None,
):
    """Batched tree IPM through the flat-state Pallas engine — the tree
    twin of ``parallel.batch``'s chain/soft fast paths.  ``qp`` leaves
    carry a leading batch axis (multiple of 1024); requires static
    ``dims.idxb``, f32 data, and a tree small enough for the backward
    accumulator to fit VMEM (~240 nodes at NZ=11 under the default
    100 MiB scoped budget — see
    ``ops/tree_kernel.tree_vmem_accumulator_bytes``)."""
    from ..ops import tree_kernel as tk
    from . import ipm_fast

    assert dims.N + 1 == tdef.n_nodes
    assert (tk.tree_fits_fused(tdef.n_nodes, dims.NZ)
            or tk.tree_fits_fused_hbm(tdef.n_nodes, dims.NZ)), (
        "tree too large even for the HBM-streamed fused kernels; use the "
        "level-batched XLA path (solve_tree_ipm)"
    )
    return ipm_fast.solve_batched_flat(
        dims, qp, cfg, kkt_factory=_flat_tree_kkt_factory(tdef),
        z0=z0, pi0=pi0,
    )
