"""Pallas TPU kernels: fused batched TREE Riccati sweeps.

Tree twin of :mod:`.stage_kernel` — the same lanes-batched fused-sweep
design (1024 instances per grid block as (8, 128) f32 tiles, whole sweep in
ONE kernel, intermediates in VMEM) applied to the scenario-tree recursion
of ``lqcp_solvers/d_tree_back_ric_rec_libstr.c:42-704``.

Topology handling.  Nodes are numbered breadth-first (``models/tree.py``),
so ``dad[k] < k`` and *reverse id order is a valid reverse-topological
order*: the backward sweep runs the Pallas grid's (sequential) minor
dimension over nodes ``n-1 .. 0`` and the forward sweep over ``0 .. n-1``.
Unlike the chain, a node's children are not at a fixed grid offset, so the
parent-child coupling cannot ride the block index maps; instead

  * the backward sweeps accumulate each child's contribution
    (``W W' = F L_xx (F L_xx)'`` and ``F (P b + p)``) into a PER-NODE VMEM
    accumulator slab, indexed dynamically with the parent id read from an
    SMEM ``dad`` table (the reference walks ``tree[ii].dad`` the same way,
    ``d_tree_back_ric_rec_libstr.c:120``);
  * the forward sweep keeps every solved node ``z`` in a VMEM slab and
    fetches the parent's ``z`` by dynamic index.

VMEM budget: the backward accumulator is ``n_nodes * (NT + NZ)`` subtiles
(NT = NZ(NZ+1)/2) — 9.5 MB at n=31, NZ=11 — which bounds the supported
tree size under the scoped-VMEM budget the kernels request
(``stage_kernel.pcall``, default 100 MiB: ~240 nodes at NZ=11, covering
the reference's tree benchmark scales incl. md=2 Nr=3 Nh=8 = 71 nodes).
Past that, LARGE-TREE mode keeps the accumulator in HBM (an ANY-space
buffer streamed through two VMEM line buffers with explicit DMAs, see
``_tree_bwd_kernel`` ``hbm_acc``) — the cap rises ~(NZ+3)/2 x toward the
reference's arbitrary-tree contract (``include/tree.h:34-44``); even
larger trees take the level-batched XLA path (``models/tree.py``).

Edge/node array conventions follow models/tree.py: node arrays have
n_nodes rows; edge e carries the dynamics INTO node e+1 (F[e], b[e]), so
shapes match the chain layout and the chain's flat IPM loop state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stage_kernel import (
    BI, LANES, SUBS, pcall,
    _chol, _dinv_ll, _mat, _mat_sym, _pb_of, _pi_of_x, _root_x0,
    _sym_idx, _sym_nt, _to_lanes_flat, _from_lanes_flat,
    _store_vec, _tril_solve, _triu_solve_t, _u_of_x, _vec,
)


def _tree_vmem_limit() -> int:
    """Dispatch ceiling for the backward-sweep accumulator.

    Tracks the scoped-VMEM budget ``stage_kernel.pcall``'s auto policy
    may grant (``HPMPC_VMEM_LIMIT_MB`` pins it; auto allows up to
    ~112 MiB on a 128 MiB-VMEM v5e), keeping 25% headroom for the
    per-step stream blocks and pipeline double-buffers.  At NZ=11 this
    admits ~270 nodes — past the reference's own tree benchmark scales
    (md=2 Nr=3 Nh=8 -> 71 nodes,
    ``test_problems/test_d_tree_ip_hard_libstr.c:61-66``).  Used by BOTH
    the batch dispatcher and the front-door assert so they stay in
    lockstep."""
    from .stage_kernel import _vmem_cap

    return int(0.75 * _vmem_cap())


def tree_vmem_accumulator_bytes(n_nodes: int, NZ: int) -> int:
    """Backward-sweep accumulator footprint — the dispatch guard."""
    return n_nodes * (_sym_nt(NZ) + NZ) * SUBS * LANES * 4


def tree_fits_fused(n_nodes: int, NZ: int) -> bool:
    """VMEM-resident backward accumulator fits (~270 nodes at NZ=11)."""
    return tree_vmem_accumulator_bytes(n_nodes, NZ) <= _tree_vmem_limit()


def tree_fits_fused_hbm(n_nodes: int, NZ: int) -> bool:
    """LARGE-TREE fused mode: the backward accumulator streams through
    HBM (``_tree_bwd_kernel`` hbm_acc), so only the z-sized slabs of the
    forward/trs/residual kernels grow with n — the node cap rises
    ~(NZ+3)/2 x (~2000 nodes at NZ=11).  Opt-in on hardware via
    ``HPMPC_TREE_HBM=1`` until real-Mosaic DMA lowering is validated
    (tools/check_tree_hbm_tpu.py); interpret parity in
    tests/test_tree_flat.py."""
    z_slab = n_nodes * NZ * SUBS * LANES * 4
    return z_slab <= _tree_vmem_limit()


def _slab_tiles(slab, count):
    """(1, count*SUBS, LANES) slab -> list of (SUBS, LANES) tiles."""
    return [slab[0, t * SUBS : (t + 1) * SUBS, :] for t in range(count)]


def _tiles_slab(tiles):
    """list of (SUBS, LANES) tiles -> (1, len*SUBS, LANES) slab."""
    return jnp.concatenate(tiles, axis=0)[None]


# ---------------------------------------------------------------------------
# backward factor+solve (tree sv, d_tree_back_ric_rec_libstr.c:42)
# ---------------------------------------------------------------------------


def _tree_bwd_kernel(NU, NX, NZ, n, ng_node_ids, hbm_acc,
                     dad_ref, H_ref, dvec_ref, ng_ref, g_ref, F_ref, b_ref,
                     Ll_ref, Lxx_ref, eu_ref, px_ref, Pb_ref,
                     *acc_refs):
    s = pl.program_id(1)
    bblk = pl.program_id(0)  # batch block (careful: `bb` is the local
    # name of the b-vector tiles inside the parent-contribution block)
    k = n - 1 - s  # node id this step (reverse-BFS)
    NT = _sym_nt(NZ)
    NTOT = NT + NZ

    if hbm_acc:
        # LARGE-TREE mode: the per-node accumulator lives in HBM (an
        # ANY-space output buffer, one row per node) and is streamed
        # through two VMEM line buffers with explicit DMAs — the VMEM
        # footprint stops growing with n, lifting the fused path's node
        # cap ~(NZ+3)/2 x (the remaining n-proportional slabs hold NZ
        # subtiles/node instead of NT+NZ).  The grid's minor dimension
        # is sequential on TPU, so child RMWs always land before the
        # parent's read.
        acc_any, bufk, bufd, sem = acc_refs
    else:
        (acc_ref,) = acc_refs

    @pl.when(s == 0)
    def _():
        if hbm_acc:
            bufk[...] = jnp.zeros_like(bufk)
            for r in range(n):
                cp = pltpu.make_async_copy(
                    bufk, acc_any.at[bblk, pl.ds(r, 1)], sem)
                cp.start()
                cp.wait()
        else:
            acc_ref[...] = jnp.zeros_like(acc_ref)

    # effective Hessian: packed symmetric H + diagonal barrier fold +
    # (masked) general-constraint term, exactly as the chain folded kernel
    Hp = [H_ref[0, 0, t] for t in range(NT)]
    dv = _vec(dvec_ref, NZ)
    for i in range(NZ):
        di = _sym_idx(i, i)
        Hp[di] = Hp[di] + dv[i]
    if len(ng_node_ids):
        node_match = None
        for nid in ng_node_ids:
            m = (k == nid)
            node_match = m if node_match is None else (node_match | m)
        for t in range(NT):
            Hp[t] = Hp[t] + jnp.where(node_match, ng_ref[0, 0, t], 0.0)
    g = _vec(g_ref, NZ)

    # children contributions accumulated at this node's slab (zero for
    # leaves: the whole accumulator is zeroed at s == 0 above)
    if hbm_acc:
        cpk = pltpu.make_async_copy(
            acc_any.at[bblk, pl.ds(k, 1)], bufk, sem)
        cpk.start()
        cpk.wait()
        slab = bufk[...]
    else:
        slab = acc_ref[pl.ds(k, 1), :, :]
    accM = _slab_tiles(slab, NTOT)
    M = [
        [Hp[_sym_idx(max(i, j), min(i, j))]
         + accM[_sym_idx(max(i, j), min(i, j))]
         for j in range(NZ)]
        for i in range(NZ)
    ]
    m = [g[i] + accM[NT + i] for i in range(NZ)]

    Lf, Dinv = _chol(M, NZ)
    eu = _tril_solve(
        [[Lf[i][j] for j in range(NU)] for i in range(NU)],
        Dinv[:NU], m[:NU], NU,
    )
    px = []
    for i in range(NX):
        acc = m[NU + i]
        for kk in range(NU):
            acc = acc - Lf[NU + i][kk] * eu[kk]
        px.append(acc)

    for i in range(NZ):
        for j in range(NU):
            Ll_ref[0, 0, i, j] = Lf[i][j]
    for i in range(NX):
        for j in range(NX):
            Lxx_ref[0, 0, i, j] = Lf[NU + i][NU + j]
    _store_vec(eu_ref, eu)
    _store_vec(px_ref, px)

    # contribution through the incoming edge to the parent (root has none;
    # skipping the store also keeps the clipped Pb block from being
    # clobbered by a dead root write — grid order is leaves -> root here)
    @pl.when(s != n - 1)
    def _():
        F = _mat(F_ref, NZ, NX)
        bb = _vec(b_ref, NX)
        Lxx = [[Lf[NU + i][NU + j] for j in range(NX)] for i in range(NX)]
        W = [[None] * NX for _ in range(NZ)]
        for i in range(NZ):
            for j in range(NX):
                acc = None
                for kk in range(j, NX):
                    t = F[i][kk] * Lxx[kk][j]
                    acc = t if acc is None else acc + t
                W[i][j] = acc
        Pb = _pb_of(Lxx, bb, NX)
        _store_vec(Pb_ref, Pb)
        # packed W W' and gradient term, one RMW on the parent's slab
        tiles = []
        for i in range(NZ):
            for j in range(i + 1):
                acc = None
                for kk in range(NX):
                    t = W[i][kk] * W[j][kk]
                    acc = t if acc is None else acc + t
                tiles.append(acc)
        for i in range(NZ):
            acc = None
            for kk in range(NX):
                t = F[i][kk] * (Pb[kk] + px[kk])
                acc = t if acc is None else acc + t
            tiles.append(acc)
        contrib = _tiles_slab(tiles)
        dadk = dad_ref[0, k]
        if hbm_acc:
            cpd = pltpu.make_async_copy(
                acc_any.at[bblk, pl.ds(dadk, 1)], bufd, sem)
            cpd.start()
            cpd.wait()
            bufd[...] = bufd[...] + contrib
            cpw = pltpu.make_async_copy(
                bufd, acc_any.at[bblk, pl.ds(dadk, 1)], sem)
            cpw.start()
            cpw.wait()
        else:
            acc_ref[pl.ds(dadk, 1), :, :] = (
                acc_ref[pl.ds(dadk, 1), :, :] + contrib)


# ---------------------------------------------------------------------------
# forward recovery (root -> leaves, z of the parent fetched from VMEM)
# ---------------------------------------------------------------------------


def _tree_fwd_kernel(NU, NX, NZ, n, want_pi,
                     dad_ref, Ll_ref, Lxx_ref, eu_ref, px_ref, F_ref, b_ref,
                     *out_refs):
    if want_pi:
        z_ref, pi_ref, zs_ref = out_refs
    else:
        z_ref, zs_ref = out_refs
    s = pl.program_id(1)  # node id this step (BFS order: parents first)

    Ll = _mat(Ll_ref, NZ, NU)
    Lxx = _mat(Lxx_ref, NX, NX)
    Dinv_u = _dinv_ll(Ll, NU)
    eu = _vec(eu_ref, NU)
    px = _vec(px_ref, NX)

    def emit(x):
        """u from x, then z out + z slab + pi of the incoming edge
        (pi block is clipped at the root: dead write, overwritten at
        s == 1 before copy-out — grid order root -> leaves)."""
        u = _u_of_x(NU, NX, Ll, Dinv_u, eu, x)
        for i in range(NU):
            z_ref[0, 0, i] = u[i]
        for i in range(NX):
            z_ref[0, 0, NU + i] = x[i]
        zs_ref[pl.ds(s, 1), :, :] = _tiles_slab(u + x)
        if want_pi:
            # pi_e = Lxx_k (Lxx_k' x_k) + px_k   (edge INTO this node)
            _store_vec(pi_ref, _pi_of_x(NX, Lxx, px, x))

    @pl.when(s == 0)
    def _():
        # root: free/eliminated initial state
        emit(_root_x0(Lxx, px, NX))

    @pl.when(s != 0)
    def _():
        F = _mat(F_ref, NZ, NX)
        bb = _vec(b_ref, NX)
        dadk = dad_ref[0, s]
        zslab = zs_ref[pl.ds(dadk, 1), :, :]
        zd = _slab_tiles(zslab, NZ)
        x = []
        for j in range(NX):
            acc = bb[j]
            for i in range(NZ):
                acc = acc + F[i][j] * zd[i]
            x.append(acc)
        emit(x)


# ---------------------------------------------------------------------------
# retained-factor backward solve (tree trs, d_tree_back_ric_rec_libstr.c:309)
# ---------------------------------------------------------------------------


def _tree_trs_kernel(NU, NX, NZ, n,
                     dad_ref, Ll_ref, g_ref, F_ref, Pb_ref,
                     eu_ref, px_ref,
                     accm_ref):
    s = pl.program_id(1)
    k = n - 1 - s

    @pl.when(s == 0)
    def _():
        accm_ref[...] = jnp.zeros_like(accm_ref)

    Ll = _mat(Ll_ref, NZ, NU)
    g = _vec(g_ref, NZ)
    Dinv_u = _dinv_ll(Ll, NU)

    mslab = accm_ref[pl.ds(k, 1), :, :]
    accm = _slab_tiles(mslab, NZ)
    m = [g[i] + accm[i] for i in range(NZ)]

    eu = _tril_solve(
        [[Ll[i][j] for j in range(NU)] for i in range(NU)], Dinv_u, m[:NU], NU
    )
    px = []
    for i in range(NX):
        acc = m[NU + i]
        for kk in range(NU):
            acc = acc - Ll[NU + i][kk] * eu[kk]
        px.append(acc)
    _store_vec(eu_ref, eu)
    _store_vec(px_ref, px)

    @pl.when(s != n - 1)
    def _():
        F = _mat(F_ref, NZ, NX)
        Pb = _vec(Pb_ref, NX)
        tiles = []
        for i in range(NZ):
            acc = None
            for kk in range(NX):
                t = F[i][kk] * (Pb[kk] + px[kk])
                acc = t if acc is None else acc + t
            tiles.append(acc)
        dadk = dad_ref[0, k]
        accm_ref[pl.ds(dadk, 1), :, :] = accm_ref[pl.ds(dadk, 1), :, :] + _tiles_slab(tiles)


# ---------------------------------------------------------------------------
# residual matvec terms (tree twin of _resid_kernel; BFS order so the
# parent z is in the VMEM slab before any child needs it)
# ---------------------------------------------------------------------------


def _tree_resid_kernel(NZ, NX, n,
                       dad_ref, H_ref, F_ref, z_ref, pi_ref,
                       hz_ref, fz_ref, fpi_ref, zs_ref):
    s = pl.program_id(1)  # node id

    H = _mat_sym(H_ref, NZ)  # packed symmetric stream
    z = _vec(z_ref, NZ)
    zs_ref[pl.ds(s, 1), :, :] = _tiles_slab(list(z))

    hz = []
    for i in range(NZ):
        acc = H[i][0] * z[0]
        for j in range(1, NZ):
            acc = acc + H[i][j] * z[j]
        hz.append(acc)
    _store_vec(hz_ref, hz)

    # incoming edge e = k-1 (dead clipped writes at s == 0, overwritten at
    # s == 1 before copy-out): fz_e = F_e' z_dad, fpi_e = F_e pi_e
    F = _mat(F_ref, NZ, NX)
    piv = _vec(pi_ref, NX)
    dadk = jnp.maximum(dad_ref[0, s], 0)
    zslab = zs_ref[pl.ds(dadk, 1), :, :]
    zd = _slab_tiles(zslab, NZ)

    fz = []
    for x in range(NX):
        acc = F[0][x] * zd[0]
        for j in range(1, NZ):
            acc = acc + F[j][x] * zd[j]
        fz.append(acc)
    _store_vec(fz_ref, fz)

    fpi = []
    for i in range(NZ):
        acc = F[i][0] * piv[0]
        for x in range(1, NX):
            acc = acc + F[i][x] * piv[x]
        fpi.append(acc)
    _store_vec(fpi_ref, fpi)


# ---------------------------------------------------------------------------
# host-side wrappers (flat-state contracts of stage_kernel's flat family)
# ---------------------------------------------------------------------------


def _dad_smem_spec(n):
    return pl.BlockSpec(
        (1, n), lambda bb, s: (0, 0), memory_space=pltpu.SMEM
    )


@functools.partial(
    jax.jit, static_argnames=("ng_node_ids", "NU", "NZ", "NX", "want_pi")
)
def tree_factor_solve_flat(dad_arr, Hl, dvecF, ngl, ng_node_ids, gF, Fl, bF,
                           NU, NZ, NX, want_pi=True):
    """Flat-state fused tree sv.  dad_arr (1, n) int32; Hl
    (nb, n, NZ(NZ+1)/2, 8, 128) packed symmetric lanes stream; Fl
    (nb, n-1, NZ, NX, 8, 128) edge stream; dvecF/gF (B, n*NZ); bF
    (B, (n-1)*NX); ngl (nb, max(n_ng,1), NT, 8, 128).

    Returns (zF, piF, fstate) with fstate = (Ll_l, Lxx_l, Pb_l)."""
    nb = Hl.shape[0]
    B = nb * BI
    n = Hl.shape[1]
    NE = n - 1
    dt = Hl.dtype
    NT = _sym_nt(NZ)
    assert Hl.shape[2] == NT, "Hl must be sym-packed (see sym_compress)"

    dl = _to_lanes_flat(dvecF, B, (n, NZ))
    gl = _to_lanes_flat(gF, B, (n, NZ))
    bl = _to_lanes_flat(bF, B, (NE, NX))

    def ng_slot(s):
        slot = 0
        for j, nid in enumerate(ng_node_ids):
            slot = jnp.where((n - 1 - s) == nid, j, slot)
        return slot

    in_specs = [
        _dad_smem_spec(n),
        pl.BlockSpec((1, 1, NT, SUBS, LANES), lambda bb, s: (bb, n - 1 - s, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, n - 1 - s, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NT, SUBS, LANES), lambda bb, s: (bb, ng_slot(s), 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, n - 1 - s, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(n - 2 - s, 0, NE - 1), 0, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(n - 2 - s, 0, NE - 1), 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, NZ, NU, SUBS, LANES), lambda bb, s: (bb, n - 1 - s, 0, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, NX, SUBS, LANES), lambda bb, s: (bb, n - 1 - s, 0, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NU, SUBS, LANES), lambda bb, s: (bb, n - 1 - s, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, n - 1 - s, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(n - 2 - s, 0, NE - 1), 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    # accumulator placement: VMEM-resident slab while it fits the scoped
    # budget; past that, an HBM (ANY-space) buffer streamed through VMEM
    # line buffers with explicit DMAs (see _tree_bwd_kernel)
    hbm_acc = not tree_fits_fused(n, NZ)
    NTOT = _sym_nt(NZ) + NZ
    out_shape = [
        jax.ShapeDtypeStruct((nb, n, NZ, NU, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, n, NX, NX, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, n, NU, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, n, NX, SUBS, LANES), dt),
        jax.ShapeDtypeStruct((nb, NE, NX, SUBS, LANES), dt),
    ]
    if hbm_acc:
        out_specs = out_specs + [
            pl.BlockSpec(memory_space=pl.ANY)]
        out_shape = out_shape + [
            jax.ShapeDtypeStruct((nb, n, NTOT * SUBS, LANES), dt)]
        scratch = [
            pltpu.VMEM((1, NTOT * SUBS, LANES), dt),
            pltpu.VMEM((1, NTOT * SUBS, LANES), dt),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        scratch = [pltpu.VMEM((n, NTOT * SUBS, LANES), dt)]
    kernel = functools.partial(
        _tree_bwd_kernel, NU, NX, NZ, n, tuple(ng_node_ids), hbm_acc
    )
    outs = pcall(
        kernel,
        grid=(nb, n),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(dad_arr, Hl, dl, ngl, gl, Fl, bl)
    Ll_l, Lxx_l, eu_l, px_l, Pb_l = outs[:5]

    zF, piF = _tree_forward_from_lanes(
        dad_arr, Ll_l, Lxx_l, eu_l, px_l, Fl, bl, B, n, NU, NZ, NX,
        want_pi=want_pi,
    )
    return zF, piF, (Ll_l, Lxx_l, Pb_l)


def _tree_forward_from_lanes(dad_arr, Ll_l, Lxx_l, eu_l, px_l, Fl, bl,
                             B, n, NU, NZ, NX, want_pi=True):
    nb = B // BI
    NE = n - 1
    dt = Ll_l.dtype
    fkernel = functools.partial(_tree_fwd_kernel, NU, NX, NZ, n, want_pi)
    if want_pi:
        lxx_map = lambda bb, s: (bb, s, 0, 0, 0, 0)
        out_specs = [
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(s - 1, 0, NE - 1), 0, 0, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((nb, n, NZ, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, NE, NX, SUBS, LANES), dt),
        ]
    else:
        # affine solve: pi dead -> Lxx only feeds the root solve (block 0)
        lxx_map = lambda bb, s: (bb, 0, 0, 0, 0, 0)
        out_specs = [
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((nb, n, NZ, SUBS, LANES), dt),
        ]
    outs = pcall(
        fkernel,
        grid=(nb, n),
        in_specs=[
            _dad_smem_spec(n),
            pl.BlockSpec((1, 1, NZ, NU, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, NX, SUBS, LANES), lxx_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NU, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(s - 1, 0, NE - 1), 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(s - 1, 0, NE - 1), 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((n, NZ * SUBS, LANES), dt)],
    )(dad_arr, Ll_l, Lxx_l, eu_l, px_l, Fl, bl)

    if want_pi:
        z_l, pi_l = outs
        return _from_lanes_flat(z_l, B), _from_lanes_flat(pi_l, B)
    (z_l,) = outs if isinstance(outs, (list, tuple)) else (outs,)
    return _from_lanes_flat(z_l, B), None


@functools.partial(jax.jit, static_argnames=("NU", "NZ", "NX"))
def tree_solve_flat(dad_arr, Ll_l, Lxx_l, Pb_l, gF, Fl, bF, NU, NZ, NX):
    """Flat-state fused tree trs with the retained lanes factor + cached
    Pb (the reference compute_Pb=0 path)."""
    nb = Ll_l.shape[0]
    B = nb * BI
    n = Ll_l.shape[1]
    NE = n - 1
    dt = Ll_l.dtype

    gl = _to_lanes_flat(gF, B, (n, NZ))
    bl = _to_lanes_flat(bF, B, (NE, NX))

    kernel = functools.partial(_tree_trs_kernel, NU, NX, NZ, n)
    eu_l, px_l = pcall(
        kernel,
        grid=(nb, n),
        in_specs=[
            _dad_smem_spec(n),
            pl.BlockSpec((1, 1, NZ, NU, SUBS, LANES), lambda bb, s: (bb, n - 1 - s, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, n - 1 - s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(n - 2 - s, 0, NE - 1), 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(n - 2 - s, 0, NE - 1), 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, NU, SUBS, LANES), lambda bb, s: (bb, n - 1 - s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, n - 1 - s, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, n, NU, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, n, NX, SUBS, LANES), dt),
        ],
        scratch_shapes=[pltpu.VMEM((n, NZ * SUBS, LANES), dt)],
    )(dad_arr, Ll_l, gl, Fl, Pb_l)

    return _tree_forward_from_lanes(
        dad_arr, Ll_l, Lxx_l, eu_l, px_l, Fl, bl, B, n, NU, NZ, NX
    )


@functools.partial(jax.jit, static_argnames=("NZ", "NX"))
def tree_resid_terms_flat(dad_arr, Hl, Fl, zF, piF, NZ, NX):
    """hzF[b, k*NZ+i] = (H_k z_k)_i              for nodes k
    fzF[b, e*NX+x] = (F_e' z_{dad(e+1)})_x       for edges e
    fpiF[b, e*NZ+i] = (F_e pi_e)_i               for edges e (EDGE-major;
    the caller scatters to dad rows with a 0/1 selection matmul)."""
    nb = Hl.shape[0]
    B = nb * BI
    n = Hl.shape[1]
    NE = n - 1
    dt = Hl.dtype
    NT = _sym_nt(NZ)
    assert Hl.shape[2] == NT, "Hl must be sym-packed (see sym_compress)"

    zl = _to_lanes_flat(zF, B, (n, NZ))
    pil = _to_lanes_flat(piF, B, (NE, NX))

    kernel = functools.partial(_tree_resid_kernel, NZ, NX, n)
    hz_l, fz_l, fpi_l = pcall(
        kernel,
        grid=(nb, n),
        in_specs=[
            _dad_smem_spec(n),
            pl.BlockSpec((1, 1, NT, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(s - 1, 0, NE - 1), 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(s - 1, 0, NE - 1), 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NX, SUBS, LANES), lambda bb, s: (bb, jnp.clip(s - 1, 0, NE - 1), 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NZ, SUBS, LANES), lambda bb, s: (bb, jnp.clip(s - 1, 0, NE - 1), 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, n, NZ, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, NE, NX, SUBS, LANES), dt),
            jax.ShapeDtypeStruct((nb, NE, NZ, SUBS, LANES), dt),
        ],
        scratch_shapes=[pltpu.VMEM((n, NZ * SUBS, LANES), dt)],
    )(dad_arr, Hl, Fl, zl, pil)

    hzF = _from_lanes_flat(hz_l, B)
    fzF = _from_lanes_flat(fz_l, B)
    fpiF = _from_lanes_flat(fpi_l, B)
    return hzF, fzF, fpiF
