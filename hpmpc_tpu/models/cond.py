"""Partial (N -> N2) and full (N -> 1) condensing of OCP QPs.

TPU-native re-design of the reference's condensing layer
(``lqcp_solvers/d_part_cond.c`` and ``d_cond.c``): the horizon is split into
N2 groups (the first ``R1 = N - N2*(N//N2)`` groups one stage longer,
``d_part_cond.c:699-701``); inside each group every state is expressed as an
affine function of the group's inputs and entry state through the "Gamma"
prefix maps (``d_cond_BAbt``, ``:214``), producing a shorter, denser QP:

  * condensed input vector, REVERSE time order (the reference's layout,
    visible in ``d_cond_BAbt:281-291`` where each new stage's inputs are
    stacked on top, and in the expand index math ``:1169-1177``):
    ``u2 = [u_{T-1}; ...; u_1; u_0]``, state ``x2 = x_{group start}``.
  * condensed cost: sum of stage costs composed with the affine maps
    (same quadratic as the reference's backward sweep in ``d_cond_RSQrq``,
    computed here as batched einsums instead of a Cholesky recursion).
  * constraints (``d_cond_DCtd:579``): input box constraints stay box
    constraints (indices remapped); *state* box constraints of interior
    stages become general constraints whose rows are Gamma columns, with
    bounds shifted by the constant term; stage general constraints compose
    with the affine maps.  Unlike the reference's lib4 path (which has
    "TODO general constraints"), interior-stage general constraints are
    fully supported here, matching the libstr variant
    (``d_part_cond_libstr.c:908``).

``expand_solution`` mirrors ``d_part_expand_solution`` (``:1103``): copy
inputs back, roll states forward through the dynamics, split multipliers,
and recover the interior equality multipliers by backward stationarity.

The group loop unrolls at trace time (N2 and group sizes are static); all
inner algebra is stacked jnp ops, so the whole condense -> IPM -> expand
pipeline jits, vmaps and shards like the direct solver.

FLOPS-CLASS DECISION (the reference carries three full-condensing
algorithms — N^3 nx^2 ``d_cond_R_N3_nx2`` (``d_cond.c:76``), N^2 nx^2
``d_cond_R_N2_nx2`` (``:239``), N^2 nx^3 ``d_cond_R_N2_nx3`` (``:483``) —
plus the fused condensing-factorization ``d_cond_fact_R_N2_nx2_permute``
(``:918``); this builder is the N^3-flops composition class, and that is
deliberate):

  * Measured (v5e, ``tools/validate_n2_model.py``, N=30 single instance,
    f32): the FULL condense build costs 1.14 ms, one-off, vs 2.5-4.8 ms
    per condensed IPM SOLVE (8 iterations re-using the build) — the build
    is ~25% of even the fastest strategy's end-to-end time and amortizes
    over every solve of an RTI/batch session (matrix data unchanged ->
    build once, ``condense_rhs`` per tick).
  * The N^2 recursions save flops by chaining Gamma_u_Q updates
    SEQUENTIALLY across stages — on TPU that replaces a handful of large
    batched MXU einsums (this builder's whole cost) with ~N dependent
    small-matrix steps, exactly the latency-bound shape the measured
    ``lat_floor`` above punishes; the arithmetic saved is at sizes where
    the MXU is idle anyway.
  * Golden parity for the fully-condensed problem vs ``d_cond_lqcp`` is
    at 1e-10 (``tests/test_cond.py::test_full_condensing_golden_lqcp``,
    which also documents two reference bugs in the N^2/gradient paths —
    dead code rot that is itself evidence those variants were abandoned).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ocp import OCPDims, OCPQP
from . import ipm


class CondPlan(NamedTuple):
    """Static metadata tying the condensed problem to the original one."""

    dims: OCPDims  # original
    dims2: OCPDims  # condensed
    N2: int
    group_start: tuple  # len N2, first original stage of each group
    group_T: tuple  # len N2, number of stages in each group
    # per-group constraint layout, parallel lists of
    # (local_stage, kind, *kind-specific) built in the same order the
    # condensed constraint slots were assigned:
    box_map: tuple  # ((g, slot2, stage, idx_logical), ...) box -> box
    gen_from_box: tuple  # ((g, row2, stage, idx_logical), ...) state box -> gen
    gen_from_gen: tuple  # ((g, row2, stage, row), ...) gen -> gen


def _groups(N: int, N2: int):
    N1 = N // N2
    R1 = N - N2 * N1
    M1 = N1 + 1 if R1 > 0 else N1
    start, Ts = [], []
    s = 0
    for g in range(N2):
        T = M1 if g < R1 else N1
        start.append(s)
        Ts.append(T)
        s += T
    assert s == N
    return tuple(start), tuple(Ts)


def plan(dims: OCPDims, N2: int) -> CondPlan:
    """Compute the condensed problem sizes and static constraint layout
    (``d_part_cond_compute_problem_size``, ``d_part_cond.c:694``)."""
    assert dims.idxb is not None, "condensing needs static idxb on OCPDims"
    assert 1 <= N2 <= dims.N
    N = dims.N
    # condense/expand copy group-boundary states and terminal cost at the
    # full padded width; non-uniform state sizes across the kept stages
    # would silently mispack (the reference's condensing is fixed-size
    # only, d_part_cond.c).  nx[0] < NX is fine (eliminated x0).
    if any(nxn != dims.NX for nxn in dims.nx[1:]):
        raise ValueError(
            "partial/full condensing requires a uniform state size on "
            f"stages 1..N (got nx={dims.nx}); pad the model or solve "
            "without condensing (N2=None)"
        )
    start, Ts = _groups(N, N2)

    nx2, nu2, nb2, ng2 = [], [], [], []
    box_map, gen_from_box, gen_from_gen = [], [], []
    idxb2 = []

    for g in range(N2):
        s, T = start[g], Ts[g]
        nx2.append(dims.nx[s])
        nu_g = sum(dims.nu[s : s + T])
        nu2.append(nu_g)
        # reversed-time offsets of each stage's inputs in u2
        off = {}
        acc = 0
        for k in range(T - 1, -1, -1):
            off[k] = acc
            acc += dims.nu[s + k]

        ib = 0
        ig = 0
        idxb2_g = []
        # interior stages first, from last to first (reference order,
        # d_cond_DCtd:637-668), then the first stage
        for k in range(T - 1, 0, -1):
            stg = s + k
            for j in range(dims.nb[stg]):
                idx = dims.idxb[stg][j]
                if idx < dims.nu[stg]:  # input box stays box
                    box_map.append((g, ib, stg, idx))
                    idxb2_g.append(off[k] + idx)
                    ib += 1
                else:  # state box becomes general
                    gen_from_box.append((g, ig, stg, idx))
                    ig += 1
        k = 0
        stg = s
        for j in range(dims.nb[stg]):
            idx = dims.idxb[stg][j]
            box_map.append((g, ib, stg, idx))
            # first stage: inputs at off[0], states at nu_g + (idx - nu)
            idxb2_g.append(
                off[0] + idx if idx < dims.nu[stg] else nu_g + (idx - dims.nu[stg])
            )
            ib += 1
        # general constraints, same stage order as the boxes-turned-general
        for k in range(T - 1, -1, -1):
            stg = s + k
            for j in range(dims.ng[stg]):
                gen_from_gen.append((g, ig, stg, j))
                ig += 1
        nb2.append(ib)
        ng2.append(ig)
        idxb2.append(tuple(idxb2_g))

    # terminal stage copies through
    nx2.append(dims.nx[N])
    nu2.append(dims.nu[N])
    nb2.append(dims.nb[N])
    ng2.append(dims.ng[N])
    idxb2.append(dims.idxb[N] if dims.idxb is not None else ())

    dims2 = OCPDims.create(N2, nx2, nu2, nb2, ng2, idxb=idxb2)
    return CondPlan(
        dims=dims,
        dims2=dims2,
        N2=N2,
        group_start=start,
        group_T=Ts,
        box_map=tuple(box_map),
        gen_from_box=tuple(gen_from_box),
        gen_from_gen=tuple(gen_from_gen),
    )


def _stage_maps(dims: OCPDims, qp: OCPQP, pl: CondPlan, g: int):
    """Affine maps z_k = Phi_k @ [u2; x2] + c_k for every stage k of group g,
    plus the end-of-group map (Gamma of the last stage).

    Phi_k: (NZ, NZ2) in padded coordinates; c_k: (NZ,).
    """
    dims2 = pl.dims2
    N, NU, NX, NZ = dims.N, dims.NU, dims.NX, dims.NZ
    NU2, NZ2 = dims2.NU, dims2.NZ
    s, T = pl.group_start[g], pl.group_T[g]
    dt = qp.dtype

    off = {}
    acc = 0
    for k in range(T - 1, -1, -1):
        off[k] = acc
        acc += dims.nu[s + k]

    # G maps x_k -> affine in [u2; x2]: x_k = Gx_k @ zeta + gc_k
    Gx = jnp.zeros((NX, NZ2), dt)
    # x_0 = x2 (identity on the x2 block, masked to real coords)
    Gx = Gx.at[:, NU2:].set(jnp.diag(qp.x_mask[s]))
    gc = jnp.zeros((NX,), dt)

    Phis, cs = [], []
    for k in range(T):
        stg = s + k
        Phi = jnp.zeros((NZ, NZ2), dt)
        # input rows: selector into u2 at reversed offset
        nu_k = dims.nu[stg]
        if nu_k:
            Phi = Phi.at[:nu_k, off[k] : off[k] + nu_k].set(jnp.eye(nu_k, dtype=dt))
        # state rows
        Phi = Phi.at[NU:, :].set(Gx)
        c = jnp.zeros((NZ,), dt).at[NU:].set(gc)
        Phis.append(Phi)
        cs.append(c)
        # propagate: x_{k+1} = F_k' z_k + b_k
        Ft = qp.F[stg].T  # (NX, NZ)
        Gx = jnp.matmul(Ft, Phi, precision=jax.lax.Precision.HIGHEST)
        gc = qp.b[stg] + Ft @ c
    return Phis, cs, Gx, gc


def condense(qp: OCPQP, pl: CondPlan) -> OCPQP:
    """Build the condensed OCPQP (``d_part_cond``, ``d_part_cond.c:926``)."""
    dims, dims2 = pl.dims, pl.dims2
    N, NU, NX = dims.N, dims.NU, dims.NX
    N2 = pl.N2
    NU2, NX2, NZ2, NB2, NG2 = dims2.NU, dims2.NX, dims2.NZ, dims2.NB, dims2.NG
    dt = qp.dtype
    HI = jax.lax.Precision.HIGHEST

    F2 = jnp.zeros((N2, NZ2, NX2), dt)
    b2 = jnp.zeros((N2, NX2), dt)
    H2 = jnp.zeros((N2 + 1, NZ2, NZ2), dt)
    g2 = jnp.zeros((N2 + 1, NZ2), dt)
    idxb2 = np.zeros((N2 + 1, NB2), dtype=np.int32)
    d_lb2 = jnp.zeros((N2 + 1, NB2), dt)
    d_ub2 = jnp.zeros((N2 + 1, NB2), dt)
    C2 = jnp.zeros((N2 + 1, NG2, NZ2), dt)
    d_lg2 = jnp.zeros((N2 + 1, NG2), dt)
    d_ug2 = jnp.zeros((N2 + 1, NG2), dt)

    oh = ipm._box_onehot(qp)

    all_phis = {}
    for g in range(N2):
        Phis, cs, GxT, gcT = _stage_maps(dims, qp, pl, g)
        all_phis[g] = (Phis, cs)
        s, T = pl.group_start[g], pl.group_T[g]

        # cost: sum_k Phi' H Phi, Phi'(H c + g)
        Hg = jnp.zeros((NZ2, NZ2), dt)
        gg = jnp.zeros((NZ2,), dt)
        for k in range(T):
            stg = s + k
            Hk = qp.H[stg]
            Hg = Hg + jnp.matmul(
                Phis[k].T, jnp.matmul(Hk, Phis[k], precision=HI), precision=HI
            )
            gg = gg + Phis[k].T @ (Hk @ cs[k] + qp.g[stg] * qp.z_mask[stg])
        H2 = H2.at[g].set(Hg)
        g2 = g2.at[g].set(gg)

        # dynamics to next condensed stage: x_{s+T} = GxT @ zeta + gcT
        F2 = F2.at[g].set(GxT.T[:, :NX2])
        b2 = b2.at[g].set(gcT[:NX2])

    # terminal stage cost/constraint data copies through.  Terminal inputs
    # (nu[N] > 0, e.g. the slack variables of api.soft_to_hard_data) sit at
    # [:nuN] on both sides; states at NU/NU2.
    nuN = dims.nu[N]
    H2 = H2.at[N2, NU2 : NU2 + NX2, NU2 : NU2 + NX2].set(
        qp.H[N, NU : NU + NX2, NU : NU + NX2]
    )
    g2 = g2.at[N2, NU2 : NU2 + NX2].set(qp.g[N, NU : NU + NX2])
    if nuN:
        H2 = H2.at[N2, :nuN, :nuN].set(qp.H[N, :nuN, :nuN])
        H2 = H2.at[N2, :nuN, NU2 : NU2 + NX2].set(qp.H[N, :nuN, NU : NU + NX2])
        H2 = H2.at[N2, NU2 : NU2 + NX2, :nuN].set(qp.H[N, NU : NU + NX2, :nuN])
        g2 = g2.at[N2, :nuN].set(qp.g[N, :nuN])

    # box constraints that stay box
    for (g, slot2, stg, idx) in pl.box_map:
        idxp = idx if idx < dims.nu[stg] else NU + (idx - dims.nu[stg])  # padded
        # padded condensed coordinate of this slot
        log2 = pl.dims2.idxb[g][slot2]
        idxb2[g, slot2] = log2 if log2 < dims2.nu[g] else NU2 + (log2 - dims2.nu[g])
        # constant offset from the affine map (zero for inputs and for the
        # first stage's states, which map identically; general form kept)
        Phis, cs = all_phis[g]
        k = stg - pl.group_start[g]
        cval = cs[k][idxp]
        d_lb2 = d_lb2.at[g, slot2].set(qp.d_lb[stg, _find_slot(dims, stg, idx)] - cval)
        d_ub2 = d_ub2.at[g, slot2].set(qp.d_ub[stg, _find_slot(dims, stg, idx)] - cval)

    # state boxes -> general rows
    for (g, row2, stg, idx) in pl.gen_from_box:
        Phis, cs = all_phis[g]
        k = stg - pl.group_start[g]
        idxp = NU + (idx - dims.nu[stg])
        row = Phis[k][idxp]  # (NZ2,)
        cval = cs[k][idxp]
        j = _find_slot(dims, stg, idx)
        C2 = C2.at[g, row2].set(row)
        d_lg2 = d_lg2.at[g, row2].set(qp.d_lb[stg, j] - cval)
        d_ug2 = d_ug2.at[g, row2].set(qp.d_ub[stg, j] - cval)

    # general constraints -> general rows composed with the stage maps
    for (g, row2, stg, j) in pl.gen_from_gen:
        Phis, cs = all_phis[g]
        k = stg - pl.group_start[g]
        crow = qp.C[stg, j]  # (NZ,)
        C2 = C2.at[g, row2].set(crow @ Phis[k])
        cshift = crow @ cs[k]
        d_lg2 = d_lg2.at[g, row2].set(qp.d_lg[stg, j] - cshift)
        d_ug2 = d_ug2.at[g, row2].set(qp.d_ug[stg, j] - cshift)

    # terminal stage constraints copy (remap padded coords; input boxes —
    # nu[N] > 0 — keep their input slots)
    for j in range(dims.nb[N]):
        idx = dims.idxb[N][j]
        idxb2[N2, j] = idx if idx < nuN else NU2 + (idx - nuN)
        d_lb2 = d_lb2.at[N2, j].set(qp.d_lb[N, j])
        d_ub2 = d_ub2.at[N2, j].set(qp.d_ub[N, j])
    for j in range(dims.ng[N]):
        C2 = C2.at[N2, j, NU2 : NU2 + NX2].set(qp.C[N, j, NU : NU + NX2])
        if nuN:
            C2 = C2.at[N2, j, :nuN].set(qp.C[N, j, :nuN])
        d_lg2 = d_lg2.at[N2, j].set(qp.d_lg[N, j])
        d_ug2 = d_ug2.at[N2, j].set(qp.d_ug[N, j])

    return OCPQP(
        F=F2,
        b=b2,
        H=H2,
        g=g2,
        idxb=jnp.asarray(idxb2),
        d_lb=d_lb2,
        d_ub=d_ub2,
        C=C2,
        d_lg=d_lg2,
        d_ug=d_ug2,
        z_mask=jnp.asarray(dims2.z_mask(), dt),
        x_mask=jnp.asarray(dims2.x_mask(), dt),
        nb_mask=jnp.asarray(dims2.nb_mask(), dt),
        ng_mask=jnp.asarray(dims2.ng_mask(), dt),
    )


def _find_slot(dims: OCPDims, stg: int, idx: int) -> int:
    """Slot of logical index idx inside stage stg's idxb list."""
    for j, v in enumerate(dims.idxb[stg]):
        if v == idx:
            return j
    raise KeyError((stg, idx))


def expand_solution(
    qp: OCPQP, pl: CondPlan, sol2: ipm.IPMSolution
) -> ipm.IPMSolution:
    """Recover the full-horizon solution (``d_part_expand_solution``,
    ``d_part_cond.c:1103``): copy inputs, roll out states, split multipliers,
    backward-stationarity for interior pi."""
    dims, dims2 = pl.dims, pl.dims2
    N, NU, NX, NZ = dims.N, dims.NU, dims.NX, dims.NZ
    N2 = pl.N2
    NU2 = dims2.NU
    dt = qp.dtype

    z = jnp.zeros((N + 1, NZ), dt)
    # terminal state (+ terminal inputs when nu[N] > 0)
    NX2 = dims2.NX
    z = z.at[N, NU : NU + NX2].set(sol2.z[N2, NU2 : NU2 + NX2])
    if dims.nu[N]:
        z = z.at[N, : dims.nu[N]].set(sol2.z[N2, : dims.nu[N]])

    for g in range(N2):
        s, T = pl.group_start[g], pl.group_T[g]
        off = {}
        acc = 0
        for k in range(T - 1, -1, -1):
            off[k] = acc
            acc += dims.nu[s + k]
        for k in range(T):
            nu_k = dims.nu[s + k]
            if nu_k:
                z = z.at[s + k, :nu_k].set(sol2.z[g, off[k] : off[k] + nu_k])
        # entry state
        z = z.at[s, NU : NU + NX2].set(sol2.z[g, NU2 : NU2 + NX2])
        # roll out interior states
        for k in range(T - 1):
            stg = s + k
            x_next = qp.b[stg] + qp.F[stg].T @ (z[stg] * qp.z_mask[stg])
            z = z.at[stg + 1, NU:].set(x_next * qp.x_mask[stg + 1])

    # multipliers/slacks back to stages
    lam_b = jnp.zeros((N + 1, 2, dims.NB), dt)
    t_b = jnp.ones((N + 1, 2, dims.NB), dt)
    lam_g = jnp.zeros((N + 1, 2, dims.NG), dt)
    t_g = jnp.ones((N + 1, 2, dims.NG), dt)

    for (g, slot2, stg, idx) in pl.box_map:
        j = _find_slot(dims, stg, idx)
        lam_b = lam_b.at[stg, :, j].set(sol2.lam_b[g, :, slot2])
        t_b = t_b.at[stg, :, j].set(sol2.t_b[g, :, slot2])
    for (g, row2, stg, idx) in pl.gen_from_box:
        j = _find_slot(dims, stg, idx)
        lam_b = lam_b.at[stg, :, j].set(sol2.lam_g[g, :, row2])
        t_b = t_b.at[stg, :, j].set(sol2.t_g[g, :, row2])
    for (g, row2, stg, j) in pl.gen_from_gen:
        lam_g = lam_g.at[stg, :, j].set(sol2.lam_g[g, :, row2])
        t_g = t_g.at[stg, :, j].set(sol2.t_g[g, :, row2])
    # terminal
    for j in range(dims.nb[N]):
        lam_b = lam_b.at[N, :, j].set(sol2.lam_b[N2, :, j])
        t_b = t_b.at[N, :, j].set(sol2.t_b[N2, :, j])
    for j in range(dims.ng[N]):
        lam_g = lam_g.at[N, :, j].set(sol2.lam_g[N2, :, j])
        t_g = t_g.at[N, :, j].set(sol2.t_g[N2, :, j])

    # equality multipliers: group-boundary pis copy; interior by backward
    # stationarity pi_{stg-1} = x-part of (g + H z + box/gen terms + F pi)
    pi = jnp.zeros((N, NX), dt)
    oh = ipm._box_onehot(qp)
    for g in range(N2):
        s, T = pl.group_start[g], pl.group_T[g]
        pi = pi.at[s + T - 1].set(sol2.pi[g] * qp.x_mask[s + T][: NX])
        for k in range(T - 1, 0, -1):
            stg = s + k
            w = qp.g[stg] * qp.z_mask[stg] + qp.H[stg] @ (z[stg] * qp.z_mask[stg])
            net_b = (lam_b[stg, 1] - lam_b[stg, 0]) * qp.nb_mask[stg]
            w = w + oh[stg].T @ net_b
            net_g = (lam_g[stg, 1] - lam_g[stg, 0]) * qp.ng_mask[stg]
            w = w + qp.C[stg].T @ net_g
            w = w + qp.F[stg] @ pi[stg]
            pi = pi.at[stg - 1].set(w[NU:] * qp.x_mask[stg])

    return ipm.IPMSolution(
        z=z,
        pi=pi,
        lam_b=lam_b,
        t_b=t_b,
        lam_g=lam_g,
        t_g=t_g,
        kk=sol2.kk,
        status=sol2.status,
        stat=sol2.stat,
        inf_norm_res=sol2.inf_norm_res,
    )


def solve_partial_cond(
    dims: OCPDims,
    qp: OCPQP,
    cfg: ipm.IPMConfig,
    N2: int,
):
    """Condense -> IPM -> expand (the reference's ``N2 < N`` path in
    ``fortran_order_d_ip_ocp_hard_tv``,
    ``interfaces/c/fortran_order_interface.c:434-528``).

    Returns ``(expanded_solution, condensed_solution)``; the static
    :class:`CondPlan` is recomputed cheaply via :func:`plan` if needed
    (it is not returned so this function stays jit-able end to end)."""
    pl = plan(dims, N2)
    qp2 = condense(qp, pl)
    sol2 = ipm.solve(pl.dims2, qp2, cfg)
    return expand_solution(qp, pl, sol2), sol2


def solve_batched_partial_cond(
    dims: OCPDims,
    qp: OCPQP,
    cfg: ipm.IPMConfig,
    N2: int,
):
    """Batched twin of :func:`solve_partial_cond`: vmapped condense ->
    batch-level IPM on the condensed problem (``parallel.batch``
    dispatch — at large nx this rides the blocked batched Riccati) ->
    vmapped expand.  The reference's own large-problem lever
    (``d_part_cond.c:926``) composed with the batch engines; measured by
    tools/bench_cond_blocked.py against the plain blocked route.

    Returns ``(expanded_solution, condensed_solution)``."""
    from ..parallel import batch as pbatch

    pl2 = plan(dims, N2)
    qp2 = jax.vmap(lambda q: condense(q, pl2))(qp)
    sol2 = pbatch.solve_batched(pl2.dims2, qp2, cfg)
    exp = jax.vmap(lambda q, s: expand_solution(q, pl2, s))(qp, sol2)
    return exp, sol2


def condense_rhs(qp: OCPQP, pl: CondPlan, qp2_mat: OCPQP) -> OCPQP:
    """Vector-only re-condensing (the reference's rhs fast path,
    ``d_part_cond_rhs_libstr``, ``d_part_cond_libstr.c:991``): rebuild the
    condensed g/b/bounds for changed vector data (b, g, d) while keeping the
    matrix parts (F2/H2/C2 and the affine maps) from a previous
    :func:`condense` result ``qp2_mat``.  Matrix data (A, B, Q, S, R, C)
    must be unchanged — the RTI/warm-start loop's common case.
    """
    dims, dims2 = pl.dims, pl.dims2
    N, NU, NX = dims.N, dims.NU, dims.NX
    N2 = pl.N2
    NU2, NX2, NZ2, NB2, NG2 = dims2.NU, dims2.NX, dims2.NZ, dims2.NB, dims2.NG
    dt = qp.dtype
    HI = jax.lax.Precision.HIGHEST

    b2 = jnp.zeros((N2, NX2), dt)
    g2 = jnp.zeros((N2 + 1, NZ2), dt)
    d_lb2 = jnp.zeros((N2 + 1, NB2), dt)
    d_ub2 = jnp.zeros((N2 + 1, NB2), dt)
    d_lg2 = jnp.zeros((N2 + 1, NG2), dt)
    d_ug2 = jnp.zeros((N2 + 1, NG2), dt)

    all_phis = {}
    for g in range(N2):
        Phis, cs, GxT, gcT = _stage_maps(dims, qp, pl, g)
        all_phis[g] = (Phis, cs)
        s, T = pl.group_start[g], pl.group_T[g]
        gg = jnp.zeros((NZ2,), dt)
        for k in range(T):
            stg = s + k
            gg = gg + Phis[k].T @ (qp.H[stg] @ cs[k] + qp.g[stg] * qp.z_mask[stg])
        g2 = g2.at[g].set(gg)
        b2 = b2.at[g].set(gcT[:NX2])
    g2 = g2.at[N2, NU2 : NU2 + NX2].set(qp.g[N, NU : NU + NX2])
    if dims.nu[N]:
        g2 = g2.at[N2, : dims.nu[N]].set(qp.g[N, : dims.nu[N]])

    for (g, slot2, stg, idx) in pl.box_map:
        idxp = idx if idx < dims.nu[stg] else NU + (idx - dims.nu[stg])
        Phis, cs = all_phis[g]
        k = stg - pl.group_start[g]
        cval = cs[k][idxp]
        j = _find_slot(dims, stg, idx)
        d_lb2 = d_lb2.at[g, slot2].set(qp.d_lb[stg, j] - cval)
        d_ub2 = d_ub2.at[g, slot2].set(qp.d_ub[stg, j] - cval)
    for (g, row2, stg, idx) in pl.gen_from_box:
        Phis, cs = all_phis[g]
        k = stg - pl.group_start[g]
        idxp = NU + (idx - dims.nu[stg])
        cval = cs[k][idxp]
        j = _find_slot(dims, stg, idx)
        d_lg2 = d_lg2.at[g, row2].set(qp.d_lb[stg, j] - cval)
        d_ug2 = d_ug2.at[g, row2].set(qp.d_ub[stg, j] - cval)
    for (g, row2, stg, j) in pl.gen_from_gen:
        Phis, cs = all_phis[g]
        k = stg - pl.group_start[g]
        cshift = qp.C[stg, j] @ cs[k]
        d_lg2 = d_lg2.at[g, row2].set(qp.d_lg[stg, j] - cshift)
        d_ug2 = d_ug2.at[g, row2].set(qp.d_ug[stg, j] - cshift)
    for j in range(dims.nb[N]):
        d_lb2 = d_lb2.at[N2, j].set(qp.d_lb[N, j])
        d_ub2 = d_ub2.at[N2, j].set(qp.d_ub[N, j])
    for j in range(dims.ng[N]):
        d_lg2 = d_lg2.at[N2, j].set(qp.d_lg[N, j])
        d_ug2 = d_ug2.at[N2, j].set(qp.d_ug[N, j])

    return dataclasses.replace(
        qp2_mat,
        b=b2, g=g2,
        d_lb=d_lb2, d_ub=d_ub2, d_lg=d_lg2, d_ug=d_ug2,
    )


def suggest_n2(dims: OCPDims, k_iters: int = 8, batch: int = 1) -> int:
    """Pick a condensed horizon N2 from a cost model (the §7 plan's
    "autotune N2"; the reference leaves N2 to the caller,
    ``interfaces/c/fortran_order_interface.c:434``).

    Model: per IPM iteration the condensed solve factorizes N2 stages of
    size ``nz2 = T nu + nx`` — flops ~ N2 nz2^3 — while on TPU the batched
    stage recursion is SEQUENTIAL in N2, so wall time scales like
    N2 * max(nz2^3, C) with C a per-stage latency floor; condensing itself
    (once, amortized over k_iters) costs ~ sum_g T^2 nz nx matmuls.  Small
    batches are latency-bound (deep recursion dominates -> favor small N2);
    large batches are flops-bound (cubic blowup dominates -> favor N2 ~ N).
    Returns the argmin over N2 in [1, N]; exact optimum is hardware
    dependent — benchmark around the suggestion (tools/bench_latency.py,
    tools/validate_n2_model.py).

    CALIBRATION (v5e, single instance, mass-spring nx=8 nu=3 N=30,
    tools/validate_n2_model.py): measured ms/solve over N2 =
    {1: 4.76, 2: 4.29, 3: 2.46, 5: 2.53, 6: 4.75, 10: 4.60, 15: 4.26,
    30: 6.41} — the best region is N2 in {3, 5} (groups of ~6-10 stages:
    short enough to cut the sequential recursion depth ~10x, small enough
    that the condensed stage factor nz2^3 stays cheap).  The latency-floor
    constant below is fitted so the model's argmin lands there (a smooth
    two-term model cannot reproduce the measured non-monotonic bumps at
    N2=2/6, which come from tile-padding steps in nz2; treat the
    suggestion as a starting point, not an oracle).
    """
    N = dims.N
    nu_bar = max(1, max(dims.nu[:N]))
    nx_bar = dims.NX
    nz = nu_bar + nx_bar
    # per-stage latency floor, in flop-equivalents: at batch 1 a stage step
    # is ~free flops-wise but costs a kernel's latency; at huge batches the
    # MXU is saturated and flops dominate.  Crossover ~ 128-lane tiles.
    # 300 flop-equiv/lane-step fitted to the v5e measurements above
    # (~27 us/stage-iteration at an effective ~1.4 GFLOP/s single-instance).
    lat_floor = 300.0 * max(1.0, 128.0 / max(batch, 1))

    best, best_cost = 1, float("inf")
    for N2 in range(1, N + 1):
        T = -(-N // N2)  # ceil: longest group
        nz2 = T * nu_bar + nx_bar
        solve = k_iters * N2 * max(float(nz2) ** 3, lat_floor)
        cond_cost = N2 * (T * T) * nz * nx_bar  # one-off, amortized
        cost = solve + cond_cost
        if cost < best_cost:
            best, best_cost = N2, cost
    return best
