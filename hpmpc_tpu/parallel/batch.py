"""Batched and mesh-sharded QP solving.

The reference solves one QP per call and callers batch externally
(1000-rep loops, ``test_problems/test_d_ip_hard.c:845``).  Here the batch is a
first-class axis: ``vmap`` over instances on one chip, ``jit`` +
``NamedSharding`` over a device mesh across chips/hosts (SURVEY.md §2.10).

Cross-device communication is nil by construction — each instance's IPM is
independent; only benchmark metric reductions cross the mesh.  Convergence is
per-instance (masked while-loop gating inside :mod:`..models.ipm`), so a batch
retires together without wasted flops beyond the slowest instance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import ipm
from ..ocp import OCPDims, OCPQP


def _engine_fits(dims: OCPDims, lanes: bool = False) -> bool:
    """Dispatch gate: do the per-scalar-tile Pallas engines fit VMEM at
    this problem size?  (ops/stage_kernel.engine_fits; boundary measured
    by tools/bench_size_sweep.py.  ``lanes``: the lanes/mega engine's
    tighter bound — past it the lanes branch falls back to ipm_fast.)"""
    from ..ops import stage_kernel as _sk

    return _sk.engine_fits(int(dims.NX), int(dims.NU), lanes=lanes)


def broadcast_qp(qp: OCPQP, batch: int) -> OCPQP:
    """Tile a single QP into a batch (leading axis) — cheap way to build
    benchmark batches; real users vmap over per-instance data."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), qp
    )


#: chunk width for very large batches: past ~4096 instances the engines'
#: HBM working set spills and per-batch time goes superlinear (measured
#: 8192 = 3.4x the 4096 time on v5e round-3); solve_batched sweeps such
#: batches through the engines in <=4096-instance chunks via lax.map
#: (ONE compiled body, sequential grid) so users see ~linear ms/batch.
CHUNK_B = 4096


def _pick_chunk(B: int) -> int | None:
    if B <= CHUNK_B:
        return None
    for c in (CHUNK_B, CHUNK_B // 2, CHUNK_B // 4):
        if B % c == 0:
            return c
    return None


def select_engine(dims: OCPDims, cfg: ipm.IPMConfig, B: int, dtype) -> str:
    """Single source of truth for the hard-path dispatch rule.

    Returns the engine :func:`solve_batched` will run for this
    (problem, config, batch): ``"resident"`` (whole-IPM single
    pallas_call, 4th generation), ``"lanes"`` (lanes/mega half-iteration
    kernels), ``"flat"`` (flat-state engine), ``"two_stage_resident"`` /
    ``"two_stage_lanes"`` (fast stage-1 to ``iter_ref_mu_thr``, then
    flat + mu-gated refinement), or ``"structured"`` (vmapped
    structured path — which itself Pallas-dispatches its KKT solves via
    ``custom_vmap``: per-scalar stage kernels or, past their VMEM
    envelope, the blocked batched Riccati).  bench.py stamps this value
    into its JSON line so the headline row is self-describing.

    Env knobs (hardware A/B, all default ON where validated):
    ``HPMPC_RESIDENT=0`` disables the resident engine,
    ``HPMPC_LANES_LOOP=0`` the lanes/mega engine.
    """
    import os

    if not (
        cfg.use_pallas
        and dims.n_constr > 0
        and dims.idxb is not None
        and B % 1024 == 0
        # size envelope: the per-scalar-tile engines' VMEM working set
        # grows O(NZ^2); beyond the scoped budget the structured path
        # (size-independent code, MXU-tiled) takes over.  Measured
        # boundary: tools/bench_size_sweep.py.
        and _engine_fits(dims)
    ):
        return "structured"
    f32 = dtype == jnp.float32
    iter_ref = int(getattr(cfg, "iter_ref", 0))
    ref_thr = float(getattr(cfg, "iter_ref_mu_thr", 0.0))

    def resident_ok(stage1_mu_tol: float) -> bool:
        # 4th generation: the ENTIRE phase-1 IPM in ONE pallas_call,
        # state VMEM-resident, step glue in-kernel — the reference's
        # legacy no-residual d_ip2_hard semantics (phase 1 to mu_tol).
        # Default ON (hardware-validated bit-exact vs the lanes engine,
        # tools/check_resident_tpu.py) — but ONLY where those semantics
        # coincide with the requested config: mu_switch <= the target
        # tolerance means the 2-phase solver would never leave phase 1
        # either, so the solutions are identical by construction.
        from ..ops import resident_kernel as _rk

        return (
            os.environ.get("HPMPC_RESIDENT", "1") == "1"
            and dims.NB > 0
            and f32
            and float(cfg.mu_switch) <= stage1_mu_tol
            and _rk.resident_fits(int(dims.NX), int(dims.NU),
                                  int(dims.NB), int(dims.N))
        )

    lanes_ok = (
        (
            # default ON: hardware-validated fastest 2-phase engine
            # (481k vs 372k solves/s on v5e); set =0 to A/B the
            # flat-state engine.  MEGA implies the lanes engine (the
            # mega kernels only exist there).
            os.environ.get("HPMPC_LANES_LOOP", "1") == "1"
            or os.environ.get("HPMPC_MEGA_SWEEPS", "0") == "1"
        )
        and dims.NB > 0
        and f32  # mixed precision stays on ipm_fast
        and _engine_fits(dims, lanes=True)  # tighter VMEM bound
        # measured crossover fence (v5e size sweeps 2026-08-20,
        # floor-cleared K spans): the mega route WINS at NZ=17 (355k vs
        # flat 319k), 24 (202k vs 194k), 27 (157k vs 121k), 36 (77k vs
        # 63k) but LOSES in a BAND in between — 22% at NZ=19 (237k vs
        # 303k; nx=16 nu=3) and 12% at NZ=22 (197k vs 223k; nx=18
        # nu=4) — the default dispatch must not pick a >10%-losing
        # engine, so 19..22 rides flat (interior 20-21 interpolated
        # between two measured losers; 18/23 left on mega, matching
        # their winning neighbors 17/24).  An EXPLICIT
        # HPMPC_MEGA_SWEEPS=1 still overrides (the A/B rows of the size
        # sweep itself need to measure it).
        and (not (19 <= dims.NZ <= 22)
             or os.environ.get("HPMPC_MEGA_SWEEPS") == "1")
    )
    if iter_ref == 0:
        if resident_ok(float(cfg.mu_tol)):
            return "resident"
        return "lanes" if lanes_ok else "flat"
    if ref_thr > 0 and lanes_ok:
        if resident_ok(max(float(cfg.mu_tol), ref_thr)):
            return "two_stage_resident"
        return "two_stage_lanes"
    return "flat"


def solve_batched(dims: OCPDims, qp: OCPQP, cfg: ipm.IPMConfig,
                  z0=None, pi0=None):
    """vmap the full IPM over a leading instance axis of every QP leaf.

    With ``cfg.use_pallas`` and a 1024-multiple batch, dispatches to the
    Pallas engine ladder (see :func:`select_engine` — the rule, and the
    A/B env knobs): resident / lanes+mega / flat-state
    (:mod:`..models.ipm_fast`) — same algorithm, TPU-tile-friendly
    (B, flat) loop state and fused Pallas Riccati/residual kernels.
    Other batch sizes take the vmapped structured path (which itself
    uses the Pallas stage kernels or the blocked batched Riccati through
    ``custom_vmap`` when the batch allows).

    Batches wider than :data:`CHUNK_B` are swept through the engines in
    chunks inside ONE compiled ``lax.map`` — ms/batch stays ~linear in B
    instead of cliffing when the whole batch outgrows HBM working sets.

    ``z0`` (B, N+1, NZ) / ``pi0`` (B, N, NX) with ``cfg.warm_start`` seed
    the iterate on EVERY path (the reference's hot-loop ``warm_start``,
    ``d_ip2_res_hard.c:116`` arg 6) — batched RTI/closed-loop re-solves
    stay on the throughput engines."""
    B = qp.b.shape[0]
    warm = bool(cfg.warm_start)
    if getattr(cfg, "escalate_stalled", False) and qp.dtype == jnp.float32:
        import dataclasses

        cfg_base = dataclasses.replace(cfg, escalate_stalled=False)
        sol = solve_batched(dims, qp, cfg_base, z0=z0, pi0=pi0)
        return _escalate_stalled(dims, qp, cfg_base, sol, z0, pi0)
    engine = select_engine(dims, cfg, B, qp.dtype)
    chunk = _pick_chunk(B) if engine != "structured" else None
    if chunk is not None:
        nch = B // chunk

        def _split(x):
            return x.reshape((nch, chunk) + x.shape[1:])

        qc = jax.tree_util.tree_map(_split, qp)
        zc = None if z0 is None else _split(z0)
        pc = None if pi0 is None else _split(pi0)

        sol = jax.lax.map(
            lambda args: solve_batched(dims, args[0], cfg,
                                       z0=args[1], pi0=args[2]),
            (qc, zc, pc),
        )
        return jax.tree_util.tree_map(
            lambda x: x.reshape((B,) + x.shape[2:]), sol)

    if engine == "resident":
        from ..models import ipm_resident

        return ipm_resident.solve_batched_resident(
            dims, qp, cfg, z0=z0, pi0=pi0)
    if engine == "lanes":
        from ..models import ipm_lanes

        return ipm_lanes.solve_batched_lanes(dims, qp, cfg, z0=z0, pi0=pi0)
    if engine in ("two_stage_resident", "two_stage_lanes"):
        # TWO-STAGE parity route (reference-tolerance accuracy at
        # near-mega speed): the resident or lanes/mega engine runs the
        # well-conditioned early iterations to mu <= iter_ref_mu_thr,
        # then hands its FULL primal-dual state to a refining engine,
        # which finishes with mu-gated iterative refinement.  kk and
        # the stat trace continue across the handoff, so the total
        # iteration budget and per-iteration rows match a
        # single-engine run.
        #
        # Stage 2 runs on the LANES engine by default (round 5): the
        # refinement residual's stage-coupling terms are contiguous
        # slice-adds in the lanes layout where the flat engine pays
        # selection matmuls + layout transposes every iteration.
        # ``HPMPC_STAGE2_LANES=0`` A/Bs the flat stage 2.
        import dataclasses
        import os as _os

        cfg1 = dataclasses.replace(
            cfg, iter_ref=0,
            mu_tol=max(float(cfg.mu_tol),
                       float(getattr(cfg, "iter_ref_mu_thr", 0.0))),
        )
        if engine == "two_stage_resident":
            # stage 1 is phase-1-to-mu_tol — exactly the resident
            # engine's contract (and its fastest consumer)
            from ..models import ipm_resident

            sol1 = ipm_resident.solve_batched_resident(
                dims, qp, cfg1, z0=z0, pi0=pi0)
        else:
            from ..models import ipm_lanes

            sol1 = ipm_lanes.solve_batched_lanes(dims, qp, cfg1,
                                                 z0=z0, pi0=pi0)
        if _os.environ.get("HPMPC_STAGE2_LANES", "1") == "1":
            from ..models import ipm_lanes

            return ipm_lanes.solve_batched_lanes(dims, qp, cfg,
                                                 state0=sol1)
        from ..models import ipm_fast

        return ipm_fast.solve_batched_flat(dims, qp, cfg, state0=sol1)
    if engine == "flat":
        from ..models import ipm_fast

        return ipm_fast.solve_batched_flat(dims, qp, cfg, z0=z0, pi0=pi0)
    if warm and z0 is not None:
        return jax.vmap(
            lambda q, zz, pp: ipm.solve(dims, q, cfg, z0=zz, pi0=pp)
        )(qp, z0, pi0 if pi0 is not None else jnp.zeros(
            (B, dims.N, dims.NX), qp.dtype))
    return jax.vmap(lambda q: ipm.solve(dims, q, cfg))(qp)


def _escalate_stalled(dims: OCPDims, qp: OCPQP, cfg, sol, z0, pi0):
    """f32-floor escalation (``IPMConfig.escalate_stalled``): instances
    the f32 solve left unconverged (status != 0) are re-solved in FULL
    f64 through the structured path and merged back per-instance.  The
    whole pass sits under one ``lax.cond``: batches that fully converge
    in f32 never execute it.

    Why full f64 and not the mixed-precision engine (f64 state + f32
    kernels): measured at the (16,1) north-star size (CPU, B=256,
    mu_tol=1e-3, k_max=30) the f32-FACTORIZED direction perturbs the
    trajectory enough that knife-edge instances diverge differently —
    true-mixed converges 62.5-62.9% (with or without f64 refinement)
    where plain f32 gets 63.7% and f64 67.2%.  The dtype gap at this
    size is trajectory chaos near infeasibility, not endpoint
    precision, so only an f64 factorization recovers the f64 set — the
    escalated route IS the f64 solver (exact by construction), at
    emulated-f64 cost on TPU, paid only when something stalled."""
    import dataclasses as _dc

    import jax.numpy as _jnp

    stalled = sol.status != 0

    def run_f64(s):
        qp64 = jax.tree_util.tree_map(
            lambda x: x.astype(_jnp.float64)
            if x.dtype == _jnp.float32 else x, qp)
        z64 = None if z0 is None else z0.astype(_jnp.float64)
        p64 = None if pi0 is None else pi0.astype(_jnp.float64)
        # structured path (use_pallas off): pure f64 end to end — the
        # engine dispatch would route f64 to the MIXED flat engine,
        # which provably does not recover the f64-convergent set
        cfg64 = _dc.replace(cfg, use_pallas=False)
        solm = solve_batched(dims, qp64, cfg64, z0=z64, pi0=p64)

        def mrg(a, m):
            mm = stalled.reshape((-1,) + (1,) * (a.ndim - 1))
            return jnp.where(mm, m.astype(a.dtype), a)

        return jax.tree_util.tree_map(mrg, s, solm)

    return jax.lax.cond(jnp.any(stalled), run_f64, lambda s: s, sol)


def solve_single(dims: OCPDims, qp: OCPQP, cfg: ipm.IPMConfig,
                 z0=None, pi0=None):
    """Single-instance LATENCY path: ride the fastest batched engine.

    The lanes/mega engines process BI = 8*128 = 1024 instances per
    (8, 128) tile — one instance costs the same wall clock as a full
    block, so a deployed per-tick MPC solve (the reference's
    single-QP call, ``d_ip2_res_hard.c:116``) pads itself into one
    block and takes lane 0 of the result.  The broadcast and slice are
    free under jit next to the solve itself; convergence exit fires at
    the instance's own iteration count (all lanes identical).

    ``qp`` leaves are UNBATCHED (no leading instance axis).  Falls back
    to the structured path automatically via :func:`solve_batched`'s
    gates (dtype, size envelope, warm start support included)."""
    B = 1024 if (cfg.use_pallas and _engine_fits(dims)) else 1
    qpb = broadcast_qp(qp, B)
    zb = None if z0 is None else jnp.broadcast_to(z0, (B,) + z0.shape)
    pb = None if pi0 is None else jnp.broadcast_to(pi0, (B,) + pi0.shape)
    sol = solve_batched(dims, qpb, cfg, z0=zb, pi0=pb)
    return jax.tree_util.tree_map(lambda a: a[0], sol)


def solve_batched_soft(
    dims: OCPDims, qp: OCPQP, soft, cfg: ipm.IPMConfig,
    idxbs=None, exact_mehrotra_soft: bool = True,
):
    """Soft-IPM twin of :func:`solve_batched`.

    ``idxbs``: static (N+1, NS) tuple-of-tuples of padded-z soft
    coordinates shared by every instance (the soft analogue of
    ``dims.idxb``) — required for the flat engine's selection-matrix
    gathers.  With ``cfg.use_pallas``, a 1024-multiple batch and static
    ``idxbs``, dispatches to the flat-state soft engine
    (:mod:`..models.ipm_soft_fast`); otherwise the vmapped structured
    path (which still Pallas-dispatches its KKT solves via custom_vmap
    when the batch allows)."""
    from ..models import ipm_soft

    B = qp.b.shape[0]
    if (
        cfg.use_pallas
        and dims.idxb is not None
        and idxbs is not None
        and B % 1024 == 0
        and _engine_fits(dims)  # same size envelope as the hard route
    ):
        import os

        idxbs_t = tuple(tuple(int(i) for i in row) for row in idxbs)
        NS = soft.ns_mask.shape[-1]
        if (
            # 4th generation: the WHOLE soft IPM in one pallas_call.
            # The soft solver is single-phase, so the resident contract
            # IS the engine ladder's — no mu_switch gate needed (unlike
            # the hard route).  OPT-IN (explicit HPMPC_RESIDENT=1),
            # unlike the hard route's resident default: measured SLOWER
            # than soft mega at throughput (0.72x at N=20, v5e
            # 2026-08-20).  N=30 compiles and hardware-validates fine
            # as of round 5 (check_resident_tpu --soft: kk 100%,
            # dz 7.9e-4; the r04 "130 MB MLIR" compile flake did not
            # reproduce — module-size probe: 813 KB).
            os.environ.get("HPMPC_RESIDENT") == "1"
            and dims.NB > 0
            and NS > 0
            and qp.dtype == jnp.float32
            and int(getattr(cfg, "iter_ref", 0)) == 0
        ):
            from ..ops import resident_kernel as _rk

            if _rk.resident_soft_fits(int(dims.NX), int(dims.NU),
                                      int(dims.NB), int(dims.N), NS):
                from ..models import ipm_soft_resident

                return ipm_soft_resident.solve_batched_soft_resident(
                    dims, qp, soft, cfg, idxbs_t,
                    exact_mehrotra_soft=exact_mehrotra_soft,
                )
        if (
            (
                # default ON (hardware-validated 2026-08-19 on v5e:
                # soft xla 14.5k < flat 163k < lanes 547k < mega 909k
                # solves/s); HPMPC_LANES_LOOP=0 A/Bs the flat engine,
                # MEGA implies lanes exactly as on the hard route
                os.environ.get("HPMPC_LANES_LOOP", "1") == "1"
                or os.environ.get("HPMPC_MEGA_SWEEPS", "0") == "1"
            )
            and dims.NB > 0
            and NS > 0
            and qp.dtype == jnp.float32
            and _engine_fits(dims, lanes=True)  # tighter VMEM bound
        ):
            from ..models import ipm_soft_lanes

            return ipm_soft_lanes.solve_batched_soft_lanes(
                dims, qp, soft, cfg, idxbs_t,
                exact_mehrotra_soft=exact_mehrotra_soft,
            )
        from ..models import ipm_soft_fast

        return ipm_soft_fast.solve_batched_flat(
            dims, qp, soft, cfg, idxbs_t,
            exact_mehrotra_soft=exact_mehrotra_soft,
        )
    return jax.vmap(
        lambda q, s: ipm_soft.solve(
            dims, q, s, cfg, exact_mehrotra_soft=exact_mehrotra_soft
        )
    )(qp, soft)


def solve_batched_tree(tdef, dims: OCPDims, qp: OCPQP, cfg: ipm.IPMConfig,
                       z0=None, pi0=None):
    """Tree-IPM twin of :func:`solve_batched`: batched scenario-tree QPs
    (node/edge arrays with a leading batch axis).  With ``cfg.use_pallas``,
    a 1024-multiple batch, static ``dims.idxb``, f32 data and a tree small
    enough for the fused kernels' VMEM accumulator, dispatches to the
    flat-state tree engine (``models/tree.solve_tree_ipm_flat``, Pallas
    tree sweeps through the shared flat IPM loop); otherwise the vmapped
    level-batched XLA path.

    ``z0`` (B, n_nodes, NZ) / ``pi0`` (B, n_nodes-1, NX) with
    ``cfg.warm_start`` seed the node iterate on BOTH paths — closed-loop
    tree-RTI re-solves stay on the fused engine (the reference tree
    solver's ``warm_start`` argument, ``d_tree_ip2_res_hard_libstr.c:80``)."""
    import os

    from ..models import tree as _tree
    from ..ops import tree_kernel as tk

    B = qp.b.shape[0]
    fused_fits = tk.tree_fits_fused(tdef.n_nodes, dims.NZ) or (
        # LARGE trees: the HBM-streamed backward accumulator lifts the
        # fused path's VMEM node cap ~(NZ+3)/2 x.  Default ON — the DMA
        # lowering is real-Mosaic validated (tools/check_tree_hbm_tpu.py
        # 2026-08-20: bit-exact vs the VMEM path, and a 511-node tree
        # matches the XLA route with kk 100%); =0 falls back to the
        # level-batched XLA path for oversized trees.
        os.environ.get("HPMPC_TREE_HBM", "1") == "1"
        and tk.tree_fits_fused_hbm(tdef.n_nodes, dims.NZ)
    )
    if (
        cfg.use_pallas
        and dims.idxb is not None
        and B % 1024 == 0
        and qp.dtype == jnp.float32
        and int(getattr(cfg, "iter_ref", 0)) == 0
        and fused_fits
    ):
        return _tree.solve_tree_ipm_flat(tdef, dims, qp, cfg,
                                         z0=z0, pi0=pi0)
    if cfg.warm_start and z0 is not None:
        return jax.vmap(
            lambda q, zz, pp: _tree.solve_tree_ipm(tdef, dims, q, cfg,
                                                   z0=zz, pi0=pp)
        )(qp, z0, pi0 if pi0 is not None else jnp.zeros(
            (B, dims.N, dims.NX), qp.dtype))
    return jax.vmap(
        lambda q: _tree.solve_tree_ipm(tdef, dims, q, cfg)
    )(qp)


def solve_batched_admm(dims: OCPDims, qp: OCPQP, cfg, soft=None,
                       z0=None, v0=None, w0=None):
    """ADMM twin of :func:`solve_batched`: batched box (or, with
    ``soft=(Z, z_lin)``, soft) ADMM solves.  With ``cfg.use_pallas`` and a
    1024-multiple batch the per-iteration retained-factor Riccati resolve
    inside every instance dispatches to the fused Pallas stage solve
    kernels through the shared ``custom_vmap`` KKT wrapper — the batched
    analogue of the reference's ``update_hessian=0`` hot loop
    (``test_problems/test_d_admm_box.c:381``)."""
    from ..models import admm as _admm

    kw = {}
    if z0 is not None:
        kw = dict(z0=z0, v0=v0, w0=w0)
    if soft is None:
        fn = lambda q, **k: _admm.solve_box(dims, q, cfg, **k)  # noqa: E731
    else:
        Z, z_lin = soft
        fn = lambda q, **k: _admm.solve_soft(  # noqa: E731
            dims, q, Z, z_lin, cfg, **k)
    if kw:
        return jax.vmap(lambda q, z, v, w: fn(q, z0=z, v0=v, w0=w))(
            qp, z0, v0, w0)
    return jax.vmap(fn)(qp)


def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_qp(qp: OCPQP, mesh: Mesh, axis: str = "batch") -> OCPQP:
    """Place a batched QP with its leading axis sharded over the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), qp)


def solve_sharded(
    dims: OCPDims,
    qp: OCPQP,
    cfg: ipm.IPMConfig,
    mesh: Mesh,
    axis: str = "batch",
    z0=None,
    pi0=None,
):
    """jit-compiled batch solve with the instance axis sharded over ``mesh``.

    No collectives are needed (embarrassingly parallel over instances), so
    scaling across ICI/DCN is linear up to compilation constants.

    Two partitioning modes, one semantics:

    * XLA path (``cfg.use_pallas`` False, or the engine gates reject the
      per-device batch): plain ``jit`` with sharded in/out — XLA's SPMD
      partitioner splits the structured solve per device.
    * Engine path: the Pallas engines are opaque kernels with no SPMD
      partitioning rules, so the solve is wrapped in ``jax.shard_map`` —
      each device runs the FULL engine on its local batch shard, which is
      exactly the engines' contract (the per-device batch must satisfy
      the 1024-multiple gate for the engines to engage; the dispatch
      gates see the LOCAL shape inside shard_map and degrade gracefully
      otherwise).  Per-instance results are independent, so sharded ==
      unsharded bit-for-bit (asserted by tests/test_sharding.py and
      ``__graft_entry__.dryrun_multichip`` step 6).
    """
    sh = NamedSharding(mesh, P(axis))

    if cfg.use_pallas:
        spec_in = jax.tree_util.tree_map(lambda _: P(axis), qp)
        warm = {}
        if z0 is not None:
            warm["z0"] = z0
        if pi0 is not None:
            warm["pi0"] = pi0
        wspec = {k: P(axis) for k in warm}

        @jax.jit
        def _solve_sm(q, w):
            return jax.shard_map(
                lambda qq, ww: solve_batched(dims, qq, cfg,
                                             z0=ww.get("z0"),
                                             pi0=ww.get("pi0")),
                mesh=mesh,
                in_specs=(spec_in, wspec),
                out_specs=P(axis),
                # the engines' pallas_calls don't annotate varying-across-
                # mesh metadata on their out_shapes; replication checking
                # is meaningless here anyway (everything is batch-varying)
                check_vma=False,
            )(q, w)

        return _solve_sm(qp, warm)

    @functools.partial(
        jax.jit,
        in_shardings=(jax.tree_util.tree_map(lambda _: sh, qp),),
        out_shardings=sh,
    )
    def _solve(q):
        return solve_batched(dims, q, cfg)

    if z0 is not None or pi0 is not None:
        @jax.jit
        def _solve_w(q, zz, pp):
            return solve_batched(dims, q, cfg, z0=zz, pi0=pp)

        return _solve_w(qp, z0, pi0)
    return _solve(qp)
