"""Pallas fused-stage-kernel tests (interpret mode on CPU): the kernels must
reproduce the XLA Riccati path and drive the IPM to the same iterates."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from hpmpc_tpu.models import ipm, riccati
from hpmpc_tpu.parallel import batch as pbatch
from hpmpc_tpu.utils.mass_spring import mass_spring_qp


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    # stage_kernel captured pl.pallas_call at call time (module-level import
    # of pl), so patching the attribute is enough
    yield


def _batch_qp(N=4, B=1024, ngN=0, ng=0):
    dims, qp = mass_spring_qp(8, 3, N, ng=ng, ngN=ngN, dtype=jnp.float32)
    qpb = pbatch.broadcast_qp(qp, B)
    rng = np.random.default_rng(0)
    qpb = dataclasses.replace(
        qpb,
        b=qpb.b * jnp.asarray(1 + 0.02 * rng.standard_normal(B), jnp.float32)[:, None, None],
    )
    return dims, qpb


def test_fused_sv_matches_xla(interpret_pallas):
    from hpmpc_tpu.ops import stage_kernel as sk

    dims, qpb = _batch_qp()
    H_eff = qpb.H + jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(qpb.pad_diag)
    g_eff = qpb.g * qpb.z_mask
    z, pi, L, eu, px, Pb = sk.factor_solve_batched(
        H_eff, g_eff, qpb.F, qpb.b, dims.NU
    )
    with jax.default_matmul_precision("float32"):
        ref = jax.vmap(
            lambda H, g, F, b: riccati.factor_solve(H, g, F, b, dims.NU)
        )(H_eff, g_eff, qpb.F, qpb.b)
    sol_ref, L_ref, _, px_ref, Pb_ref = ref
    np.testing.assert_allclose(np.asarray(z), np.asarray(sol_ref.z), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pi), np.asarray(sol_ref.pi), atol=2e-4)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref), atol=2e-5)

    # retained-factor trs with cached Pb
    z2, pi2 = sk.solve_batched(L, g_eff, qpb.F, qpb.b, Pb, dims.NU)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=2e-5)


def test_fused_ipm_matches_xla_path(interpret_pallas):
    dims, qpb = _batch_qp()
    cfg_x = ipm.IPMConfig(k_max=3, mu_tol=1e-4)
    cfg_p = dataclasses.replace(cfg_x, use_pallas=True)
    sol_x = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg_x))(qpb)
    sol_p = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg_p))(qpb)
    assert bool(jnp.all(sol_x.kk == sol_p.kk))
    np.testing.assert_allclose(
        np.asarray(sol_p.z), np.asarray(sol_x.z), atol=5e-4
    )


def test_fused_ipm_with_general_constraints(interpret_pallas):
    """The folded kernel's in-VMEM ng-stage Hessian add (terminal equality
    rows) must match the XLA path."""
    dims, qpb = _batch_qp(ngN=4)
    cfg_x = ipm.IPMConfig(k_max=3, mu_tol=1e-4)
    cfg_p = dataclasses.replace(cfg_x, use_pallas=True)
    sol_x = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg_x))(qpb)
    sol_p = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg_p))(qpb)
    assert bool(jnp.all(sol_x.kk == sol_p.kk))
    np.testing.assert_allclose(
        np.asarray(sol_p.z), np.asarray(sol_x.z), atol=5e-4
    )


def test_fused_ipm_with_interior_general_constraints(interpret_pallas):
    """Multiple ng-active stages exercise the folded kernel's ng_slot index
    mapping (one barrier-term slot per active stage) and the flat path's
    multi-stage C_ngF rows."""
    dims, qpb = _batch_qp(N=5, ng=2, ngN=4)
    assert sum(1 for n in dims.ng if n > 0) > 2  # interior + terminal
    cfg_x = ipm.IPMConfig(k_max=2, mu_tol=1e-4)
    cfg_p = dataclasses.replace(cfg_x, use_pallas=True)
    sol_x = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg_x))(qpb)
    sol_p = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg_p))(qpb)
    assert bool(jnp.all(sol_x.kk == sol_p.kk))
    np.testing.assert_allclose(
        np.asarray(sol_p.z), np.asarray(sol_x.z), atol=5e-4
    )


def test_structured_pallas_path_via_direct_vmap(interpret_pallas):
    """The structured custom_vmap Pallas route (used when callers vmap
    ipm.solve directly rather than through solve_batched) must still match
    the XLA path."""
    dims, qpb = _batch_qp()
    cfg_x = ipm.IPMConfig(k_max=2, mu_tol=1e-4)
    cfg_p = dataclasses.replace(cfg_x, use_pallas=True)
    sol_x = jax.jit(jax.vmap(lambda q: ipm.solve(dims, q, cfg_x)))(qpb)
    sol_p = jax.jit(jax.vmap(lambda q: ipm.solve(dims, q, cfg_p)))(qpb)
    assert bool(jnp.all(sol_x.kk == sol_p.kk))
    np.testing.assert_allclose(
        np.asarray(sol_p.z), np.asarray(sol_x.z), atol=5e-4
    )


def test_solve_flat_pb_matches_recompute_path(interpret_pallas):
    """solve_flat_pb (in-kernel Pb recompute, the reference compute_Pb=1
    trs) must match the XLA retained-factor solve for a NEW rhs b' that the
    factor's Pb cache does not belong to."""
    from hpmpc_tpu.ops import stage_kernel as sk
    from hpmpc_tpu.models import riccati

    dims, qpb = _batch_qp()
    B = qpb.b.shape[0]
    H_eff = qpb.H + jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(qpb.pad_diag)
    g_eff = qpb.g * qpb.z_mask
    with jax.default_matmul_precision("float32"):
        _, L, *_ = jax.vmap(
            lambda H, g, F, b: riccati.factor_solve(H, g, F, b, dims.NU)
        )(H_eff, g_eff, qpb.F, qpb.b)
    b_new = qpb.b * 1.37 + 0.01
    with jax.default_matmul_precision("float32"):
        ref, _ = jax.vmap(
            lambda L_, g, F, b: riccati.solve(L_, g, F, b, dims.NU, Pb=None)
        )(L, g_eff, qpb.F, b_new)

    # split factor streams (the flat path's retained-factor format)
    Ll_l = sk._to_lanes(L[:, :, :, : dims.NU], B)
    Lxx_l = sk._to_lanes(L[:, :, dims.NU :, dims.NU :], B)
    Fl = sk._to_lanes(qpb.F, B)
    gF = g_eff.reshape(B, -1)
    bF = b_new.reshape(B, -1)
    zF, piF = sk.solve_flat_pb(
        Ll_l, Lxx_l, gF, Fl, bF, dims.NU, dims.NZ, dims.NX
    )
    np.testing.assert_allclose(
        np.asarray(zF), np.asarray(ref.z.reshape(B, -1)), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(piF), np.asarray(ref.pi.reshape(B, -1)), atol=5e-4
    )


def test_flat_ipm_iter_ref_matches_xla_iter_ref(interpret_pallas):
    """cfg.iter_ref through the flat engine == the XLA structured path's
    golden-parity ITER_REF implementation, iterate for iterate."""
    dims, qpb = _batch_qp(ngN=4)
    cfg_x = ipm.IPMConfig(k_max=3, mu_tol=1e-4, iter_ref=2)
    cfg_p = dataclasses.replace(cfg_x, use_pallas=True)
    sol_x = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg_x))(qpb)
    sol_p = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg_p))(qpb)
    assert bool(jnp.all(sol_x.kk == sol_p.kk))
    np.testing.assert_allclose(
        np.asarray(sol_p.z), np.asarray(sol_x.z), atol=5e-4
    )


def test_flat_ipm_iter_ref_reaches_f64_parity(interpret_pallas):
    """BASELINE north star: f32 + ITER_REF on the flat/Pallas path reaches
    <=1e-6 control parity with the f64 solver at MATCHED iteration count —
    without refinement, f32 stalls at mu ~1e-4 and misses this by orders
    of magnitude (the reference's own mixed-precision argument,
    d_ip2_res_hard.c:48)."""
    K = 6
    dims, qpb = _batch_qp()
    qpb64 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float64)
        if x.dtype == jnp.float32 else x, qpb
    )
    cfg64 = ipm.IPMConfig(k_max=K, mu_tol=0.0)
    sol64 = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg64))(qpb64)

    cfg_ref = ipm.IPMConfig(k_max=K, mu_tol=0.0, iter_ref=2, use_pallas=True)
    sol_ref = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg_ref))(qpb)

    # mu-gated refinement (iter_ref_mu_thr): early well-conditioned
    # iterations skip the correction re-solves entirely, yet final
    # control parity must hold — this is the parity-bench fast mode.
    # Under the default knobs this takes the TWO-STAGE route (lanes/mega
    # to mu <= thr, then LANES stage 2 + refinement via state0 hot
    # continuation).  iter_ref=1 + thr=1e-3 — bench.py's parity config
    # since round 5: one correction pass already restores <=1e-6 f64
    # control parity, and gating at 1e-3 (instead of 1e-2) lets the
    # resident stage-1 engine carry the trajectory one more decade
    # unrefined (f32 direction error ~ eps/mu ~ 1e-4 relative there);
    # measured: the final control error is IDENTICAL at thr 1e-2 / 3e-3
    # / 1e-3 on this problem family
    cfg_gated = dataclasses.replace(cfg_ref, iter_ref=1,
                                    iter_ref_mu_thr=1e-3)
    sol_gated = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg_gated))(qpb)
    # iteration budget must be respected across the handoff
    assert int(np.max(np.asarray(sol_gated.kk))) <= K

    cfg_raw = ipm.IPMConfig(k_max=K, mu_tol=0.0, use_pallas=True)
    sol_raw = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg_raw))(qpb)

    z64 = np.asarray(sol64.z, np.float64)
    u_cols = slice(0, dims.NU)
    err_ref = np.max(np.abs(np.asarray(sol_ref.z, np.float64)[:, :, u_cols]
                            - z64[:, :, u_cols]))
    err_gated = np.max(np.abs(
        np.asarray(sol_gated.z, np.float64)[:, :, u_cols]
        - z64[:, :, u_cols]))
    err_raw = np.max(np.abs(np.asarray(sol_raw.z, np.float64)[:, :, u_cols]
                            - z64[:, :, u_cols]))
    assert err_ref <= 1e-6, f"refined control error {err_ref:.2e} > 1e-6"
    assert err_gated <= 1e-6, f"gated control error {err_gated:.2e} > 1e-6"
    assert err_ref < err_raw, (err_ref, err_raw)


def test_flat_ipm_gated_iter_ref_single_engine(interpret_pallas,
                                               monkeypatch):
    """Mu-gated refinement with the two-stage route knobbed OFF
    (HPMPC_LANES_LOOP=0): the single flat engine with the in-loop
    lax.cond gate must also hold <=1e-6 f64 control parity."""
    monkeypatch.setenv("HPMPC_LANES_LOOP", "0")
    monkeypatch.setenv("HPMPC_MEGA_SWEEPS", "0")
    K = 6
    dims, qpb = _batch_qp()
    qpb64 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float64)
        if x.dtype == jnp.float32 else x, qpb
    )
    sol64 = jax.jit(lambda q: pbatch.solve_batched(
        dims, q, ipm.IPMConfig(k_max=K, mu_tol=0.0)))(qpb64)
    cfg = ipm.IPMConfig(k_max=K, mu_tol=0.0, iter_ref=2,
                        iter_ref_mu_thr=1e-2, use_pallas=True)
    sol = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg))(qpb)
    u_cols = slice(0, dims.NU)
    err = np.max(np.abs(
        np.asarray(sol.z, np.float64)[:, :, u_cols]
        - np.asarray(sol64.z, np.float64)[:, :, u_cols]))
    assert err <= 1e-6, f"gated single-engine control error {err:.2e}"


def test_flat_mixed_precision_f64_state_f32_kernels(interpret_pallas):
    """Mixed-precision mode: an f64 QP through the flat engine keeps the
    outer loop/residuals in f64 while the Pallas KKT solves run f32 — and
    must track the full-f64 structured solver to near-f64 accuracy (the
    f32 factorization is only a direction oracle; residual precision sets
    the attainable accuracy).  This is the accuracy-mode answer to the f32
    barrier floor (reference mixed-precision idea, d_ip2_res_hard.c:48).

    Note: the QP must be FEASIBLE — ``ngN=4`` at N=4 imposes a terminal
    equality x_N[0:4]==0 that is unreachable with |u|<=0.5 from
    x0=(2.5,2.5,...), and on that infeasible QP mu diverges even in pure
    f64 (verified: the mixed path tracks the diverging f64 trajectory to
    ~7 digits, so the engine is still faithful).  Interior ng stages with
    the +-100 bounds keep the general-constraint machinery exercised."""
    dims, qpb = _batch_qp(N=5, ng=2)
    qpb64 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float64)
        if x.dtype == jnp.float32 else x, qpb
    )
    K = 12
    cfg64 = ipm.IPMConfig(k_max=K, mu_tol=1e-12)
    sol64 = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg64))(qpb64)
    cfg_mx = dataclasses.replace(cfg64, use_pallas=True)
    solmx = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg_mx))(qpb64)

    assert solmx.z.dtype == jnp.float64
    kk64 = np.asarray(sol64.kk); kkmx = np.asarray(solmx.kk)
    assert (kk64 == kkmx).mean() > 0.95  # same iteration paths
    z64 = np.asarray(sol64.z); zmx = np.asarray(solmx.z)
    err = np.abs(zmx - z64).max()
    assert err < 1e-8, f"mixed-mode error {err:.2e}"
    # final duality measure reaches deep f64 territory (measured ~1e-13)
    stat = np.asarray(solmx.stat)
    mu_fin = np.array([stat[b, kkmx[b]-1, 4] for b in range(len(kkmx))])
    assert np.median(mu_fin) < 1e-10


def test_soft_ipm_pallas_route_matches_xla(interpret_pallas):
    """cfg.use_pallas on the SOFT IPM routes its KKT factor/solve through
    the fused Pallas stage kernels (the soft barrier's Schur-eliminated
    slack terms are pure diagonal, so the hard chain kernels serve
    unchanged) — must reproduce the XLA route iterate-for-iterate."""
    import jax.numpy as jnp

    from hpmpc_tpu.models import ipm_soft
    from hpmpc_tpu.utils.mass_spring import mass_spring_soft_qp

    B = 1024
    dims, qp, soft = mass_spring_soft_qp(8, 3, 5, Z=10.0, dtype=jnp.float32)
    qps = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), qp
    )
    softs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), soft
    )
    rng = np.random.default_rng(3)
    qps = dataclasses.replace(
        qps,
        g=qps.g * jnp.asarray(
            1 + 0.02 * rng.standard_normal(B), jnp.float32
        )[:, None, None],
    )
    cfg_x = ipm.IPMConfig(k_max=4, mu0=100.0, mu_tol=1e-5)
    cfg_p = dataclasses.replace(cfg_x, use_pallas=True)
    run = lambda cfg: jax.jit(
        jax.vmap(lambda q, s: ipm_soft.solve(dims, q, s, cfg))
    )(qps, softs)
    sol_x = run(cfg_x)
    sol_p = run(cfg_p)
    assert bool(jnp.all(sol_x.kk == sol_p.kk))
    np.testing.assert_allclose(
        np.asarray(sol_p.z), np.asarray(sol_x.z), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(sol_p.stat), np.asarray(sol_x.stat), atol=1e-3
    )


def test_soft_flat_engine_matches_structured(interpret_pallas, monkeypatch):
    """The flat-state soft engine (ipm_soft_fast, entered via
    batch.solve_batched_soft) must reproduce the structured vmapped soft
    IPM iterate-for-iterate: same iteration counts, same stat rows, same
    solution."""
    import jax.numpy as jnp

    # pin the FLAT engine (soft dispatch defaults to lanes/mega since the
    # 2026-08-19 hardware validation)
    monkeypatch.setenv("HPMPC_LANES_LOOP", "0")
    monkeypatch.setenv("HPMPC_MEGA_SWEEPS", "0")

    from hpmpc_tpu.models import ipm_soft
    from hpmpc_tpu.utils.mass_spring import mass_spring_soft_qp

    B = 1024
    dims, qp, soft = mass_spring_soft_qp(8, 3, 5, Z=10.0, dtype=jnp.float32)
    qps = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), qp
    )
    softs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), soft
    )
    rng = np.random.default_rng(5)
    qps = dataclasses.replace(
        qps,
        g=qps.g * jnp.asarray(
            1 + 0.02 * rng.standard_normal(B), jnp.float32
        )[:, None, None],
    )
    idxbs = np.asarray(soft.idxbs)
    cfg = ipm.IPMConfig(k_max=4, mu0=100.0, mu_tol=1e-5)

    sol_x = jax.jit(
        jax.vmap(lambda q, s: ipm_soft.solve(dims, q, s, cfg))
    )(qps, softs)
    cfg_f = dataclasses.replace(cfg, use_pallas=True)
    sol_f = jax.jit(
        lambda q, s: pbatch.solve_batched_soft(dims, q, s, cfg_f, idxbs=idxbs)
    )(qps, softs)

    assert bool(jnp.all(sol_x.kk == sol_f.kk))
    np.testing.assert_allclose(
        np.asarray(sol_f.z), np.asarray(sol_x.z), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(sol_f.stat), np.asarray(sol_x.stat), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(sol_f.lam_s), np.asarray(sol_x.lam_s), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(sol_f.t_s), np.asarray(sol_x.t_s), atol=5e-3
    )


def test_soft_flat_engine_with_general_constraints(
    interpret_pallas, monkeypatch
):
    """Soft flat engine with ng rows active: exercises ipm_soft_fast's
    packed barrier-term assembly (paired C streams) against the
    structured soft path."""
    import jax.numpy as jnp

    monkeypatch.setenv("HPMPC_LANES_LOOP", "0")
    monkeypatch.setenv("HPMPC_MEGA_SWEEPS", "0")

    from hpmpc_tpu.models import ipm_soft
    from hpmpc_tpu.ocp import OCPDims
    from hpmpc_tpu.utils.mass_spring import mass_spring_soft_qp

    B = 1024
    dims0, qp, soft = mass_spring_soft_qp(8, 3, 5, Z=10.0, dtype=jnp.float32)
    N, NZ, NU = dims0.N, dims0.NZ, dims0.NU

    # add one general row (weighted state sum) on stages 2 and N
    ng = [0] * (N + 1)
    ng[2] = ng[N] = 1
    dims = OCPDims.create(N, dims0.nx, dims0.nu, dims0.nb, ng,
                          idxb=dims0.idxb)
    NG = dims.NG
    C = np.zeros((N + 1, NG, NZ), np.float32)
    d_lg = np.zeros((N + 1, NG), np.float32)
    d_ug = np.zeros((N + 1, NG), np.float32)
    for n in (2, N):
        C[n, 0, NU : NU + dims0.nx[n]] = 0.25
        d_lg[n, 0] = -1.0
        d_ug[n, 0] = 1.0
    qp = dataclasses.replace(
        qp, C=jnp.asarray(C), d_lg=jnp.asarray(d_lg),
        d_ug=jnp.asarray(d_ug), ng_mask=jnp.asarray(dims.ng_mask(),
                                                    jnp.float32),
    )

    qps = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), qp
    )
    softs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), soft
    )
    rng = np.random.default_rng(7)
    qps = dataclasses.replace(
        qps,
        g=qps.g * jnp.asarray(
            1 + 0.02 * rng.standard_normal(B), jnp.float32
        )[:, None, None],
    )
    idxbs = np.asarray(soft.idxbs)
    cfg = ipm.IPMConfig(k_max=4, mu0=100.0, mu_tol=1e-5)

    sol_x = jax.jit(
        jax.vmap(lambda q, s: ipm_soft.solve(dims, q, s, cfg))
    )(qps, softs)
    cfg_f = dataclasses.replace(cfg, use_pallas=True)
    sol_f = jax.jit(
        lambda q, s: pbatch.solve_batched_soft(dims, q, s, cfg_f,
                                               idxbs=idxbs)
    )(qps, softs)

    assert bool(jnp.all(sol_x.kk == sol_f.kk))
    np.testing.assert_allclose(
        np.asarray(sol_f.z), np.asarray(sol_x.z), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(sol_f.stat), np.asarray(sol_x.stat), atol=1e-3
    )


def test_solve_flat_fused_matches_sequential(interpret_pallas):
    """The fused trs+fwd kernel (one two-phase-grid pallas_call) must
    match the sequential solve_flat pair.  Tolerance, not bit-equality:
    XLA/Mosaic FMA contraction differs with surrounding code, so kernel
    variants of the same formula differ at the last ulp."""
    from hpmpc_tpu.ops import stage_kernel as sk

    dims, qpb = _batch_qp()
    N, NU, NX, NZ = dims.N, dims.NU, dims.NX, dims.NZ
    B = qpb.b.shape[0]
    NZF, NXF = (N + 1) * NZ, N * NX
    Hl = sk._to_lanes(sk.sym_compress(qpb.H), B)
    Fl = sk._to_lanes(qpb.F, B)
    gF = (qpb.g * qpb.z_mask).reshape(B, NZF)
    bF = qpb.b.reshape(B, NXF)
    pad = qpb.pad_diag.reshape(B, NZF)
    ngl = jnp.zeros(
        (B // sk.BI, 1, sk._sym_nt(NZ), sk.SUBS, sk.LANES), jnp.float32
    )
    _, _, (Ll_l, Lxx_l, Pb_l) = sk.factor_solve_folded_flat(
        Hl, pad + 1.0, ngl, (), gF, Fl, bF, NU, NZ, NX
    )
    g2 = gF * 0.7 + 0.01
    z_ref, pi_ref = sk.solve_flat(Ll_l, Lxx_l, Pb_l, g2, Fl, bF, NU, NZ, NX)
    z_fus, pi_fus = sk.solve_flat_fused(
        Ll_l, Lxx_l, Pb_l, g2, Fl, bF, NU, NZ, NX
    )
    np.testing.assert_allclose(np.asarray(z_fus), np.asarray(z_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pi_fus), np.asarray(pi_ref), atol=1e-4)


def test_factor_solve_fused_matches_sequential(interpret_pallas):
    """The fused sv+fwd kernel must match the sequential
    factor_solve_folded_flat pair: same z and same retained factor
    (tolerance — FMA contraction differs between kernel variants)."""
    from hpmpc_tpu.ops import stage_kernel as sk

    dims, qpb = _batch_qp(ngN=4)
    N, NU, NX, NZ = dims.N, dims.NU, dims.NX, dims.NZ
    B = qpb.b.shape[0]
    NZF, NXF = (N + 1) * NZ, N * NX
    ng_stages = tuple(n for n in range(N + 1) if dims.ng[n] > 0)
    Hl = sk._to_lanes(sk.sym_compress(qpb.H), B)
    Fl = sk._to_lanes(qpb.F, B)
    gF = (qpb.g * qpb.z_mask).reshape(B, NZF)
    bF = qpb.b.reshape(B, NXF)
    dvecF = qpb.pad_diag.reshape(B, NZF) + 0.7
    # a PSD barrier term C' diag(q) C (a random symmetric slab would make
    # M indefinite and the factorization legitimately blow up)
    rng = np.random.default_rng(9)
    q_pos = jnp.asarray(
        rng.random((B, len(ng_stages), dims.NG)) + 0.5, jnp.float32
    )
    idx = np.asarray(ng_stages)
    ngterm = jnp.einsum(
        "bngz,bng,bngw->bnzw", qpb.C[:, idx], q_pos, qpb.C[:, idx]
    )
    ngl = sk._to_lanes(sk.sym_compress(ngterm), B)

    z_ref, _, (Ll_r, Lxx_r, Pb_r) = sk.factor_solve_folded_flat(
        Hl, dvecF, ngl, ng_stages, gF, Fl, bF, NU, NZ, NX, want_pi=False
    )
    z_fus, pi_none, (Ll_f, Lxx_f, Pb_f) = sk.factor_solve_folded_flat_fused(
        Hl, dvecF, ngl, ng_stages, gF, Fl, bF, NU, NZ, NX
    )
    assert pi_none is None
    np.testing.assert_allclose(np.asarray(z_fus), np.asarray(z_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(Ll_f), np.asarray(Ll_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(Lxx_f), np.asarray(Lxx_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(Pb_f), np.asarray(Pb_r), atol=1e-5)


def test_flat_engine_fused_sweeps_flag(interpret_pallas, monkeypatch):
    """HPMPC_FUSED_SWEEPS routes the engine through the fused two-phase
    kernels; iterates must match the default engine."""
    from hpmpc_tpu.models import ipm_fast

    dims, qpb = _batch_qp(ngN=4)
    cfg = ipm.IPMConfig(k_max=3, mu_tol=1e-4, use_pallas=True)
    sol_d = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg))(qpb)
    monkeypatch.setenv("HPMPC_FUSED_SWEEPS", "1")
    sol_f = jax.jit(lambda q: pbatch.solve_batched(dims, q, cfg))(qpb)
    assert bool(jnp.all(sol_d.kk == sol_f.kk))
    np.testing.assert_allclose(
        np.asarray(sol_f.z), np.asarray(sol_d.z), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(sol_f.pi), np.asarray(sol_d.pi), atol=5e-3
    )


def test_soft_engine_fused_sweeps_flag(interpret_pallas, monkeypatch):
    """The soft engine's corrector resolve also routes through the fused
    kernel under HPMPC_FUSED_SWEEPS; iterates must match the default."""
    import jax.numpy as jnp

    monkeypatch.setenv("HPMPC_LANES_LOOP", "0")
    monkeypatch.setenv("HPMPC_MEGA_SWEEPS", "0")

    from hpmpc_tpu.models import ipm_fast
    from hpmpc_tpu.utils.mass_spring import mass_spring_soft_qp

    B = 1024
    dims, qp, soft = mass_spring_soft_qp(8, 3, 5, Z=10.0, dtype=jnp.float32)
    qps = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), qp
    )
    softs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), soft
    )
    rng = np.random.default_rng(11)
    qps = dataclasses.replace(
        qps,
        g=qps.g * jnp.asarray(
            1 + 0.02 * rng.standard_normal(B), jnp.float32
        )[:, None, None],
    )
    idxbs = np.asarray(soft.idxbs)
    cfg = ipm.IPMConfig(k_max=4, mu0=100.0, mu_tol=1e-5, use_pallas=True)

    sol_d = jax.jit(
        lambda q, s: pbatch.solve_batched_soft(dims, q, s, cfg, idxbs=idxbs)
    )(qps, softs)
    monkeypatch.setenv("HPMPC_FUSED_SWEEPS", "1")
    sol_f = jax.jit(
        lambda q, s: pbatch.solve_batched_soft(dims, q, s, cfg, idxbs=idxbs)
    )(qps, softs)
    assert bool(jnp.all(sol_d.kk == sol_f.kk))
    np.testing.assert_allclose(
        np.asarray(sol_f.z), np.asarray(sol_d.z), atol=5e-4
    )
