"""Step-primitive kernel tests (interpret mode): each kernel must match a
straightforward numpy transcription of the reference step-primitive math
(mpc_solvers/c99/d_aux_ip_hard_lib4.c twins; see ops/step_kernel.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from hpmpc_tpu.ops import stage_kernel as sk


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    yield


B, NP1, NZ, NU, NX, NB = 1024, 4, 5, 2, 3, 2
N = NP1 - 1
NB2 = 2 * NB


def to_lanes(x):
    """(B, Np1, K) -> (nb, Np1, K, 8, 128)."""
    nb = x.shape[0] // sk.BI
    y = x.reshape((nb, sk.SUBS, sk.LANES) + x.shape[1:])
    return np.transpose(y, (0, 3, 4, 1, 2))


def from_lanes(y):
    """(nb, Np1, K, 8, 128) -> (B, Np1, K)."""
    x = np.transpose(y, (0, 3, 4, 1, 2))
    return x.reshape((-1,) + x.shape[3:])


def _rand_problem(seed=0):
    rng = np.random.default_rng(seed)
    lam = rng.uniform(0.1, 2.0, (B, NP1, NB2)).astype(np.float32)
    t = rng.uniform(0.1, 2.0, (B, NP1, NB2)).astype(np.float32)
    A = rng.standard_normal((B, NP1, NB2)).astype(np.float32)
    M = rng.uniform(0.01, 1.0, (B, NP1, NB2)).astype(np.float32)
    mb = np.ones((B, NP1, NB2), np.float32)
    mb[:, -1, 1] = 0.0  # a masked (padded) constraint, both sides
    mb[:, -1, 1 + NB] = 0.0
    lam = lam * mb
    base = rng.standard_normal((B, NP1, NZ)).astype(np.float32)
    pdreg = rng.uniform(0.0, 0.1, (B, NP1, NZ)).astype(np.float32)
    idx = np.zeros((NP1, NB), np.int32)
    for n in range(NP1):
        idx[n] = np.sort(
            rng.choice(NZ, size=NB, replace=False)
        ).astype(np.int32)
    return rng, lam, t, A, M, mb, base, pdreg, idx


def _ref_qx(phase2, lam, t, mb, A, M):
    t_inv = np.where(mb > 0, 1.0 / t, 0.0)
    lamt = lam * t_inv
    if phase2:
        q_lo = t_inv[..., :NB] * M[..., :NB] - lamt[..., :NB] * A[..., :NB]
        q_up = -t_inv[..., NB:] * M[..., NB:] - lamt[..., NB:] * A[..., NB:]
    else:
        q_lo = -lam[..., :NB] - lamt[..., :NB] * A[..., :NB]
        q_up = lam[..., NB:] - lamt[..., NB:] * A[..., NB:]
    mbl = mb[..., :NB]
    return (lamt[..., :NB] + lamt[..., NB:]) * mbl, (q_lo + q_up) * mbl


def _scatter(dst, idx, v):
    for n in range(NP1):
        for k in range(NB):
            dst[:, n, idx[n, k]] += v[:, n, k]
    return dst


@pytest.mark.parametrize("phase2", [False, True])
def test_prep_flat(interpret_pallas, phase2):
    from hpmpc_tpu.ops import step_kernel as stk

    _, lam, t, A, M, mb, base, pdreg, idx = _rand_problem()
    Qx_f, qx_f = _ref_qx(phase2, lam, t, mb, A, M)
    dvec_ref = _scatter(pdreg.copy(), idx, Qx_f)
    geff_ref = _scatter(base.copy(), idx, qx_f)

    dvec_l, geff_l = stk.prep_flat(
        jnp.asarray(idx), *(jnp.asarray(to_lanes(a))
                            for a in (lam, t, A)),
        jnp.asarray(to_lanes(M)) if phase2 else None,
        *(jnp.asarray(to_lanes(a)) for a in (mb, base, pdreg)),
        NB=NB, NZ=NZ, phase2=phase2,
    )
    np.testing.assert_allclose(from_lanes(np.asarray(dvec_l)), dvec_ref,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(from_lanes(np.asarray(geff_l)), geff_ref,
                               rtol=1e-6, atol=1e-6)


def _ref_dt_dlam(phase2, lam, t, mb, A, M, zb, dl0):
    t_inv = np.where(mb > 0, 1.0 / t, 0.0)
    lamt = lam * t_inv
    if phase2:
        dt_lo = (zb - A[..., :NB]) * mb[..., :NB]
        dt_up = (A[..., NB:] - zb) * mb[..., NB:]
        dt = np.concatenate([dt_lo, dt_up], -1)
        dl = -t_inv * (lam * dt + M) * mb
    else:
        dt_lo = ((zb - A[..., :NB]) - t[..., :NB]) * mb[..., :NB]
        dt_up = ((A[..., NB:] - zb) - t[..., NB:]) * mb[..., NB:]
        dt = np.concatenate([dt_lo, dt_up], -1)
        dl = (dl0 - lamt * dt - lam) * mb
    return dt, dl


@pytest.mark.parametrize("phase2,corrector", [
    (False, False), (False, True), (True, False), (True, True),
])
def test_alpha_sums_flat(interpret_pallas, phase2, corrector):
    from hpmpc_tpu.ops import step_kernel as stk

    rng, lam, t, A, M, mb, _, _, idx = _rand_problem(1)
    dz = rng.standard_normal((B, NP1, NZ)).astype(np.float32)
    dl0 = rng.standard_normal((B, NP1, NB2)).astype(np.float32)

    zb = np.stack(
        [np.stack([dz[:, n, idx[n, k]] for k in range(NB)], -1)
         for n in range(NP1)], 1,
    )
    # phase 2 carries rm (affine) or rm2 (corrector) in the M slot; the
    # phase-1 corrector carries the centering correction dl2 in dl0
    M_eff = (dl0 if corrector else M) if phase2 else None
    dl0_eff = dl0 if (corrector and not phase2) else None
    dt_ref, dl_ref = _ref_dt_dlam(
        phase2, lam, t, mb, A, M_eff, zb,
        dl0_eff if dl0_eff is not None else 0.0,
    )
    pred_l = (dl_ref < 0) & (mb > 0)
    pred_t = (dt_ref < 0) & (mb > 0)
    cands = np.minimum(
        np.where(pred_l, -lam / np.where(pred_l, dl_ref, -1.0), np.inf),
        np.where(pred_t, -t / np.where(pred_t, dt_ref, -1.0), np.inf),
    )
    amin_ref = cands.min(-1)
    s0_ref = (lam * t * mb).sum(-1)
    s1_ref = (lam * dt_ref + t * dl_ref).sum(-1)
    s2_ref = (dl_ref * dt_ref).sum(-1)

    outs = stk.alpha_sums_flat(
        jnp.asarray(idx), jnp.asarray(to_lanes(dz)),
        *(jnp.asarray(to_lanes(a)) for a in (lam, t, A)),
        jnp.asarray(to_lanes(M_eff)) if M_eff is not None else None,
        jnp.asarray(to_lanes(dl0_eff)) if dl0_eff is not None else None,
        jnp.asarray(to_lanes(mb)),
        NB=NB, NZ=NZ, phase2=phase2,
    )
    dt_l, dl_l, amin, s0, s1, s2 = outs
    np.testing.assert_allclose(from_lanes(np.asarray(dt_l)), dt_ref,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(from_lanes(np.asarray(dl_l)), dl_ref,
                               rtol=1e-6, atol=1e-5)
    got_amin = np.asarray(amin)
    got_amin = np.transpose(got_amin, (0, 2, 3, 1)).reshape(B, NP1)
    np.testing.assert_allclose(got_amin, amin_ref, rtol=1e-5)
    for got, ref in ((s0, s0_ref), (s1, s1_ref), (s2, s2_ref)):
        g = np.transpose(np.asarray(got), (0, 2, 3, 1)).reshape(B, NP1)
        np.testing.assert_allclose(g, ref, rtol=2e-5, atol=1e-4)


@pytest.mark.parametrize("phase2", [False, True])
def test_corr_geff_flat(interpret_pallas, phase2):
    from hpmpc_tpu.ops import step_kernel as stk

    rng, lam, t, A, M, mb, base, _, idx = _rand_problem(2)
    dtb = rng.standard_normal((B, NP1, NB2)).astype(np.float32)
    dlb = rng.standard_normal((B, NP1, NB2)).astype(np.float32)
    sm = rng.uniform(0.01, 0.2, (B,)).astype(np.float32)

    t_inv = np.where(mb > 0, 1.0 / t, 0.0)
    lamt = lam * t_inv
    smb = sm[:, None, None]
    if phase2:
        co_ref = (M + (dtb * dlb - smb)) * mb
        q_lo = t_inv[..., :NB] * co_ref[..., :NB] - lamt[..., :NB] * A[..., :NB]
        q_up = -t_inv[..., NB:] * co_ref[..., NB:] - lamt[..., NB:] * A[..., NB:]
    else:
        co_ref = t_inv * (smb - dlb * dtb) * mb
        q_lo = (-lam[..., :NB] - lamt[..., :NB] * A[..., :NB]
                - co_ref[..., :NB])
        q_up = (lam[..., NB:] - lamt[..., NB:] * A[..., NB:]
                + co_ref[..., NB:])
    qx_f = (q_lo + q_up) * mb[..., :NB]
    geff_ref = _scatter(base.copy(), idx, qx_f)

    sm_l = jnp.asarray(sm.reshape(-1, sk.SUBS, sk.LANES)[:, None])
    geff2_l, co_l = stk.corr_geff_flat(
        jnp.asarray(idx),
        *(jnp.asarray(to_lanes(a)) for a in (lam, t, A)),
        jnp.asarray(to_lanes(M)) if phase2 else None,
        jnp.asarray(to_lanes(dtb)), jnp.asarray(to_lanes(dlb)),
        sm_l,
        jnp.asarray(to_lanes(base)), jnp.asarray(to_lanes(mb)),
        NB=NB, NZ=NZ, phase2=phase2,
    )
    np.testing.assert_allclose(from_lanes(np.asarray(co_l)), co_ref,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(from_lanes(np.asarray(geff2_l)), geff_ref,
                               rtol=1e-5, atol=1e-5)


def test_resid_full_flat(interpret_pallas):
    from hpmpc_tpu.ops import step_kernel as stk

    rng, lam, t, A, M, mb, base, _, idx = _rand_problem(3)
    dcat = A
    z = rng.standard_normal((B, NP1, NZ)).astype(np.float32)
    pi = rng.standard_normal((B, N, NX)).astype(np.float32)
    g = base
    b = rng.standard_normal((B, N, NX)).astype(np.float32)
    Hs = rng.standard_normal((B, NP1, NZ, NZ)).astype(np.float32)
    H = (Hs + np.swapaxes(Hs, -1, -2)) / 2
    F = rng.standard_normal((B, N, NZ, NX)).astype(np.float32)
    zmask = np.ones((B, NP1, NZ), np.float32)
    zmask[:, 2, NZ - 1] = 0.0
    xmask = np.ones((B, N, NX), np.float32)
    xmask[:, 1, 0] = 0.0

    rq_ref = g + np.einsum("bnij,bnj->bni", H, z)
    rq_ref[:, :N] += np.einsum("bnix,bnx->bni", F, pi)
    for n in range(1, NP1):
        rq_ref[:, n, NU:] -= pi[:, n - 1]
    lam_f = (lam[..., NB:] - lam[..., :NB]) * mb[..., :NB]
    rq_ref = _scatter(rq_ref, idx, lam_f) * zmask
    rb_ref = (b + np.einsum("bnix,bni->bnx", F, z[:, :N])
              - z[:, 1:, NU:]) * xmask
    zb = np.stack(
        [np.stack([z[:, n, idx[n, k]] for k in range(NB)], -1)
         for n in range(NP1)], 1,
    )
    zb2 = np.concatenate([zb, zb], -1)
    sg = np.concatenate([np.ones_like(zb), -np.ones_like(zb)], -1)
    rd_ref = (dcat - zb2 + sg * t) * mb
    rm_ref = lam * t * mb
    musum_ref = rm_ref.sum(-1)

    Hl = sk._to_lanes(sk.sym_compress(jnp.asarray(H)), B)
    Fl = sk._to_lanes(jnp.asarray(F), B)
    outs = stk.resid_full_flat(
        jnp.asarray(idx), Hl, Fl,
        jnp.asarray(to_lanes(z)), jnp.asarray(to_lanes(pi)),
        jnp.asarray(to_lanes(g)), jnp.asarray(to_lanes(b)),
        *(jnp.asarray(to_lanes(a)) for a in (lam, t, dcat, mb)),
        jnp.asarray(to_lanes(zmask)), jnp.asarray(to_lanes(xmask)),
        NB=NB, NU=NU, NZ=NZ, NX=NX,
    )
    rq_l, rb_l, rd_l, rm_l, musum = outs
    np.testing.assert_allclose(from_lanes(np.asarray(rq_l)), rq_ref,
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(from_lanes(np.asarray(rb_l))[:, :N], rb_ref,
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(from_lanes(np.asarray(rd_l)), rd_ref,
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(from_lanes(np.asarray(rm_l)), rm_ref,
                               rtol=1e-6, atol=1e-6)
    g = np.transpose(np.asarray(musum), (0, 2, 3, 1)).reshape(B, NP1)
    np.testing.assert_allclose(g, musum_ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# soft-variant kernels (4-slack-family step primitives)
# ---------------------------------------------------------------------------

NS = 2
NS4 = 4 * NS


def _rand_soft(seed=10):
    rng = np.random.default_rng(seed)
    lam_s = rng.uniform(0.1, 2.0, (B, NP1, NS4)).astype(np.float32)
    t_s = rng.uniform(0.1, 2.0, (B, NP1, NS4)).astype(np.float32)
    ms = np.ones((B, NP1, NS), np.float32)
    ms[:, 0, 1] = 0.0  # a masked soft slot
    ms4 = np.concatenate([ms] * 4, -1)
    lam_s = lam_s * ms4
    c = np.concatenate([
        rng.standard_normal((B, NP1, NS)).astype(np.float32),   # d_lbs
        rng.standard_normal((B, NP1, NS)).astype(np.float32),   # d_ubs
        rng.uniform(0.5, 2.0, (B, NP1, NS)).astype(np.float32),  # Z0
        rng.uniform(0.5, 2.0, (B, NP1, NS)).astype(np.float32),  # Z1
        rng.standard_normal((B, NP1, NS)).astype(np.float32),   # zlin0
        rng.standard_normal((B, NP1, NS)).astype(np.float32),   # zlin1
    ], -1)
    idxs = np.zeros((NP1, NS), np.int32)
    for n in range(NP1):
        idxs[n] = np.sort(
            rng.choice(NZ, size=NS, replace=False)).astype(np.int32)
    return rng, lam_s, t_s, ms, ms4, c, idxs


def _np_soft_schur(lam_s, t_s, ms, ms4, c):
    dlbs, dubs, Z0, Z1, zl0F, zl1F = np.split(c, 6, axis=-1)
    t_inv = np.where(ms4 > 0, 1.0 / t_s, 0.0)
    lamt = lam_s * t_inv
    lts = np.split(lamt, 4, -1)
    ls = np.split(lam_s, 4, -1)
    rQx0, rQx1 = lts[0], lts[1]
    rqx0 = ls[0] + lts[0] * dlbs
    rqx1 = ls[1] - lts[1] * dubs
    Zl0 = np.where(ms > 0, 1.0 / (Z0 + rQx0 + lts[2]), 0.0)
    Zl1 = np.where(ms > 0, 1.0 / (Z1 + rQx1 + lts[3]), 0.0)
    zl0 = -zl0F + rqx0 + ls[2]
    zl1 = -zl1F + rqx1 + ls[3]
    return dict(t_inv=t_inv, lamt=lamt, lts=lts, rQx0=rQx0, rQx1=rQx1,
                rqx0=rqx0, rqx1=rqx1, Zl0=Zl0, Zl1=Zl1, zl0=zl0, zl1=zl1,
                dlbs=dlbs, dubs=dubs)


def _scatter_s(dst, idxs, v):
    for n in range(NP1):
        for k in range(NS):
            dst[:, n, idxs[n, k]] += v[:, n, k]
    return dst


def test_soft_prep_flat(interpret_pallas):
    from hpmpc_tpu.ops import step_kernel as stk

    _, lam, t, A, M, mb, base, pdreg, idx = _rand_problem()
    _, lam_s, t_s, ms, ms4, c, idxs = _rand_soft()

    Qx_f, qx_f = _ref_qx(False, lam, t, mb, A, None)
    S = _np_soft_schur(lam_s, t_s, ms, ms4, c)
    rqx0e = S["rqx0"] - S["rQx0"] * S["zl0"] * S["Zl0"]
    rqx1e = S["rqx1"] - S["rQx1"] * S["zl1"] * S["Zl1"]
    rQx0e = S["rQx0"] - S["rQx0"] ** 2 * S["Zl0"]
    rQx1e = S["rQx1"] - S["rQx1"] ** 2 * S["Zl1"]
    Qx_s = (rQx0e + rQx1e) * ms
    qx_s = (rqx1e - rqx0e) * ms
    dvec_ref = _scatter_s(_scatter(pdreg.copy(), idx, Qx_f), idxs, Qx_s)
    geff_ref = _scatter_s(_scatter(base.copy(), idx, qx_f), idxs, qx_s)

    L = lambda a: jnp.asarray(to_lanes(a))
    dvec_l, geff_l = stk.soft_prep_flat(
        jnp.asarray(idx), jnp.asarray(idxs),
        L(lam), L(t), L(A), L(mb), L(lam_s), L(t_s), L(c), L(ms),
        L(base), L(pdreg), NB=NB, NS=NS, NZ=NZ,
    )
    np.testing.assert_allclose(from_lanes(np.asarray(dvec_l)), dvec_ref,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(from_lanes(np.asarray(geff_l)), geff_ref,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("corrector", [False, True])
def test_soft_alpha_sums_flat(interpret_pallas, corrector):
    from hpmpc_tpu.ops import step_kernel as stk

    rng, lam, t, A, M, mb, _, _, idx = _rand_problem(4)
    _, lam_s, t_s, ms, ms4, c, idxs = _rand_soft(11)
    dz = rng.standard_normal((B, NP1, NZ)).astype(np.float32)
    dl0b = rng.standard_normal((B, NP1, NB2)).astype(np.float32)
    dl2s = rng.standard_normal((B, NP1, NS4)).astype(np.float32)

    zb = np.stack([np.stack([dz[:, n, idx[n, k]] for k in range(NB)], -1)
                   for n in range(NP1)], 1)
    dt_ref, dl_ref = _ref_dt_dlam(
        False, lam, t, mb, A, None, zb, dl0b if corrector else 0.0)

    S = _np_soft_schur(lam_s, t_s, ms, ms4, c)
    zs = np.stack([np.stack([dz[:, n, idxs[n, k]] for k in range(NS)], -1)
                   for n in range(NP1)], 1) * ms
    if corrector:
        d = np.split(dl2s, 4, -1)
        zl0x = S["zl0"] + d[0] + d[2]
        zl1x = S["zl1"] + d[1] + d[3]
        dl0_s = dl2s
    else:
        zl0x, zl1x = S["zl0"], S["zl1"]
        dl0_s = 0.0
    ts = np.split(t_s, 4, -1)
    ds_lo = (zl0x - S["lts"][0] * zs) * S["Zl0"]
    ds_up = (zl1x + S["lts"][1] * zs) * S["Zl1"]
    dts_ref = np.concatenate([
        ds_lo + zs - S["dlbs"] - ts[0],
        ds_up - zs + S["dubs"] - ts[1],
        ds_lo - ts[2],
        ds_up - ts[3],
    ], -1) * ms4
    dls_ref = (dl0_s - S["lamt"] * dts_ref - lam_s) * ms4

    def cands(v, dv, m):
        pred = (dv < 0) & (m > 0)
        return np.where(pred, -v / np.where(pred, dv, -1.0), np.inf)

    amin_ref = np.minimum(
        np.minimum(cands(lam, dl_ref, mb), cands(t, dt_ref, mb)).min(-1),
        np.minimum(cands(lam_s, dls_ref, ms4),
                   cands(t_s, dts_ref, ms4)).min(-1),
    )
    s0_ref = (lam * t * mb).sum(-1) + (lam_s * t_s * ms4).sum(-1)
    s1_ref = ((lam * dt_ref + t * dl_ref).sum(-1)
              + (lam_s * dts_ref + t_s * dls_ref).sum(-1))
    s2_ref = (dl_ref * dt_ref).sum(-1) + (dls_ref * dts_ref).sum(-1)

    L = lambda a: jnp.asarray(to_lanes(a))
    outs = stk.soft_alpha_sums_flat(
        jnp.asarray(idx), jnp.asarray(idxs), L(dz),
        L(lam), L(t), L(A), L(mb), L(lam_s), L(t_s), L(c), L(ms),
        L(dl0b) if corrector else None,
        L(dl2s) if corrector else None,
        NB=NB, NS=NS, NZ=NZ, corrector=corrector,
    )
    dtb, dlb, dts, dls, amin, s0, s1, s2 = outs
    np.testing.assert_allclose(from_lanes(np.asarray(dtb)), dt_ref,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(from_lanes(np.asarray(dlb)), dl_ref,
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(from_lanes(np.asarray(dts)), dts_ref,
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(from_lanes(np.asarray(dls)), dls_ref,
                               rtol=1e-5, atol=1e-4)
    ga = np.transpose(np.asarray(amin), (0, 2, 3, 1)).reshape(B, NP1)
    np.testing.assert_allclose(ga, amin_ref, rtol=1e-5)
    for got, ref in ((s0, s0_ref), (s1, s1_ref), (s2, s2_ref)):
        g = np.transpose(np.asarray(got), (0, 2, 3, 1)).reshape(B, NP1)
        np.testing.assert_allclose(g, ref, rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("exact", [True, False])
def test_soft_corr_flat(interpret_pallas, exact):
    from hpmpc_tpu.ops import step_kernel as stk

    rng, lam, t, A, M, mb, base, _, idx = _rand_problem(5)
    _, lam_s, t_s, ms, ms4, c, idxs = _rand_soft(12)
    dtb = rng.standard_normal((B, NP1, NB2)).astype(np.float32)
    dlb = rng.standard_normal((B, NP1, NB2)).astype(np.float32)
    dts = rng.standard_normal((B, NP1, NS4)).astype(np.float32)
    dls = rng.standard_normal((B, NP1, NS4)).astype(np.float32)
    sm = rng.uniform(0.01, 0.2, (B,)).astype(np.float32)
    smb = sm[:, None, None]

    t_inv_b = np.where(mb > 0, 1.0 / t, 0.0)
    lamt_b = lam * t_inv_b
    dl2b_ref = t_inv_b * (smb - dlb * dtb) * mb
    q_lo = -lam[..., :NB] - lamt_b[..., :NB] * A[..., :NB]
    q_up = lam[..., NB:] - lamt_b[..., NB:] * A[..., NB:]
    qx_f = (q_lo + q_up + dl2b_ref[..., NB:] - dl2b_ref[..., :NB]) \
        * mb[..., :NB]

    S = _np_soft_schur(lam_s, t_s, ms, ms4, c)
    rqx0e = S["rqx0"] - S["rQx0"] * S["zl0"] * S["Zl0"]
    rqx1e = S["rqx1"] - S["rQx1"] * S["zl1"] * S["Zl1"]
    qx_s = (rqx1e - rqx0e) * ms
    dl2s_ref = S["t_inv"] * (smb - dls * dts) * ms4
    if exact:
        d = np.split(dl2s_ref, 4, -1)
        rqx0c = d[0] - S["rQx0"] * (d[0] + d[2]) * S["Zl0"]
        rqx1c = d[1] - S["rQx1"] * (d[1] + d[3]) * S["Zl1"]
        qx_s2 = qx_s + (rqx1c - rqx0c) * ms
    else:
        qx_s2 = qx_s
    geff_ref = _scatter_s(_scatter(base.copy(), idx, qx_f), idxs, qx_s2)

    L = lambda a: jnp.asarray(to_lanes(a))
    sm_l = jnp.asarray(sm.reshape(-1, sk.SUBS, sk.LANES)[:, None])
    geff2_l, dl2b_l, dl2s_l = stk.soft_corr_flat(
        jnp.asarray(idx), jnp.asarray(idxs),
        L(lam), L(t), L(A), L(mb), L(lam_s), L(t_s), L(c), L(ms),
        L(dtb), L(dlb), L(dts), L(dls), sm_l, L(base),
        NB=NB, NS=NS, NZ=NZ, exact=exact,
    )
    np.testing.assert_allclose(from_lanes(np.asarray(dl2b_l)), dl2b_ref,
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(from_lanes(np.asarray(dl2s_l)), dl2s_ref,
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(from_lanes(np.asarray(geff2_l)), geff_ref,
                               rtol=1e-5, atol=1e-4)
