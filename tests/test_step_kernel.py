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
