"""Mega-sweep kernel parity (interpret mode): each mega call must match
the composition of the individual kernels it fuses (prep + sv/trs sweep +
alpha), on the same lanes streams."""

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
NT = NZ * (NZ + 1) // 2


def to_lanes(x):
    nb = x.shape[0] // sk.BI
    y = x.reshape((nb, sk.SUBS, sk.LANES) + x.shape[1:])
    return jnp.asarray(np.transpose(y, (0, 3, 4, 1, 2)))


def _problem(seed=0, with_ng=False):
    rng = np.random.default_rng(seed)
    lam = rng.uniform(0.1, 2.0, (B, NP1, NB2)).astype(np.float32)
    t = rng.uniform(0.1, 2.0, (B, NP1, NB2)).astype(np.float32)
    A = rng.standard_normal((B, NP1, NB2)).astype(np.float32)
    M = rng.uniform(0.01, 1.0, (B, NP1, NB2)).astype(np.float32)
    mb = np.ones((B, NP1, NB2), np.float32)
    mb[:, -1, 1] = mb[:, -1, 1 + NB] = 0.0
    lam *= mb
    base = rng.standard_normal((B, NP1, NZ)).astype(np.float32)
    pdreg = np.full((B, NP1, NZ), 1e-8, np.float32)
    Hs = rng.standard_normal((B, NP1, NZ, NZ)).astype(np.float32)
    H = np.einsum("bnij,bnkj->bnik", Hs, Hs) / NZ \
        + 2.0 * np.eye(NZ, dtype=np.float32)
    F = (0.4 * rng.standard_normal((B, N, NZ, NX))).astype(np.float32)
    b = rng.standard_normal((B, N, NX)).astype(np.float32)
    idx = np.zeros((NP1, NB), np.int32)
    for n in range(NP1):
        idx[n] = np.sort(
            rng.choice(NZ, size=NB, replace=False)).astype(np.int32)
    Hl = sk._to_lanes(sk.sym_compress(jnp.asarray(H)), B)
    Fl = sk._to_lanes(jnp.asarray(F), B)
    bl = to_lanes(b)
    nb_blk = B // sk.BI
    if with_ng:
        ng_ids = (1, N)
        ngt = rng.uniform(0.0, 0.2, (B, len(ng_ids), NT)).astype(
            np.float32)
        # make the packed term an SPD-safe diagonal-dominant add: keep
        # only diagonal packed entries positive, off-diagonal zero
        dpos = [i * (i + 1) // 2 + i for i in range(NZ)]
        mask = np.zeros(NT, np.float32)
        mask[dpos] = 1.0
        ngt = ngt * mask
        ngl = sk._to_lanes_flat(
            jnp.asarray(ngt.reshape(B, -1)), B, (len(ng_ids), NT)
        )
        ngadd = rng.standard_normal(
            (B, len(ng_ids), NZ)).astype(np.float32)
        ngaddl = to_lanes(ngadd)
    else:
        ng_ids = ()
        ngl = jnp.zeros((nb_blk, 1, NT, sk.SUBS, sk.LANES), jnp.float32)
        ngadd = None
        ngaddl = jnp.zeros((nb_blk, 1, NZ, sk.SUBS, sk.LANES), jnp.float32)
    return (rng, jnp.asarray(idx), to_lanes(lam), to_lanes(t),
            to_lanes(A), to_lanes(M), to_lanes(mb), to_lanes(base),
            to_lanes(pdreg), Hl, Fl, bl, ng_ids, ngl, ngadd, ngaddl)


def _reference_affine(idx, lam, t, A, M, mb, base, pdreg, Hl, Fl, bl,
                      ng_ids, ngl, ngadd, ngaddl, phase2):
    """Composition of the separate kernels the mega-sv call fuses."""
    from hpmpc_tpu.ops import step_kernel as stk

    dvec_l, geff_l = stk.prep_flat(
        idx, lam, t, A, M if phase2 else None, mb, base, pdreg,
        NB=NB, NZ=NZ, phase2=phase2,
    )
    if ng_ids:
        add = jnp.zeros_like(geff_l)
        for k, n in enumerate(ng_ids):
            add = add.at[:, n].set(ngaddl[:, k])
        geff_l = geff_l + add
    z_l, _, fstate = sk.factor_solve_folded_flat(
        Hl, dvec_l, ngl, ng_ids, geff_l, Fl, bl, NU, NZ, NX,
        want_pi=False, lanes_io=True,
    )
    aff = stk.alpha_sums_flat(
        idx, z_l, lam, t, A, M if phase2 else None, None, mb,
        NB=NB, NZ=NZ, phase2=phase2,
    )
    return z_l, fstate, aff


@pytest.mark.parametrize("phase2,with_ng", [
    (False, False), (True, False), (False, True), (True, True),
])
def test_factor_solve_mega_matches_composition(interpret_pallas, phase2,
                                               with_ng):
    from hpmpc_tpu.ops import mega_kernel as mk

    (rng, idx, lam, t, A, M, mb, base, pdreg, Hl, Fl, bl,
     ng_ids, ngl, ngadd, ngaddl) = _problem(0, with_ng)

    z_ref, fst_ref, aff_ref = _reference_affine(
        idx, lam, t, A, M, mb, base, pdreg, Hl, Fl, bl,
        ng_ids, ngl, ngadd, ngaddl, phase2,
    )
    z_l, fstate, dt_l, dl_l, amin, s0, s1, s2 = mk.factor_solve_mega(
        idx, lam, t, A, M if phase2 else None, mb, base, pdreg, Hl,
        ngl, ngaddl, ng_ids, Fl, bl, NB=NB, NU=NU, NZ=NZ, NX=NX,
        phase2=phase2,
    )
    np.testing.assert_allclose(np.asarray(z_l), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-5)
    for got, ref in zip(fstate, fst_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
    for got, ref in zip((dt_l, dl_l, amin, s0, s1, s2), aff_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=1e-4)


@pytest.mark.parametrize("phase2,with_ng", [
    (False, False), (True, False), (False, True), (True, True),
])
def test_solve_mega_matches_composition(interpret_pallas, phase2,
                                        with_ng):
    from hpmpc_tpu.ops import mega_kernel as mk
    from hpmpc_tpu.ops import step_kernel as stk

    (rng, idx, lam, t, A, M, mb, base, pdreg, Hl, Fl, bl,
     ng_ids, ngl, ngadd, ngaddl) = _problem(1, with_ng)
    _, fstate, aff = _reference_affine(
        idx, lam, t, A, M, mb, base, pdreg, Hl, Fl, bl,
        ng_ids, ngl, ngadd, ngaddl, phase2,
    )
    dtb_l, dlb_l = aff[0], aff[1]
    sm = rng.uniform(0.01, 0.2, (B,)).astype(np.float32)
    sm_l = jnp.asarray(sm.reshape(-1, sk.SUBS, sk.LANES)[:, None])

    # reference: corr kernel + lanes trs + corrector alpha
    geff2_l, co_l = stk.corr_geff_flat(
        idx, lam, t, A, M if phase2 else None, dtb_l, dlb_l, sm_l,
        base, mb, NB=NB, NZ=NZ, phase2=phase2,
    )
    if ng_ids:
        add = jnp.zeros_like(geff2_l)
        for k, n in enumerate(ng_ids):
            add = add.at[:, n].set(ngaddl[:, k])
        geff2_l = geff2_l + add
    z2_ref, pi2_ref = sk.solve_flat(
        *fstate, geff2_l, Fl, bl, NU, NZ, NX, lanes_io=True
    )
    corr_ref = stk.alpha_sums_flat(
        idx, z2_ref, lam, t, A,
        co_l if phase2 else None,
        co_l if not phase2 else None, mb,
        NB=NB, NZ=NZ, phase2=phase2,
    )

    outs = mk.solve_mega(
        idx, fstate, lam, t, A, M if phase2 else None, mb, dtb_l, dlb_l,
        sm_l, base, ngaddl, ng_ids, Fl, bl,
        NB=NB, NU=NU, NZ=NZ, NX=NX, phase2=phase2,
    )
    z2_l, pi2_l, dt2_l, dl2_l, amin, s0, s1, s2 = outs
    np.testing.assert_allclose(np.asarray(z2_l), np.asarray(z2_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pi2_l), np.asarray(pi2_ref),
                               rtol=1e-5, atol=1e-4)
    for got, ref in zip((dt2_l, dl2_l, amin, s0, s1, s2), corr_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=1e-4)
