"""High-level NumPy front door — the reference's fortran-order interface.

Mirrors ``fortran_order_d_ip_ocp_hard_tv`` semantics
(``interfaces/c/fortran_order_interface.c``; header
``include/c_interface.h:62-76``): the user supplies per-stage column-major
NumPy arrays ``A, B, b, Q, S, R, q, r`` (+ box bounds with logical ``[u;x]``
indices, general constraint rows ``C/D`` with two-sided bounds), picks an
optional partial-condensing horizon ``N2 < N``, and gets back
``x, u, pi, lam, t``, the per-iteration ``stat`` trace and
``inf_norm_res = {|rq|inf, |rb|inf, |rd|inf, mu}`` (``doc/guide.tex:313-315``).

Packing runs through the native C++ layer (``native/src/packing.cpp``,
loaded via ctypes) when the shared library is built, with a pure-numpy
fallback — the reference's L6 interface layer is native C, and so is ours.

Workspace planning: :func:`work_space_size_bytes` is the analogue of
``hpmpc_d_ip_ocp_hard_tv_work_space_size_bytes`` (``c_interface.h:40``) —
JAX manages memory, so the number is a planning figure (device bytes per
solve) rather than a buffer the caller must allocate.
"""

from __future__ import annotations

import ctypes
import functools
import os
from typing import NamedTuple, Sequence

import numpy as np

from .models import cond as _cond
from .models import ipm as _ipm
from .ocp import OCPDims, pack_ocp

# installed-package location first (built by setup.py), then the
# repo-checkout location (native/build.sh)
_NATIVE_PATHS = [
    os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "lib", "libhpmpc_tpu_native.so",
    ),
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native", "lib", "libhpmpc_tpu_native.so",
    ),
]
_NATIVE_PATH = next(
    (p for p in _NATIVE_PATHS if os.path.exists(p)), _NATIVE_PATHS[1]
)


def _load_native():
    try:
        lib = ctypes.CDLL(_NATIVE_PATH)
        lib.hpmpc_tpu_ip_ocp_hard_tv_work_space_size_bytes.restype = ctypes.c_int64
        # runtime self-test: a trivial workspace query must return a sane
        # positive size, else fall back to the numpy twin (guards against a
        # stale/mis-built shared library)
        one = (ctypes.c_int * 2)(1, 1)
        n = int(
            lib.hpmpc_tpu_ip_ocp_hard_tv_work_space_size_bytes(
                1, one, one, one, one, 1, 8
            )
        )
        if not (0 < n < 1 << 40):
            return None
        return lib
    except OSError:
        return None


_native = _load_native()


def native_available() -> bool:
    return _native is not None


def _ptr_array(mats: Sequence[np.ndarray]):
    """Array of double* pointers to Fortran-contiguous copies."""
    fortran = [np.asfortranarray(np.asarray(m, dtype=np.float64)) for m in mats]
    arr = (ctypes.POINTER(ctypes.c_double) * len(fortran))()
    for i, m in enumerate(fortran):
        arr[i] = m.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    return arr, fortran  # keep refs alive


def _int_ptr_array(vecs: Sequence[np.ndarray]):
    ints = [np.ascontiguousarray(np.asarray(v, dtype=np.int32)) for v in vecs]
    arr = (ctypes.POINTER(ctypes.c_int) * len(ints))()
    for i, v in enumerate(ints):
        arr[i] = v.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    return arr, ints


def _c_ints(v):
    return (ctypes.c_int * len(v))(*v)


class OCPResult(NamedTuple):
    x: list  # per-stage state estimates (length N+1, each (nx[n],))
    u: list  # per-stage inputs (length N+1, each (nu[n],))
    pi: list  # equality multipliers (length N, each (nx[n+1],))
    lam: list  # per-stage multipliers [lb, ub, lg, ug] concatenated
    t: list  # per-stage slacks, same layout
    kk: int
    status: int
    stat: np.ndarray  # (kk, 5) {sigma, alpha_aff, mu_aff, alpha, mu}
    inf_norm_res: np.ndarray  # (4,)


def pack_problem(
    N,
    A, B, b,
    Q, S, R, q, r,
    idxb=None, lb=None, ub=None,
    C=None, D=None, lg=None, ug=None,
    x0=None,
    dtype=np.float64,
):
    """Build (dims, qp) from fortran-order per-stage data.

    ``x0`` given: the fixed initial state is eliminated like the reference
    tests do (``test_d_ip_hard.c:199-204``): nx[0]=0, b_0 <- b_0 + A_0 x0,
    r_0 <- r_0 + S_0 x0, stage-0 state bounds dropped.
    """
    import jax.numpy as jnp

    A = list(A); B = list(B); b = list(b)
    Q = list(Q); S = list(S); R = list(R); q = list(q); r = list(r)
    # nx[n] is the COLUMN count of A[n] (A[n]: (nx[n+1], nx[n]) maps stage
    # n to n+1); the terminal size comes from Q[N].  Inferring from
    # B[n].shape[0] would shift time-varying state sizes by one stage.
    # Terminal-stage inputs (nu[N] > 0, e.g. slack variables of the
    # soft-as-hard augmentation) are inferred from R[N] — zero-size R[N]
    # keeps the classic nu[N] = 0.
    nx_v = [np.asarray(An).shape[1] for An in A] + [np.asarray(Q[-1]).shape[0]]
    nuN = int(np.asarray(R[-1]).shape[0]) if len(R) == N + 1 else 0
    nu_v = [np.asarray(Bn).shape[1] for Bn in B] + [nuN]
    for n, Bn in enumerate(B):
        if np.asarray(Bn).shape[0] != nx_v[n + 1]:
            raise ValueError(
                f"B[{n}] has {np.asarray(Bn).shape[0]} rows but stage "
                f"{n + 1} has nx={nx_v[n + 1]} (from A/Q shapes)"
            )

    if x0 is not None:
        x0 = np.asarray(x0, dtype=np.float64).reshape(-1)
        b = [np.asarray(b[0]).reshape(-1) + np.asarray(A[0]) @ x0] + [
            np.asarray(bb) for bb in b[1:]
        ]
        r = [np.asarray(r[0]).reshape(-1) + np.asarray(S[0]).reshape(nu_v[0], -1) @ x0] + [
            np.asarray(rr) for rr in r[1:]
        ]
        A = [np.zeros((nx_v[1], 0))] + [np.asarray(a) for a in A[1:]]
        S = [np.zeros((nu_v[0], 0))] + [np.asarray(s) for s in S[1:]]
        Q = [np.zeros((0, 0))] + [np.asarray(qq) for qq in Q[1:]]
        q = [np.zeros(0)] + [np.asarray(qq) for qq in q[1:]]
        nx_v[0] = 0
        if idxb is not None:
            # drop stage-0 state bounds (those coordinates are eliminated)
            keep = [j for j, v in enumerate(np.asarray(idxb[0])) if v < nu_v[0]]
            idxb = [np.asarray(idxb[0])[keep]] + [np.asarray(i) for i in idxb[1:]]
            lb = [np.asarray(lb[0])[keep]] + [np.asarray(l) for l in lb[1:]]
            ub = [np.asarray(ub[0])[keep]] + [np.asarray(u_) for u_ in ub[1:]]

    nb_v = [len(np.asarray(i)) for i in idxb] if idxb is not None else [0] * (N + 1)
    ng_v = (
        [np.asarray(c).shape[0] if c is not None else 0 for c in C]
        if C is not None
        else [0] * (N + 1)
    )
    dims = OCPDims.create(N, nx_v, nu_v, nb_v, ng_v, idxb=idxb)
    qp = pack_ocp(
        dims, A, B, b, Q, S, R, q, r,
        idxb=idxb, lb=lb, ub=ub, C=C, D=D, lg=lg, ug=ug,
        dtype=jnp.float64 if dtype == np.float64 else jnp.float32,
    )
    return dims, qp


# --------------------------------------------------------------------------
# compiled-solver cache (dims and cfg are frozen/hashable) — repeated
# front-door calls at the same problem geometry reuse the same executable
# instead of recompiling (the reference's retained-workspace idiom).
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _jit_direct(dims: OCPDims, cfg: _ipm.IPMConfig):
    import jax

    return jax.jit(lambda qq: _ipm.solve(dims, qq, cfg, return_carry=True))


@functools.lru_cache(maxsize=None)
def _jit_warm(dims: OCPDims, cfg: _ipm.IPMConfig):
    import jax

    return jax.jit(
        lambda qq, z0, pi0: _ipm.solve(
            dims, qq, cfg, z0=z0, pi0=pi0, return_carry=True
        )
    )


@functools.lru_cache(maxsize=None)
def _jit_partial_cond(dims: OCPDims, cfg: _ipm.IPMConfig, N2: int):
    import jax

    return jax.jit(lambda qq: _cond.solve_partial_cond(dims, qq, cfg, N2)[0])


@functools.lru_cache(maxsize=None)
def _jit_new_rhs(dims: OCPDims):
    import jax

    return jax.jit(lambda qq, carry: _ipm.kkt_solve_new_rhs(dims, qq, carry))


@functools.lru_cache(maxsize=None)
def _jit_single_newton(dims: OCPDims, cfg: _ipm.IPMConfig):
    import jax

    return jax.jit(
        lambda qq, it: _ipm.solve_single_newton(
            dims, qq, cfg, *it, return_carry=True
        )
    )


@functools.lru_cache(maxsize=None)
def _jit_soft(dims: OCPDims, cfg: _ipm.IPMConfig):
    """Cached jitted soft solve + exact residuals (one executable per
    problem geometry — the soft twin of :func:`_jit_direct`; repeated
    ``solve_ocp_soft`` calls at fixed dims do not recompile)."""
    import jax

    from .models import ipm_soft as _soft

    def run(qq, ss):
        sol = _soft.solve(dims, qq, ss, cfg)
        return sol, _soft.compute_residuals(dims, qq, ss, sol)

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _jit_soft_warm(dims: OCPDims, cfg: _ipm.IPMConfig):
    import jax

    from .models import ipm_soft as _soft

    def run(qq, ss, z0, pi0):
        sol = _soft.solve(dims, qq, ss, cfg, z0=z0, pi0=pi0)
        return sol, _soft.compute_residuals(dims, qq, ss, sol)

    return jax.jit(run)


def _unpack_result(dims: OCPDims, sol) -> OCPResult:
    N, NU = dims.N, dims.NU
    z = np.asarray(sol.z)
    x = [z[n, NU : NU + dims.nx[n]].copy() for n in range(N + 1)]
    u = [z[n, : dims.nu[n]].copy() for n in range(N + 1)]
    pi = [np.asarray(sol.pi)[n, : dims.nx[n + 1]].copy() for n in range(N)]
    lam_out, t_out = [], []
    lam_b, lam_g = np.asarray(sol.lam_b), np.asarray(sol.lam_g)
    t_b, t_g = np.asarray(sol.t_b), np.asarray(sol.t_g)
    for n in range(N + 1):
        nbn, ngn = dims.nb[n], dims.ng[n]
        lam_out.append(
            np.concatenate(
                [lam_b[n, 0, :nbn], lam_b[n, 1, :nbn],
                 lam_g[n, 0, :ngn], lam_g[n, 1, :ngn]]
            )
        )
        t_out.append(
            np.concatenate(
                [t_b[n, 0, :nbn], t_b[n, 1, :nbn],
                 t_g[n, 0, :ngn], t_g[n, 1, :ngn]]
            )
        )
    kk = int(sol.kk)
    return OCPResult(
        x=x, u=u, pi=pi, lam=lam_out, t=t_out,
        kk=kk,
        status=int(sol.status),
        stat=np.asarray(sol.stat)[:kk],
        inf_norm_res=np.asarray(sol.inf_norm_res),
    )


class OCPSession:
    """Retained-state front door for re-solves at fixed matrix data.

    Mirrors the reference's workspace-reuse API family
    (``include/c_interface.h:62-76``): after :func:`solve_ocp` with
    ``return_session=True``, call

    - :meth:`solve_new_rhs` — re-solve for changed vector data (b, q, r,
      bounds, x0) reusing the retained Riccati factorization — one
      triangular re-solve, no new factorization
      (``fortran_order_d_solve_kkt_new_rhs_ocp_hard_tv``,
      ``interfaces/c/fortran_order_interface.c:985``);
    - :meth:`single_newton` — RTI-style warm Newton step(s) from the
      previous solution for new vector data
      (``fortran_order_d_ip_ocp_hard_tv_single_newton_step``,
      ``c_interface.h:67``);
    - :meth:`solve` — full IPM warm-started from the previous solution
      (the reference's ``warm_start`` flag).

    All calls hit jit-cached executables — no recompilation after the
    first call at a given problem geometry.
    """

    def __init__(self, dims, cfg, matrices, sol, carry):
        self.dims = dims
        self.cfg = cfg
        self._mat = matrices  # dict of the original per-stage data
        self._sol = sol  # padded device solution (last solve)
        self._carry = carry  # KKTCarry or None

    def _repack(self, b=None, q=None, r=None, lb=None, ub=None,
                lg=None, ug=None, x0=None):
        m = self._mat
        dims, qp = pack_problem(
            m["N"], m["A"], m["B"], b if b is not None else m["b"],
            m["Q"], m["S"], m["R"],
            q if q is not None else m["q"], r if r is not None else m["r"],
            idxb=m["idxb"],
            lb=lb if lb is not None else m["lb"],
            ub=ub if ub is not None else m["ub"],
            C=m["C"], D=m["D"],
            lg=lg if lg is not None else m["lg"],
            ug=ug if ug is not None else m["ug"],
            x0=x0 if x0 is not None else m["x0"],
        )
        if dims != self.dims:
            raise ValueError(
                "new-rhs data changed the problem geometry; start a new "
                "session via solve_ocp"
            )
        return qp

    def solve_new_rhs(self, **vectors) -> OCPResult:
        """Triangular re-solve with the retained factorization for new
        vector data (kwargs: b, q, r, lb, ub, lg, ug, x0)."""
        if self._carry is None:
            raise ValueError("session has no retained factorization")
        qp = self._repack(**vectors)
        sol = _jit_new_rhs(self.dims)(qp, self._carry)
        return _unpack_result(self.dims, sol)

    def single_newton(self, k: int = 1, **vectors) -> OCPResult:
        """``k`` warm Newton iterations from the previous solution for new
        vector data (classic RTI: k=1)."""
        qp = self._repack(**vectors)
        cfg = _ipm.IPMConfig(
            **{**dataclasses_asdict(self.cfg), "k_max": k}
        )
        it = (
            self._sol.z, self._sol.pi,
            self._sol.lam_b, self._sol.t_b,
            self._sol.lam_g, self._sol.t_g,
        )
        sol, carry = _jit_single_newton(self.dims, cfg)(qp, it)
        self._sol, self._carry = sol, carry
        return _unpack_result(self.dims, sol)

    def solve(self, **vectors) -> OCPResult:
        """Full IPM re-solve warm-started from the previous solution."""
        qp = self._repack(**vectors)
        cfg = _ipm.IPMConfig(
            **{**dataclasses_asdict(self.cfg), "warm_start": True}
        )
        sol, carry = _jit_warm(self.dims, cfg)(qp, self._sol.z, self._sol.pi)
        self._sol, self._carry = sol, carry
        return _unpack_result(self.dims, sol)

    def dense_tick(self, use_kernel: bool = True, warm: bool = True,
                   **vectors):
        """Minimum-latency deployment tick through the 5th-generation
        dense condensed-QP engine (``models/ipm_dense``): the plan
        (condensed matrices + exact affine raw-b -> dense-rhs maps) is
        built and cached on FIRST use; each tick then runs the whole
        phase-1 IPM in one pallas_call and returns
        ``(u0, DenseTickResult)``.  Only the dynamics offsets may vary
        between ticks (kwargs: b, x0 — cost/bounds changes need a new
        plan); phase-1 ``d_ip2_hard`` semantics at ``cfg.mu_tol``.
        ``warm=True`` (default) seeds each tick from the previous tick's
        iterate (the RTI hot loop).  Requires the condensed sizes to fit
        the kernel envelope (nz <= 128 inputs, <= 128 general rows)."""
        import jax

        from .models import ipm_dense as _ipd

        qp = self._repack(**{k: v for k, v in vectors.items()
                             if k in ("b", "x0")})
        if getattr(self, "_dense_plan", None) is None:
            self._dense_plan = _ipd.plan_dense(self.dims, qp)
            self._dense_y = None
            self._dense_fn = jax.jit(
                lambda bf, y0: _ipd.solve_dense_tick(
                    self._dense_plan, bf, self.cfg,
                    use_kernel=use_kernel, y0=y0))
        import jax.numpy as _jnp

        y0 = (self._dense_y if (warm and self._dense_y is not None)
              else _jnp.zeros((self._dense_plan.nz,), qp.b.dtype))
        res = self._dense_fn(qp.b.reshape(-1), y0)
        self._dense_y = res.y
        return np.asarray(res.u0), res


def dataclasses_asdict(cfg):
    import dataclasses

    return {f.name: getattr(cfg, f.name) for f in dataclasses.fields(cfg)}


def solve_ocp(
    N,
    A, B, b,
    Q, S, R, q, r,
    idxb=None, lb=None, ub=None,
    C=None, D=None, lg=None, ug=None,
    x0=None,
    N2=None,
    k_max=30,
    mu0=2.0,
    mu_tol=1e-8,
    alpha_min=1e-8,
    warm_start=None,
    return_session=False,
):
    """One-call hard-constrained OCP solve (the reference's
    ``fortran_order_d_ip_ocp_hard_tv``; the ``N2 < N`` path runs partial
    condensing -> IPM -> expand like ``fortran_order_interface.c:434-528``).

    ``warm_start``: a previous :class:`OCPResult` (or ``(x, u)`` per-stage
    lists) used to initialize the iterate (the reference's ``warm_start``
    argument).  ``return_session=True`` additionally returns an
    :class:`OCPSession` for retained-factorization re-solves.  Compiled
    solvers are cached on (dims, config) — repeated calls do not recompile.
    """
    dims, qp = pack_problem(
        N, A, B, b, Q, S, R, q, r,
        idxb=idxb, lb=lb, ub=ub, C=C, D=D, lg=lg, ug=ug, x0=x0,
    )
    cfg = _ipm.IPMConfig(k_max=k_max, mu0=mu0, mu_tol=mu_tol, alpha_min=alpha_min)

    carry = None
    if N2 is not None and N2 < N:
        if warm_start is not None:
            raise ValueError("warm_start is not supported with N2 < N")
        sol = _jit_partial_cond(dims, cfg, int(N2))(qp)
    elif warm_start is not None:
        import jax.numpy as jnp

        wx, wu = (
            (warm_start.x, warm_start.u)
            if isinstance(warm_start, OCPResult)
            else warm_start
        )
        z0 = np.zeros((N + 1, dims.NZ))
        pi0 = np.zeros((N, dims.NX))
        for n in range(N + 1):
            z0[n, : dims.nu[n]] = np.asarray(wu[n]).reshape(-1)[: dims.nu[n]]
            z0[n, dims.NU : dims.NU + dims.nx[n]] = np.asarray(wx[n]).reshape(-1)[
                : dims.nx[n]
            ]
        cfg_w = _ipm.IPMConfig(**{**dataclasses_asdict(cfg), "warm_start": True})
        sol, carry = _jit_warm(dims, cfg_w)(
            qp, jnp.asarray(z0, qp.dtype), jnp.asarray(pi0, qp.dtype)
        )
        cfg = cfg_w
    else:
        sol, carry = _jit_direct(dims, cfg)(qp)

    result = _unpack_result(dims, sol)
    if not return_session:
        return result
    mats = dict(
        N=N, A=A, B=B, b=b, Q=Q, S=S, R=R, q=q, r=r, idxb=idxb,
        lb=lb, ub=ub, C=C, D=D, lg=lg, ug=ug, x0=x0,
    )
    return result, OCPSession(dims, cfg, mats, sol, carry)


def work_space_size_bytes(N, nx, nu, nb=None, ng=None, k_max=30, dtype=np.float64,
                          N2=None, idxb=None):
    """Device-memory planning figure per solve (the reference's
    ``hpmpc_d_ip_ocp_hard_tv_work_space_size_bytes`` analogue, incl. its
    ``N2`` partial-condensing argument, ``include/c_interface.h:40``):
    with ``N2 < N`` the figure covers the CONDENSED problem the IPM
    actually solves (state boxes become general rows — sizes from
    ``cond.plan``, which needs the static ``idxb`` lists)."""
    nx = list(np.broadcast_to(nx, (N + 1,)).astype(int)) if np.isscalar(nx) else list(nx)
    nu = list(np.broadcast_to(nu, (N + 1,)).astype(int)) if np.isscalar(nu) else list(nu)
    nb = [0] * (N + 1) if nb is None else (list(np.broadcast_to(nb, (N + 1,)).astype(int)) if np.isscalar(nb) else list(nb))
    ng = [0] * (N + 1) if ng is None else (list(np.broadcast_to(ng, (N + 1,)).astype(int)) if np.isscalar(ng) else list(ng))
    if N2 is not None and N2 < N:
        from .models import cond as _cnd

        if idxb is None:
            idxb = [list(range(nb[n])) for n in range(N + 1)]
        dims = OCPDims.create(N, nx, nu, nb, ng, idxb=idxb)
        d2 = _cnd.plan(dims, N2).dims2
        return work_space_size_bytes(
            N2, list(d2.nx), list(d2.nu), list(d2.nb), list(d2.ng),
            k_max=k_max, dtype=dtype,
        )
    elem = np.dtype(dtype).itemsize
    if _native is not None:
        return int(
            _native.hpmpc_tpu_ip_ocp_hard_tv_work_space_size_bytes(
                N, _c_ints(nx), _c_ints(nu), _c_ints(nb), _c_ints(ng),
                k_max, elem,
            )
        )
    # numpy fallback mirrors the native formula
    NX, NU = max(nx), max(nu)
    NB, NG = max(max(nb), 1), max(max(ng), 1)
    NZ = NX + NU
    elems = N * NZ * NX + N * NX
    elems += (N + 1) * (NZ * NZ + NZ)
    elems += (N + 1) * (3 * NB + 3 * NG + NG * NZ)
    elems += (N + 1) * (NZ + NX + NB + NG)
    elems += 2 * ((N + 1) * NZ + N * NX + 4 * (N + 1) * (NB + NG))
    elems += (N + 1) * NZ * NZ
    elems += k_max * 5
    return elems * elem


def pack_dynamics_native(dims: OCPDims, A, B, b):
    """Native packing of the dynamics stack (testable fast path)."""
    assert _native is not None
    N, NU, NX, NZ = dims.N, dims.NU, dims.NX, dims.NZ
    Ap, Aref = _ptr_array([np.asarray(a, dtype=np.float64).reshape(dims.nx[n + 1], dims.nx[n]) for n, a in enumerate(A)])
    Bp, Bref = _ptr_array([np.asarray(x, dtype=np.float64).reshape(dims.nx[n + 1], dims.nu[n]) for n, x in enumerate(B)])
    bp, bref = _ptr_array([np.asarray(x, dtype=np.float64).reshape(dims.nx[n + 1], 1) for n, x in enumerate(b)])
    F = np.zeros((N, NZ, NX))
    bb = np.zeros((N, NX))
    _native.hpmpc_tpu_pack_dynamics(
        N, _c_ints(dims.nx), _c_ints(dims.nu), NU, NX, NZ,
        Ap, Bp, bp,
        F.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return F, bb


def _build_soft_spec(dims: OCPDims, idxs, lbs, ubs, Zs, zs, dtype):
    """Per-stage soft data -> padded :class:`~.models.ipm_soft.SoftSpec`
    (logical [u;x] coords mapped to padded z coords)."""
    import jax.numpy as jnp

    from .models import ipm_soft as _soft

    N, NU = dims.N, dims.NU
    NS = max(max(len(np.asarray(i)) for i in idxs), 1)
    Np1 = N + 1
    idxbs = np.zeros((Np1, NS), dtype=np.int32)
    ns_mask = np.zeros((Np1, NS))
    d_lbs = np.zeros((Np1, NS))
    d_ubs = np.zeros((Np1, NS))
    Zp = np.zeros((Np1, 2, NS))
    zp = np.zeros((Np1, 2, NS))
    for n in range(Np1):
        ii = np.asarray(idxs[n], dtype=np.int64)
        for k, j in enumerate(ii):
            idxbs[n, k] = j if j < dims.nu[n] else NU + (j - dims.nu[n])
            ns_mask[n, k] = 1.0
            d_lbs[n, k] = np.asarray(lbs[n])[k]
            d_ubs[n, k] = np.asarray(ubs[n])[k]
            Zrow = np.asarray(Zs[n]).reshape(-1)
            zrow = np.asarray(zs[n]).reshape(-1)
            ns_n = len(ii)
            Zp[n, 0, k] = Zrow[k]
            Zp[n, 1, k] = Zrow[ns_n + k] if len(Zrow) >= 2 * ns_n else Zrow[k]
            zp[n, 0, k] = zrow[k]
            zp[n, 1, k] = zrow[ns_n + k] if len(zrow) >= 2 * ns_n else zrow[k]

    as_j = lambda x: jnp.asarray(x, dtype)
    return _soft.SoftSpec(
        idxbs=jnp.asarray(idxbs),
        d_lbs=as_j(d_lbs),
        d_ubs=as_j(d_ubs),
        Z=as_j(Zp),
        z_lin=as_j(zp),
        ns_mask=as_j(ns_mask),
    )


def _unpack_soft_result(dims: OCPDims, sol, res) -> OCPResult:
    N, NU = dims.N, dims.NU
    z = np.asarray(sol.z)
    x = [z[n, NU : NU + dims.nx[n]].copy() for n in range(N + 1)]
    u = [z[n, : dims.nu[n]].copy() for n in range(N + 1)]
    pi = [np.asarray(sol.pi)[n, : dims.nx[n + 1]].copy() for n in range(N)]
    kk = int(sol.kk)
    stat = np.asarray(sol.stat)[:kk]

    # exact soft-QP KKT residual norms (d_res_mpc_soft_tv semantics):
    # {max(|rq|, |rz|) stationarity, |rb|, |rd| all constraint families, mu}
    def _amax(a):
        a = np.asarray(a)
        return float(np.abs(a).max()) if a.size else 0.0

    inf_norm_res = np.array([
        max(_amax(res.rq), _amax(res.rz)),
        _amax(res.rb),
        max(_amax(res.rd_b), _amax(res.rd_g), _amax(res.rd_s)),
        float(res.mu),
    ])
    return OCPResult(
        x=x, u=u, pi=pi,
        lam=[np.asarray(sol.lam_s)[n] for n in range(N + 1)],
        t=[np.asarray(sol.t_s)[n] for n in range(N + 1)],
        kk=kk,
        status=int(sol.status),
        stat=stat,
        inf_norm_res=inf_norm_res,
    )


_SLACK_BIG = 1e6  # inactive side of a one-sided soft row / slack upper bound


def soft_to_hard_data(N, A, B, b, Q, S, R, q, r,
                      idxb, lb, ub, idxs, lbs, ubs, Zs, zs):
    """Exact slack reformulation: the soft-constrained QP as a HARD QP
    with 2*ns_n extra inputs per stage (s_lo, s_up >= 0, quadratic cost
    diag(Z) and linear cost z) and 2*ns_n general rows

        z[j] + s_lo_k >= lbs_k      (upper side inactive at +BIG)
        z[j] - s_up_k <= ubs_k      (lower side inactive at -BIG)

    This is the standard equivalence the reference's soft IPM exploits
    implicitly (``mpc_solvers/d_ip2_soft.c:83`` eliminates exactly these
    slacks by a diagonal Schur complement per iteration); materializing it
    lets the soft problem ride the HARD pipeline — in particular partial
    condensing, which the reference never implemented for the soft solver
    (``fortran_order_interface.c:1442`` has no N2 argument).

    Returns the augmented per-stage data
    ``(A, B, b, Q, S, R, q, r, idxb, lb, ub, C, D, lg, ug, nu_orig)``
    with slack inputs appended AFTER the original inputs of each stage
    (terminal stage included — nu[N] = 2*ns_N)."""
    idxs = [np.asarray(i, dtype=np.int64) for i in idxs]
    ns_v = [len(i) for i in idxs]
    nu_v = [np.asarray(Bn).shape[1] for Bn in B] + [0]
    nx_v = [np.asarray(An).shape[1] for An in A] + [np.asarray(Q[-1]).shape[0]]

    A2, B2, b2 = list(A), list(B), list(b)
    Q2, q2 = list(Q), list(q)
    S2, R2, r2 = [], [], []
    idxb2, lb2, ub2 = [], [], []
    C2, D2, lg2, ug2 = [], [], [], []
    for n in range(N + 1):
        ns_n, nu_n, nx_n = ns_v[n], nu_v[n], nx_v[n]
        if n < N:
            B2[n] = np.hstack([
                np.asarray(B[n], dtype=np.float64),
                np.zeros((np.asarray(B[n]).shape[0], 2 * ns_n)),
            ])
        # cost: R' = blkdiag(R, diag(Z_lo), diag(Z_up)); r' = [r; z_lo; z_up]
        Zrow = np.asarray(Zs[n]).reshape(-1)
        zrow = np.asarray(zs[n]).reshape(-1)
        Z_lo = Zrow[:ns_n]
        Z_up = Zrow[ns_n:2 * ns_n] if len(Zrow) >= 2 * ns_n else Z_lo
        z_lo = zrow[:ns_n]
        z_up = zrow[ns_n:2 * ns_n] if len(zrow) >= 2 * ns_n else z_lo
        Rn = np.asarray(R[n], dtype=np.float64).reshape(nu_n, nu_n)
        R2.append(
            np.block([
                [Rn, np.zeros((nu_n, 2 * ns_n))],
                [np.zeros((2 * ns_n, nu_n)),
                 np.diag(np.concatenate([Z_lo, Z_up]))],
            ])
        )
        Sn = np.asarray(S[n], dtype=np.float64).reshape(nu_n, nx_n)
        S2.append(np.vstack([Sn, np.zeros((2 * ns_n, nx_n))]))
        r2.append(np.concatenate([
            np.asarray(r[n], dtype=np.float64).reshape(-1),
            z_lo, z_up,
        ]))
        # hard boxes: original (state coords shift by 2*ns_n) + s >= 0
        ib = np.asarray(idxb[n], dtype=np.int64) if idxb is not None else np.zeros(0, np.int64)
        ib2 = np.where(ib >= nu_n, ib + 2 * ns_n, ib)
        slack_ids = nu_n + np.arange(2 * ns_n)
        idxb2.append(np.concatenate([ib2, slack_ids]).astype(np.int32))
        lb2.append(np.concatenate([
            np.asarray(lb[n], dtype=np.float64).reshape(-1),
            np.zeros(2 * ns_n),
        ]))
        ub2.append(np.concatenate([
            np.asarray(ub[n], dtype=np.float64).reshape(-1),
            np.full(2 * ns_n, _SLACK_BIG),
        ]))
        # general rows: one per soft side
        Cn = np.zeros((2 * ns_n, nx_n))
        Dn = np.zeros((2 * ns_n, nu_n + 2 * ns_n))
        lg_n = np.zeros(2 * ns_n)
        ug_n = np.zeros(2 * ns_n)
        for k, j in enumerate(idxs[n]):
            for side, (row, sgn_s) in enumerate(((k, +1.0), (ns_n + k, -1.0))):
                if j < nu_n:
                    Dn[row, j] = 1.0
                else:
                    Cn[row, j - nu_n] = 1.0
                Dn[row, nu_n + side * ns_n + k] = sgn_s
            lg_n[k] = np.asarray(lbs[n])[k]
            ug_n[k] = _SLACK_BIG
            lg_n[ns_n + k] = -_SLACK_BIG
            ug_n[ns_n + k] = np.asarray(ubs[n])[k]
        C2.append(Cn)
        D2.append(Dn)
        lg2.append(lg_n)
        ug2.append(ug_n)
    return (A2, B2, b2, Q2, S2, R2, q2, r2,
            idxb2, lb2, ub2, C2, D2, lg2, ug2, nu_v)


class SoftOCPSession:
    """Retained-state front door for soft re-solves at fixed matrix data
    (the soft twin of :class:`OCPSession`; the reference's soft interface
    offers ``warm_start`` only — ``fortran_order_interface.c:1442`` arg
    12).  :meth:`solve` re-solves for new vector data (b, q, r, lb, ub,
    lbs, ubs, x0), warm-started from the previous solution, through the
    jit cache — no recompilation."""

    def __init__(self, dims, cfg, mats, spec, sol):
        self.dims = dims
        self.cfg = cfg
        self._mat = mats
        self._spec = spec
        self._sol = sol

    def solve(self, lbs=None, ubs=None, **vectors) -> OCPResult:
        m = self._mat
        dims, qp = pack_problem(
            m["N"], m["A"], m["B"],
            vectors.get("b", m["b"]),
            m["Q"], m["S"], m["R"],
            vectors.get("q", m["q"]), vectors.get("r", m["r"]),
            idxb=m["idxb"],
            lb=vectors.get("lb", m["lb"]), ub=vectors.get("ub", m["ub"]),
            x0=vectors.get("x0", m["x0"]),
        )
        if dims != self.dims:
            raise ValueError(
                "new data changed the problem geometry; start a new "
                "session via solve_ocp_soft"
            )
        spec = self._spec
        if lbs is not None or ubs is not None:
            spec = _build_soft_spec(
                dims, m["idxs"],
                lbs if lbs is not None else m["lbs"],
                ubs if ubs is not None else m["ubs"],
                m["Zs"], m["zs"], qp.dtype,
            )
            self._spec = spec
        cfg_w = _ipm.IPMConfig(
            **{**dataclasses_asdict(self.cfg), "warm_start": True}
        )
        sol, res = _jit_soft_warm(dims, cfg_w)(
            qp, spec, self._sol.z, self._sol.pi
        )
        self._sol = sol
        return _unpack_soft_result(dims, sol, res)


def solve_ocp_soft(
    N,
    A, B, b,
    Q, S, R, q, r,
    idxb, lb, ub,           # hard box constraints
    idxs, lbs, ubs, Zs, zs,  # soft box constraints (logical [u;x] indices)
    x0=None,
    N2=None,
    k_max=30,
    mu0=100.0,
    mu_tol=1e-8,
    alpha_min=1e-8,
    return_session=False,
):
    """Soft-constrained front door (the reference's
    ``fortran_order_d_ip_ocp_soft_tv`` surface, ``test_d_ip_soft.c:420``):
    per-stage soft bounds ``lbs/ubs`` on logical ``[u;x]`` entries ``idxs``
    with slack penalties ``Zs`` (quadratic) / ``zs`` (linear), each a
    per-stage sequence of (ns_n,) arrays (or 2*ns_n for split lower/upper).

    ``N2 < N`` runs the partial-condensing pipeline on the EXACT hard
    slack reformulation (:func:`soft_to_hard_data`) — a capability the
    reference left unimplemented for its soft solver.  ``return_session``
    returns a :class:`SoftOCPSession` for warm-started re-solves.
    Compiled solvers are cached on (dims, config) — repeated calls do
    not recompile."""
    cfg = _ipm.IPMConfig(k_max=k_max, mu0=mu0, mu_tol=mu_tol, alpha_min=alpha_min)

    if N2 is not None and N2 < N:
        if return_session:
            raise ValueError("sessions are not supported with N2 < N")
        (A2, B2, b2, Q2, S2, R2, q2, r2,
         idxb2, lb2, ub2, C2, D2, lg2, ug2, nu_orig) = soft_to_hard_data(
            N, A, B, b, Q, S, R, q, r, idxb, lb, ub, idxs, lbs, ubs, Zs, zs
        )
        dims_h, qp_h = pack_problem(
            N, A2, B2, b2, Q2, S2, R2, q2, r2,
            idxb=idxb2, lb=lb2, ub=ub2, C=C2, D=D2, lg=lg2, ug=ug2, x0=x0,
        )
        sol = _jit_partial_cond(dims_h, cfg, int(N2))(qp_h)
        result = _unpack_result(dims_h, sol)
        # strip the slack inputs: the user's u is the first nu_orig[n]
        u = [un[: nu_orig[n]] for n, un in enumerate(result.u)]
        return result._replace(u=u)

    dims, qp = pack_problem(
        N, A, B, b, Q, S, R, q, r, idxb=idxb, lb=lb, ub=ub, x0=x0
    )
    spec = _build_soft_spec(dims, idxs, lbs, ubs, Zs, zs, qp.dtype)
    sol, res = _jit_soft(dims, cfg)(qp, spec)
    result = _unpack_soft_result(dims, sol, res)
    if not return_session:
        return result
    mats = dict(
        N=N, A=A, B=B, b=b, Q=Q, S=S, R=R, q=q, r=r, idxb=idxb,
        lb=lb, ub=ub, x0=x0, idxs=idxs, lbs=lbs, ubs=ubs, Zs=Zs, zs=zs,
    )
    return result, SoftOCPSession(dims, cfg, mats, spec, sol)


def solve_ocp_c_order(
    N,
    A, B, b,
    Q, S, R, q, r,
    idxb=None, lb=None, ub=None,
    C=None, D=None, lg=None, ug=None,
    x0=None,
    N2=None,
    k_max=30,
    mu0=2.0,
    mu_tol=1e-8,
    alpha_min=1e-8,
) -> OCPResult:
    """Row-major twin of :func:`solve_ocp` (the reference's
    ``c_order_d_ip_ocp_hard_tv``, ``interfaces/c/c_order_interface.c``):
    every 2-D matrix argument is interpreted as the TRANSPOSE of the
    fortran-order layout — the reference packs these with
    ``d_cvt_tran_mat2pmat`` instead of ``d_cvt_mat2pmat``.  Vectors and
    index lists are identical in both conventions."""
    tr = lambda seq: None if seq is None else [np.asarray(m).T for m in seq]
    return solve_ocp(
        N, tr(A), tr(B), b, tr(Q), tr(S), tr(R), q, r,
        idxb=idxb, lb=lb, ub=ub, C=tr(C), D=tr(D), lg=lg, ug=ug,
        x0=x0, N2=N2, k_max=k_max, mu0=mu0, mu_tol=mu_tol,
        alpha_min=alpha_min,
    )
