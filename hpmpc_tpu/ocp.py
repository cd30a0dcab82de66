"""Core problem containers for time-variant linear-quadratic optimal control.

This is the TPU-native replacement for the reference's panel-major stage data
(``pBAbt`` / ``pRSQrq`` / ``pDCt`` / ``d`` / ``idxb``; see
reference ``doc/guide.tex:63-91`` and ``test_problems/test_d_ip_hard.c:317-333``
for the layout conventions being re-expressed here).

Design notes (TPU-first):
  * Per-stage variable sizes ``nx[], nu[], nb[], ng[]`` (the reference's
    ``_tv`` capability) become *static padded maxima plus masks*.  JAX/XLA
    requires static shapes; masks cost nothing at runtime because they fold
    into elementwise ops and padded matrix blocks are identity/zero so they
    never perturb the real sub-problem.
  * Stages are stacked along a leading axis so the Riccati recursion is a
    single ``lax.scan`` and the whole problem batches with ``vmap``/``pjit``.
  * Coordinate convention per stage: ``z = [u (NU padded); x (NX padded)]``,
    so ``NZ = NU + NX``.  The reference packs ``[u; x]`` contiguously with
    stage-dependent split; here the split is at the static ``NU`` boundary
    and validity is carried by masks.

Padding semantics (invariants relied on by the solvers):
  * ``F``/``b``/``g``/``C`` are zero in padded rows/columns.
  * ``H`` is zero in padded rows/columns; solvers add ``diag(pad_diag)``
    (ones on padded coordinates) before factorizing, which makes the padded
    block an identity that factors trivially and does not couple to real
    coordinates.
  * ``idxb`` entries for padded box constraints are 0 and must always be
    multiplied by ``nb_mask``.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _round_tuple(v, n) -> tuple:
    if np.isscalar(v):
        return tuple(int(v) for _ in range(n))
    return tuple(int(x) for x in v)


@dataclasses.dataclass(frozen=True)
class OCPDims:
    """Static dimensions of a time-variant OCP QP (hashable; jit-safe aux data).

    Mirrors the reference's ``(N, nx[], nu[], nb[], ng[])`` signature
    (``mpc_solvers/d_ip2_res_hard.c:116``).
    """

    N: int
    nx: tuple  # length N+1, nx[0] == 0 when the initial state is eliminated
    nu: tuple  # length N+1, nu[N] == 0
    nb: tuple  # length N+1
    ng: tuple  # length N+1
    # static copy of the box-constraint index lists (logical [u;x] indices,
    # like the reference's idxb).  Needed by transforms whose *structure*
    # depends on which coordinates are bounded (partial condensing splits
    # input-boxes from state-boxes, d_part_cond.c:599-606).  None if unknown.
    idxb: tuple | None = None

    @staticmethod
    def create(N, nx, nu, nb=0, ng=0, idxb=None) -> "OCPDims":
        if idxb is not None:
            idxb = tuple(tuple(int(i) for i in row) for row in idxb)
        return OCPDims(
            N=int(N),
            nx=_round_tuple(nx, N + 1),
            nu=_round_tuple(nu, N + 1),
            nb=_round_tuple(nb, N + 1),
            ng=_round_tuple(ng, N + 1),
            idxb=idxb,
        )

    # padded maxima -------------------------------------------------------
    @property
    def NX(self) -> int:
        return max(self.nx)

    @property
    def NU(self) -> int:
        return max(self.nu)

    @property
    def NZ(self) -> int:
        return self.NU + self.NX

    @property
    def NB(self) -> int:
        return max(max(self.nb), 1)

    @property
    def NG(self) -> int:
        return max(max(self.ng), 1)

    @property
    def n_constr(self) -> int:
        """Total two-sided constraint count: sum(2 nb + 2 ng); defines the
        duality-measure scaling 1/n_constr (reference ``d_ip2_res_hard.c:430``)."""
        return 2 * sum(self.nb) + 2 * sum(self.ng)

    # mask builders (numpy; call at trace time, results are constants) -----
    def z_mask(self) -> np.ndarray:
        m = np.zeros((self.N + 1, self.NZ))
        for n in range(self.N + 1):
            m[n, : self.nu[n]] = 1.0
            m[n, self.NU : self.NU + self.nx[n]] = 1.0
        return m

    def x_mask(self) -> np.ndarray:
        m = np.zeros((self.N + 1, self.NX))
        for n in range(self.N + 1):
            m[n, : self.nx[n]] = 1.0
        return m

    def nb_mask(self) -> np.ndarray:
        m = np.zeros((self.N + 1, self.NB))
        for n in range(self.N + 1):
            m[n, : self.nb[n]] = 1.0
        return m

    def ng_mask(self) -> np.ndarray:
        m = np.zeros((self.N + 1, self.NG))
        for n in range(self.N + 1):
            m[n, : self.ng[n]] = 1.0
        return m


def _data_field():
    return dataclasses.field()


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OCPQP:
    """Stacked-stage OCP QP data (a pytree; leading axes batch with vmap).

    min  sum_n 1/2 z_n' H_n z_n + g_n' z_n
    s.t. x_{n+1} = F_n' z_n + b_n                      (n = 0..N-1)
         d_lb <= z_n[idxb_n] <= d_ub                   (nb_n box constraints)
         d_lg <= C_n z_n     <= d_ug                   (ng_n general constraints)

    with z_n = [u_n; x_n] in padded coordinates.  Equivalent content to the
    reference's ``pBAbt/pRSQrq/pDCt/d/idxb`` set (``doc/guide.tex:48-91``).
    """

    F: jax.Array  # (N, NZ, NX)   rows [B'; A'] per stage
    b: jax.Array  # (N, NX)
    H: jax.Array  # (N+1, NZ, NZ) [[R, S'], [S, Q]]
    g: jax.Array  # (N+1, NZ)     [r; q]
    idxb: jax.Array  # (N+1, NB) int32, padded-coordinate indices into z
    d_lb: jax.Array  # (N+1, NB)
    d_ub: jax.Array  # (N+1, NB)
    C: jax.Array  # (N+1, NG, NZ)
    d_lg: jax.Array  # (N+1, NG)
    d_ug: jax.Array  # (N+1, NG)
    # masks (1.0 = valid); constants per problem family
    z_mask: jax.Array  # (N+1, NZ)
    x_mask: jax.Array  # (N+1, NX)
    nb_mask: jax.Array  # (N+1, NB)
    ng_mask: jax.Array  # (N+1, NG)

    @property
    def pad_diag(self) -> jax.Array:
        """Ones on padded z coordinates: added to diag(H) before factorizing."""
        return 1.0 - self.z_mask

    @property
    def dtype(self):
        return self.H.dtype


def pack_ocp(
    dims: OCPDims,
    A: Sequence[np.ndarray],
    B: Sequence[np.ndarray],
    b: Sequence[np.ndarray],
    Q: Sequence[np.ndarray],
    S: Sequence[np.ndarray],
    R: Sequence[np.ndarray],
    q: Sequence[np.ndarray],
    r: Sequence[np.ndarray],
    idxb: Sequence[np.ndarray] | None = None,
    lb: Sequence[np.ndarray] | None = None,
    ub: Sequence[np.ndarray] | None = None,
    C: Sequence[np.ndarray] | None = None,
    D: Sequence[np.ndarray] | None = None,
    lg: Sequence[np.ndarray] | None = None,
    ug: Sequence[np.ndarray] | None = None,
    dtype=jnp.float64,
) -> OCPQP:
    """Pack per-stage dense (numpy, column-major-agnostic) data into an OCPQP.

    Stage lists follow the reference's high-level API semantics
    (``interfaces/c/fortran_order_interface.c:264-292``): ``A[n], B[n], b[n]``
    map stage ``n`` to ``n+1``; ``Q[n], S[n], R[n]`` are the stage costs with
    ``Q[N]`` terminal; ``idxb[n]`` indexes the *logical* ``[u;x]`` vector of
    stage n (0..nu-1 = inputs, nu.. = states), exactly like the reference.
    """
    N = dims.N
    NX, NU, NZ, NB, NG = dims.NX, dims.NU, dims.NZ, dims.NB, dims.NG

    F = np.zeros((N, NZ, NX))
    bb = np.zeros((N, NX))
    for n in range(N):
        nxn, nun, nx1 = dims.nx[n], dims.nu[n], dims.nx[n + 1]
        Bn = np.asarray(B[n]).reshape(nx1, nun) if nun else np.zeros((nx1, 0))
        An = np.asarray(A[n]).reshape(nx1, nxn) if nxn else np.zeros((nx1, 0))
        F[n, :nun, :nx1] = Bn.T
        F[n, NU : NU + nxn, :nx1] = An.T
        bb[n, :nx1] = np.asarray(b[n]).reshape(nx1)

    H = np.zeros((N + 1, NZ, NZ))
    gg = np.zeros((N + 1, NZ))
    for n in range(N + 1):
        nxn, nun = dims.nx[n], dims.nu[n]
        if nun:
            H[n, :nun, :nun] = np.asarray(R[n]).reshape(nun, nun)
            gg[n, :nun] = np.asarray(r[n]).reshape(nun)
        if nxn:
            H[n, NU : NU + nxn, NU : NU + nxn] = np.asarray(Q[n]).reshape(nxn, nxn)
            gg[n, NU : NU + nxn] = np.asarray(q[n]).reshape(nxn)
        if nun and nxn:
            Sn = np.asarray(S[n]).reshape(nun, nxn)
            H[n, :nun, NU : NU + nxn] = Sn
            H[n, NU : NU + nxn, :nun] = Sn.T

    idxb_p = np.zeros((N + 1, NB), dtype=np.int32)
    dlb = np.zeros((N + 1, NB))
    dub = np.zeros((N + 1, NB))
    for n in range(N + 1):
        nbn, nun = dims.nb[n], dims.nu[n]
        if nbn and idxb is not None:
            for k in range(nbn):
                j = int(idxb[n][k])
                # remap logical [u;x] index to padded coordinates
                idxb_p[n, k] = j if j < nun else NU + (j - nun)
            dlb[n, :nbn] = np.asarray(lb[n]).reshape(nbn)
            dub[n, :nbn] = np.asarray(ub[n]).reshape(nbn)

    CC = np.zeros((N + 1, NG, NZ))
    dlg = np.zeros((N + 1, NG))
    dug = np.zeros((N + 1, NG))
    for n in range(N + 1):
        ngn, nun, nxn = dims.ng[n], dims.nu[n], dims.nx[n]
        if ngn:
            if D is not None and nun:
                CC[n, :ngn, :nun] = np.asarray(D[n]).reshape(ngn, nun)
            if C is not None and nxn:
                CC[n, :ngn, NU : NU + nxn] = np.asarray(C[n]).reshape(ngn, nxn)
            dlg[n, :ngn] = np.asarray(lg[n]).reshape(ngn)
            dug[n, :ngn] = np.asarray(ug[n]).reshape(ngn)

    as_j = lambda x: jnp.asarray(x, dtype=dtype)
    return OCPQP(
        F=as_j(F),
        b=as_j(bb),
        H=as_j(H),
        g=as_j(gg),
        idxb=jnp.asarray(idxb_p),
        d_lb=as_j(dlb),
        d_ub=as_j(dub),
        C=as_j(CC),
        d_lg=as_j(dlg),
        d_ug=as_j(dug),
        z_mask=as_j(dims.z_mask()),
        x_mask=as_j(dims.x_mask()),
        nb_mask=as_j(dims.nb_mask()),
        ng_mask=as_j(dims.ng_mask()),
    )
