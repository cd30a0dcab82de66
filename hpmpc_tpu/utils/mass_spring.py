"""Mass-spring benchmark fixture.

Re-creates (in numpy) the canonical HPMPC benchmark problem: nx/2 masses in a
chain connected by unit springs, nu forces on the first masses, discretized
with zero-order hold at Ts (reference ``test_problems/test_d_ip_hard.c:55-137``
and ``doc/guide.tex:330-353``).  This is the fixture every MPC test and the
benchmark use.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg

from ..ocp import OCPDims, OCPQP, pack_ocp


def mass_spring_ab(nx: int, nu: int, Ts: float = 0.5):
    """Discrete-time (A, B) of the mass-spring chain (ZOH discretization)."""
    pp = nx // 2
    T = np.zeros((pp, pp))
    np.fill_diagonal(T, -2.0)
    for i in range(pp - 1):
        T[i + 1, i] = 1.0
        T[i, i + 1] = 1.0
    Ac = np.zeros((nx, nx))
    Ac[:pp, pp:] = np.eye(pp)
    Ac[pp:, :pp] = T
    Bc = np.zeros((nx, nu))
    Bc[pp : pp + nu, :] = np.eye(nu)

    A = scipy.linalg.expm(Ts * Ac)
    B = np.linalg.solve(Ac, (A - np.eye(nx)) @ Bc)
    return A, B


def mass_spring_qp(
    nx: int,
    nu: int,
    N: int,
    ng: int = 0,
    ngN: int = 0,
    Ts: float = 0.5,
    dtype=np.float64,
    A: np.ndarray | None = None,
    B: np.ndarray | None = None,
) -> tuple[OCPDims, OCPQP]:
    """Build the box(+general)-constrained mass-spring MPC QP.

    Matches the reference test configuration
    (``test_problems/test_d_ip_hard.c:164-460``): x0 eliminated (nx[0]=0,
    b0 = b + A x0), u in [-0.5, 0.5], first nx/2 states in [-4, 4],
    Q=I, R=2I, S=0, q=0.1, r=0.2, b=0.1, x0=(2.5, 2.5, 0, ...).
    Optional general constraints: stages 1..N-1 bound states x[0:ng] in
    [-100, 100]; stage N imposes x[0:ngN] == 0 (terminal equality).
    Pass precomputed (A, B) to bypass the scipy discretization (e.g. to use
    matrices recorded by the golden-fixture generator).
    """
    nb = nu + nx // 2
    nbu = min(nu, nb)
    nbx = max(nb - nu, 0)

    if A is None or B is None:
        A, B = mass_spring_ab(nx, nu, Ts)
    b = 0.1 * np.ones(nx)
    x0 = np.zeros(nx)
    x0[0] = 2.5
    x0[1] = 2.5
    b0 = b + A @ x0

    nx_v = (0,) + (nx,) * N
    nu_v = (nu,) * N + (0,)
    nb_v = (nbu,) + (nb,) * (N - 1) + (nbx,)
    ng_v = (0,) + (ng,) * (N - 1) + (ngN,)

    A_l = [np.zeros((nx, 0))] + [A] * (N - 1)
    B_l = [B] * N
    b_l = [b0] + [b] * (N - 1)
    Q_l = [np.zeros((0, 0))] + [np.eye(nx)] * N
    R_l = [2.0 * np.eye(nu)] * N + [np.zeros((0, 0))]
    S_l = [np.zeros((nu, 0))] + [np.zeros((nu, nx))] * (N - 1) + [np.zeros((0, nx))]
    q_l = [np.zeros(0)] + [0.1 * np.ones(nx)] * N
    r_l = [0.2 * np.ones(nu)] * N + [np.zeros(0)]

    idxb, lb, ub = [], [], []
    for n in range(N + 1):
        if n < N:
            idx = list(range(nbu)) + list(range(nu, nu + (nb_v[n] - nbu)))
            lo = [-0.5] * nbu + [-4.0] * (nb_v[n] - nbu)
            hi = [0.5] * nbu + [4.0] * (nb_v[n] - nbu)
        else:
            idx = list(range(nbx))
            lo = [-4.0] * nbx
            hi = [4.0] * nbx
        idxb.append(np.array(idx, dtype=np.int32))
        lb.append(np.array(lo))
        ub.append(np.array(hi))

    dims = OCPDims.create(N, nx_v, nu_v, nb_v, ng_v, idxb=idxb)

    C_l, D_l, lg_l, ug_l = [], [], [], []
    for n in range(N + 1):
        g_n = ng_v[n]
        Cn = np.zeros((g_n, nx_v[n]))
        for j in range(g_n):
            Cn[j, j] = 1.0
        C_l.append(Cn)
        D_l.append(np.zeros((g_n, nu_v[n])))
        if n == N:
            lg_l.append(np.zeros(g_n))
            ug_l.append(np.zeros(g_n))
        else:
            lg_l.append(-100.0 * np.ones(g_n))
            ug_l.append(100.0 * np.ones(g_n))

    qp = pack_ocp(
        dims,
        A_l, B_l, b_l,
        Q_l, S_l, R_l, q_l, r_l,
        idxb=idxb, lb=lb, ub=ub,
        C=C_l, D=D_l, lg=lg_l, ug=ug_l,
        dtype=dtype,
    )
    return dims, qp


def mass_spring_soft_qp(
    nx: int,
    nu: int,
    N: int,
    Z: float = 0.0,
    z_lin: float = 100.0,
    Ts: float = 0.5,
    dtype=np.float64,
    A: np.ndarray | None = None,
    B: np.ndarray | None = None,
):
    """Soft-constrained mass-spring fixture (reference
    ``test_problems/test_d_ip_soft.c:165-258``): hard input boxes u in
    [-0.5, 0.5], soft state constraints x in [-1, 1] with slack penalties
    (quadratic ``Z``, linear ``z_lin``); Q=0, q=0.1, R=2I, r=0.2, b=0,
    x0=(3.5, 3.5, 0, ...).  Returns (dims, qp, SoftSpec).
    """
    import jax.numpy as jnp

    from ..models.ipm_soft import SoftSpec

    if A is None or B is None:
        A, B = mass_spring_ab(nx, nu, Ts)
    b = np.zeros(nx)
    x0 = np.zeros(nx)
    x0[0] = 3.5
    x0[1] = 3.5
    b0 = A @ x0

    nx_v = (0,) + (nx,) * N
    nu_v = (nu,) * N + (0,)
    nb_v = (nu,) * N + (0,)
    ng_v = (0,) * (N + 1)
    ns_v = (0,) + (nx,) * N

    idxb = [np.arange(nb_v[n], dtype=np.int32) for n in range(N + 1)]
    dims = OCPDims.create(N, nx_v, nu_v, nb_v, ng_v, idxb=idxb)

    A_l = [np.zeros((nx, 0))] + [A] * (N - 1)
    B_l = [B] * N
    b_l = [b0] + [b] * (N - 1)
    Q_l = [np.zeros((0, 0))] + [np.zeros((nx, nx))] * N
    R_l = [2.0 * np.eye(nu)] * N + [np.zeros((0, 0))]
    S_l = [np.zeros((nu, 0))] + [np.zeros((nu, nx))] * (N - 1) + [np.zeros((0, nx))]
    q_l = [np.zeros(0)] + [0.1 * np.ones(nx)] * N
    r_l = [0.2 * np.ones(nu)] * N + [np.zeros(0)]
    lb = [-0.5 * np.ones(nb_v[n]) for n in range(N + 1)]
    ub = [0.5 * np.ones(nb_v[n]) for n in range(N + 1)]

    qp = pack_ocp(
        dims, A_l, B_l, b_l, Q_l, S_l, R_l, q_l, r_l,
        idxb=idxb, lb=lb, ub=ub, dtype=dtype,
    )

    # soft spec: states of stages 1..N, padded coords NU + j
    NS = nx
    NU = dims.NU
    idxbs = np.zeros((N + 1, NS), dtype=np.int32)
    ns_mask = np.zeros((N + 1, NS))
    for n in range(1, N + 1):
        idxbs[n] = NU + np.arange(NS)
        ns_mask[n] = 1.0
    d_lbs = -1.0 * np.ones((N + 1, NS))
    d_ubs = 1.0 * np.ones((N + 1, NS))
    Zp = Z * np.ones((N + 1, 2, NS))
    zp = z_lin * np.ones((N + 1, 2, NS))

    as_j = lambda x: jnp.asarray(x, dtype=dtype)
    soft = SoftSpec(
        idxbs=jnp.asarray(idxbs),
        d_lbs=as_j(d_lbs),
        d_ubs=as_j(d_ubs),
        Z=as_j(Zp),
        z_lin=as_j(zp),
        ns_mask=as_j(ns_mask),
    )
    return dims, qp, soft


def mass_spring_tree_qp(md=2, Nr=1, Nh=3, nx=4, nu=2, u_max=0.35,
                        ng_nodes=(), dtype=None):
    """Input-boxed scenario-tree QP on the mass-spring plant — the tree
    analogue of the chain test problems, with the reference's tree
    topology generator (``setup_tree(md, Nr, Nh)``,
    ``test_problems/test_d_tree_ric_libstr.c:61-93``).  Per-EDGE-varying
    dynamics/offsets (a uniform F would mask edge-index-mapping bugs in
    fused kernels); optional 1-row general constraint (weighted input +
    state sum bounded) on ``ng_nodes``.

    Returns (tdef, dims, qp) with node/edge arrays per models/tree.py.
    Used by tests/test_tree_flat.py and tools/bench_tree.py."""
    import jax.numpy as jnp

    from ..models import tree as _tree

    if dtype is None:
        dtype = jnp.float32
    A, B_ = mass_spring_ab(nx, nu)
    tdef = _tree.TreeDef.from_md_nr_nh(md, Nr, Nh)
    n, dad = tdef.n_nodes, tdef.dad
    is_leaf = [True] * n
    for k in range(1, n):
        is_leaf[dad[k]] = False

    nx_v = [0] + [nx] * (n - 1)
    nu_v = [0 if is_leaf[k] else nu for k in range(n)]
    nb_v = list(nu_v)
    ng_v = [1 if k in ng_nodes else 0 for k in range(n)]
    idxb = [np.arange(m, dtype=np.int32) for m in nb_v]
    dims = OCPDims.create(n - 1, nx_v, nu_v, nb_v, ng_v, idxb=idxb)
    NU, NX, NZ, NB, NG = dims.NU, dims.NX, dims.NZ, dims.NB, dims.NG

    F = np.zeros((n - 1, NZ, NX))
    for k in range(1, n):
        p = dad[k]
        Ak = A * (1.0 + 0.03 * (k % 5))
        F[k - 1, : nu_v[p], :nx] = B_.T[: nu_v[p]]
        F[k - 1, NU : NU + nx_v[p], :nx] = Ak.T[: nx_v[p]]
    b = np.zeros((n - 1, NX))
    b[:, :nx] = 0.1  # persistent offset keeps the problem off the origin
    b[:, 0] += 0.02 * np.arange(n - 1)

    H = np.zeros((n, NZ, NZ))
    rng = np.random.default_rng(3)
    for k in range(n):
        H[k, : nu_v[k], : nu_v[k]] = 0.5 * np.eye(nu_v[k])
        Qk = np.eye(nx_v[k]) + 0.05 * np.diag(rng.random(nx_v[k]))
        H[k, NU : NU + nx_v[k], NU : NU + nx_v[k]] = Qk
    g = np.zeros((n, NZ))
    g[:, NU : NU + nx] = 0.05

    idxb_p = np.zeros((n, NB), dtype=np.int32)
    d_lb = np.zeros((n, NB))
    d_ub = np.zeros((n, NB))
    for k in range(n):
        idxb_p[k, : nb_v[k]] = np.arange(nb_v[k])
        d_lb[k, : nb_v[k]] = -u_max
        d_ub[k, : nb_v[k]] = u_max

    C = np.zeros((n, NG, NZ))
    d_lg = np.zeros((n, NG))
    d_ug = np.zeros((n, NG))
    for k in ng_nodes:
        C[k, 0, : nu_v[k]] = 1.0
        C[k, 0, NU : NU + nx_v[k]] = 0.3
        d_lg[k, 0] = -1.2
        d_ug[k, 0] = 1.2

    as_j = lambda x: jnp.asarray(x, dtype)
    qp = OCPQP(
        F=as_j(F), b=as_j(b), H=as_j(H), g=as_j(g),
        idxb=jnp.asarray(idxb_p), d_lb=as_j(d_lb), d_ub=as_j(d_ub),
        C=as_j(C), d_lg=as_j(d_lg), d_ug=as_j(d_ug),
        z_mask=as_j(dims.z_mask()), x_mask=as_j(dims.x_mask()),
        nb_mask=as_j(dims.nb_mask()), ng_mask=as_j(dims.ng_mask()),
    )
    return tdef, dims, qp
