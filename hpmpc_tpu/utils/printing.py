"""Debug printers — the reference's ``d_print_mat`` / ``d_print_pmat`` /
``d_print_e_mat`` family (``auxiliary/d_aux_extern_depend_lib4.c:212-334``),
adapted to the framework's padded-and-masked data layout: the structured
printers strip padding using the static dims so what you see is the logical
time-variant problem, not the padded tensors.
"""

from __future__ import annotations

import numpy as np

from ..ocp import OCPDims, OCPQP


def print_mat(M, name: str = "", fmt: str = "%9.5f", file=None) -> None:
    """Dense matrix printer (``d_print_mat``, ``:262``)."""
    M = np.atleast_2d(np.asarray(M))
    if name:
        print(f"{name} ({M.shape[0]}x{M.shape[1]}):", file=file)
    for row in M:
        print(" ".join(fmt % v for v in row), file=file)


def print_e_mat(M, name: str = "", file=None) -> None:
    """Exponential-format printer (``d_print_e_mat``, ``:298``)."""
    print_mat(M, name=name, fmt="%9.2e", file=file)


def print_ocp_qp(dims: OCPDims, qp: OCPQP, file=None) -> None:
    """Per-stage logical view of a packed OCP QP: [B'; A'; b'], [R S'; S Q],
    gradients, bounds and general-constraint rows with padding stripped
    (the reference prints its pmat workspaces with ``d_print_pmat`` after
    packing, e.g. ``test_problems/test_d_ip_hard.c:481-493``)."""
    NU = dims.NU
    F = np.asarray(qp.F)
    H = np.asarray(qp.H)
    g = np.asarray(qp.g)
    b = np.asarray(qp.b)
    for n in range(dims.N + 1):
        nun, nxn = dims.nu[n], dims.nx[n]
        zsel = list(range(nun)) + [NU + j for j in range(nxn)]
        print(f"--- stage {n}: nu={nun} nx={nxn} nb={dims.nb[n]} ng={dims.ng[n]}", file=file)
        if n < dims.N:
            nxn1 = dims.nx[n + 1]
            print_mat(F[n][np.ix_(zsel, range(nxn1))], "F=[B';A']", file=file)
            print_mat(b[n][:nxn1], "b", file=file)
        print_mat(H[n][np.ix_(zsel, zsel)], "H=[R S'; S Q]", file=file)
        print_mat(g[n][zsel], "g=[r; q]", file=file)
        nbn = dims.nb[n]
        if nbn:
            print_mat(np.asarray(qp.idxb)[n, :nbn], "idxb", fmt="%5d", file=file)
            print_mat(np.asarray(qp.d_lb)[n, :nbn], "lb", file=file)
            print_mat(np.asarray(qp.d_ub)[n, :nbn], "ub", file=file)
        ngn = dims.ng[n]
        if ngn:
            print_mat(np.asarray(qp.C)[n][np.ix_(range(ngn), zsel)], "[D C]", file=file)
            print_mat(np.asarray(qp.d_lg)[n, :ngn], "lg", file=file)
            print_mat(np.asarray(qp.d_ug)[n, :ngn], "ug", file=file)


def print_solution(dims: OCPDims, sol, file=None) -> None:
    """Logical per-stage view of an IPMSolution (u, x, pi) plus the stat
    trace — the reference's post-solve printout
    (``test_d_ip_hard.c:884-905``)."""
    NU = dims.NU
    z = np.asarray(sol.z)
    pi = np.asarray(sol.pi)
    for n in range(dims.N + 1):
        print_mat(z[n, : dims.nu[n]], f"u[{n}]", file=file)
        print_mat(z[n, NU : NU + dims.nx[n]], f"x[{n}]", file=file)
    for n in range(dims.N):
        print_mat(pi[n, : dims.nx[n + 1]], f"pi[{n}]", file=file)
    kk = int(np.asarray(sol.kk))
    print(f"iterations: {kk}  status: {int(np.asarray(sol.status))}", file=file)
    print_e_mat(np.asarray(sol.stat)[:kk], "stat {sigma, alpha_aff, mu_aff, alpha, mu}", file=file)
