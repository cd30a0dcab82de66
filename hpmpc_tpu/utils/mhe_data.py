"""Reader for the reference's MHE measurement fixture
(``test_problems/mhe_measure.dat``, consumed at ``test_d_ric_mhe.c:299``):
header "nx nw ny Ns" followed by Ns measurement vectors of length ny."""

from __future__ import annotations

import numpy as np


def load_mhe_measure(path: str):
    """Returns (nx, nw, ny, Ns, y) with y of shape (Ns, ny)."""
    with open(path) as f:
        toks = f.read().split()
    nx, nw, ny, Ns = (int(t) for t in toks[:4])
    vals = np.array([float(t) for t in toks[4:]])
    assert vals.size >= Ns * ny, (vals.size, Ns, ny)
    y = vals[: Ns * ny].reshape(Ns, ny)
    return nx, nw, ny, Ns, y
