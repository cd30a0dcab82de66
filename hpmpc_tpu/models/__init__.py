from . import admm, cond, ipm, ipm_soft, mhe, riccati, riccati_par, schur, tree

__all__ = [
    "admm", "cond", "ipm", "ipm_soft", "mhe",
    "riccati", "riccati_par", "schur", "tree",
]
