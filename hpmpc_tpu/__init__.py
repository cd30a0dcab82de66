"""hpmpc_tpu — TPU-native high-performance MPC solver framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of HPMPC
(Riccati-based LQCP solvers, interior-point and ADMM solvers for hard/soft
constrained linear MPC and MHE, full/partial condensing, scenario-tree MPC),
built for batched execution on TPU device meshes.  See README.md for the
reference -> module component map.
"""

from .ocp import OCPDims, OCPQP, pack_ocp

__all__ = [
    "OCPDims",
    "OCPQP",
    "pack_ocp",
    "api",
    "models",
    "ops",
    "parallel",
    "utils",
]

__version__ = "0.1.0"
