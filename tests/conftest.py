"""Test configuration: CPU backend with a virtual 8-device mesh and float64.

Parity tests against the reference C solver require double precision
(the reference is f64-only); sharding tests require multiple devices.  Both
are provided by the CPU backend — TPU execution is covered by bench.py and
__graft_entry__.py on real hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import json
import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


def load_golden(name):
    with open(GOLDEN_DIR / f"{name}.json") as f:
        return json.load(f)


def golden_ab(g):
    """Extract (A, B) recorded by the reference generator (column-major)."""
    nx = g["config"]["nx"]
    nu = g["config"]["nu"]
    A = np.array(g["A_colmajor"]).reshape(nx, nx, order="F")
    B = np.array(g["B_colmajor"]).reshape(nx, nu, order="F")
    return A, B


@pytest.fixture
def rng():
    return np.random.default_rng(42)
