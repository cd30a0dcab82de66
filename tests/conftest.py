"""Test configuration: CPU backend with a virtual 8-device mesh and float64.

Parity tests against the reference C solver require double precision
(the reference is f64-only); sharding tests require multiple devices.  Both
are provided by the CPU backend — TPU execution is covered by bench.py and
__graft_entry__.py on real hardware.
"""

import os

# Force CPU: the harness environment pins JAX_PLATFORMS=axon (the real TPU
# tunnel) and its sitecustomize registers the axon PJRT plugin at interpreter
# startup, so the env var alone is too late — the config update below is what
# actually forces the platform.  Parity tests need f64 and the virtual
# 8-device mesh, both CPU-only.  TPU execution is exercised by bench.py /
# __graft_entry__.py on the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
# The suite pins engines explicitly per test (flat / lanes / mega A/B
# coverage); the 4th-generation resident engine — the library default
# where its phase-1 semantics coincide with the config (select_engine) —
# is exercised by tests/test_resident.py (which sets =1) and the
# dispatch RULE by tests/test_dispatch.py (which deletes the override).
os.environ.setdefault("HPMPC_RESIDENT", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
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
