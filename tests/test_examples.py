"""The examples/ scripts must run end-to-end (they assert their own
success criteria: regulation under bounds, estimator cross-validation)."""

import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


@pytest.mark.parametrize(
    "script", ["closed_loop_mpc.py", "mhe_estimation.py", "tree_mpc.py",
               "sharded_fleet.py", "dense_tick_mpc.py"]
)
def test_example_runs(script):
    env = {
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "JAX_PLATFORMS": "cpu",
        "JAX_ENABLE_X64": "1",
        "PYTHONPATH": "",
        "HOME": "/root",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    }
    out = subprocess.run(
        [sys.executable, str(ROOT / "examples" / script)],
        capture_output=True, text=True, timeout=560, env=env,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "OK" in out.stdout
