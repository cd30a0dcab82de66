"""Unit tests of the artifact floor validator (tools/validate_artifacts)."""

import importlib.util
import pathlib

spec = importlib.util.spec_from_file_location(
    "validate_artifacts",
    pathlib.Path(__file__).parent.parent / "tools" / "validate_artifacts.py",
)
va = importlib.util.module_from_spec(spec)
spec.loader.exec_module(va)


def test_rejects_absurd_rate_without_flag():
    row = {"metric": "x_per_s", "value": 4.096e12,
           "unit": "re-solves/s (0.00 ms/batch)"}
    assert va.check_row(row) is not None


def test_rejects_subfloor_ms_without_flag():
    row = {"metric": "x", "value": 1.0, "unit": "0.003 ms/batch"}
    assert va.check_row(row) is not None


def test_accepts_flagged_floor_row():
    row = {"metric": "x", "value": 0.0,
           "unit": "0.000 ms/batch [below relay measurement floor]"}
    assert va.check_row(row) is None


def test_accepts_normal_rows_and_kernel_microbench_ms():
    assert va.check_row({"metric": "x", "value": 5.5e5,
                         "unit": "solves/s (5.2 ms/batch)"}) is None
    # bare per-CALL kernel times are allowed below the batch floor
    assert va.check_row({"metric": "k", "value": 894.9,
                         "unit": "GB/s (0.046 ms)"}) is None


def test_round5_artifacts_are_clean():
    repo = pathlib.Path(__file__).parent.parent
    for name in ("AUX_BENCH_r05.json", "SIZE_SWEEP_r05.json"):
        p = repo / name
        if p.exists():
            assert va.validate_file(str(p)) == []
