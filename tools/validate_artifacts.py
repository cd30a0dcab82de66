"""Artifact floor validator (round 5, VERDICT r04 Weak #5).

Scans a JSONL benchmark artifact (AUX_BENCH_*.json, SIZE_SWEEP_*.json,
BENCH_*.json tails) and REJECTS rows that claim a per-batch time below
the axon relay's measurement floor without saying so: the r04
``tree_ipm_warm_resolves_per_s_n31 = 4.096e12`` row ("0.00 ms/batch", no
flag) must be impossible to ship again.

Rules (per JSON row with a numeric ``value``):
  * a ``"<x> ms/batch"`` or ``"<x> ms/tick"`` claim with x < FLOOR_MS
    must carry a floor marker ("below relay measurement floor" or a
    ``floor_cleared`` field) — the K-slope method cannot resolve
    per-batch times under ~50us even with widened spans;
  * a rate value above ABSURD_RATE (1e10/s — 10x anything any engine
    has ever measured on one chip) is rejected outright unless flagged.

Usage: python tools/validate_artifacts.py FILE [FILE...]
Exit 0 = clean; exit 1 = violations (printed one per line).
"""

import json
import re
import sys

FLOOR_MS = 0.05
ABSURD_RATE = 1e10

# per-batch/tick claims only: kernel microbenches legitimately report
# sub-50us per-CALL times (they widen K until the span clears the floor)
_MS = re.compile(r"([0-9]*\.?[0-9]+(?:e[+-]?[0-9]+)?)\s*ms(?:/batch|/tick)")


def check_row(row):
    """Return a violation string or None."""
    if not isinstance(row, dict) or "value" not in row:
        return None
    unit = str(row.get("unit", ""))
    flagged = ("floor" in unit.lower()) or ("floor_cleared" in row)
    val = row.get("value")
    if isinstance(val, (int, float)) and val > ABSURD_RATE and not flagged:
        return f"absurd rate {val:g} without floor flag: {row.get('metric')}"
    m = _MS.search(unit)
    if m:
        ms = float(m.group(1))
        if 0 < ms < FLOOR_MS and not flagged:
            return (f"{ms:g} ms below relay floor without flag: "
                    f"{row.get('metric')}")
        if ms == 0.0 and not flagged:
            return f"0.00 ms claim without floor flag: {row.get('metric')}"
    return None


def validate_file(path):
    bad = []
    with open(path) as f:
        for ln, line in enumerate(f, 1):
            line = line.strip()
            if not line:
                continue
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue  # non-JSONL artifacts (e.g. BENCH dicts) skipped
            v = check_row(row)
            if v:
                bad.append(f"{path}:{ln}: {v}")
    return bad


def main():
    paths = sys.argv[1:]
    if not paths:
        print(__doc__)
        return 2
    bad = []
    for p in paths:
        bad += validate_file(p)
    for b in bad:
        print(b)
    print(f"{'FAIL' if bad else 'OK'}: {len(bad)} violation(s) across "
          f"{len(paths)} file(s)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
