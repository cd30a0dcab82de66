#!/bin/bash
# Full TPU measurement battery (run on a healthy axon relay; each bench has
# its own cold-compile window). Serializes behind the lock protocol used by
# the recovery watchers:
#   /tmp/cpu_busy.lock          — a builder holds this during CPU-heavy work
#   /tmp/tpu_bench_running.lock — held while this battery runs
#
# NEVER run CPU-heavy jobs (pytest -n 4, builds) concurrently: host load
# corrupts relay timings by up to 2.6x (see CLAUDE.md / memory notes).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_battery.log}
echo "battery started $(date)" >> "$LOG"
for j in $(seq 1 180); do
  [ -e /tmp/cpu_busy.lock ] || break
  sleep 10
done
touch /tmp/tpu_bench_running.lock
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name $(date)" >> "$LOG"
  timeout "$tmo" env "$@" >> "$LOG" 2>&1
  echo "$name rc=$? $(date)" >> "$LOG"
}
# headline (mega) + at-parity (two-stage) lines
run bench            1700 python bench.py
# engine-generation A/B rows
run bench-flat       1700 HPMPC_LANES_LOOP=0 python bench.py
run bench-lanes      1700 HPMPC_LANES_LOOP=1 HPMPC_MEGA_SWEEPS=0 python bench.py
# closed-loop warm-vs-cold RTI saving
run bench_warm       2400 python tools/bench_warm.py
# single-instance latency (incl. the mega_block padded-lane path)
run bench_latency    2400 python tools/bench_latency.py
# estimation family (MHE information/covariance + forward Schur)
run bench_mhe        2400 python tools/bench_mhe.py
# scenario trees: 31-node example + 71-node reference benchmark scale
run bench_tree       3000 python tools/bench_tree.py
# soft ladder (xla / pallas-chain / flat / lanes / mega in one run)
run bench_soft       2400 python tools/bench_soft.py
rm -f /tmp/tpu_bench_running.lock
echo "BATTERY DONE $(date)" >> "$LOG"
