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
  timeout "$tmo" env "$@" >> "$LOG" 2>&1
  echo "$name rc=$? $(date)" >> "$LOG"
}
run bench            1700 python bench.py
run bench-fused      1700 HPMPC_FUSED_SWEEPS=1 python bench.py
run bench-lanes      1700 HPMPC_LANES_LOOP=1 python bench.py
run bench-lanes-fused 1700 HPMPC_LANES_LOOP=1 HPMPC_FUSED_SWEEPS=1 python bench.py
run bench-mega       1700 HPMPC_LANES_LOOP=1 HPMPC_MEGA_SWEEPS=1 python bench.py
run iter_split       3000 python tools/bench_iter_split.py
run bench_tree       2400 python tools/bench_tree.py
run bench_soft       1700 python tools/bench_soft.py
run bench_soft-lanes 1700 HPMPC_LANES_LOOP=1 python tools/bench_soft.py
rm -f /tmp/tpu_bench_running.lock
echo "BATTERY DONE $(date)" >> "$LOG"
