#!/usr/bin/env bash
# Phase-gated N-vs-4N scaling measurement (secondary safeguard).
#
# The dominant "storm" component turned out to be self-inflicted lazy
# heap page-faulting, fixed at the JVM level (pre-touch + THP — see
# graft.HostPhaseProbe's scaladoc). What remains is a genuine ~1.5x
# residual host phase swing. This script polls the bandwidth probe on an
# otherwise-idle box and launches bench/scale_cluster.sh only inside a
# clean window, re-probing afterwards so the recorded ratio carries
# before/after phase evidence.
#
# Usage: bench/phase_gate.sh [entities] [reps] [threshold_units_per_sec]
#   threshold: aggregate mem-probe units/s at 12 threads (1 unit = 8 MB).
#   Default 11000 (~86 GB/s) — comfortably above the 4300 storm floor,
#   below the 15000 clean-phase reading.
set -euo pipefail
cd "$(dirname "$0")/.."

ENTITIES="${1:-200000}"
REPS="${2:-2}"
THRESH="${3:-11000}"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
LOG="BENCH/phase_gate.jsonl"

probe() { # threads units -> units_per_sec (probe pinned off the driver cores)
  taskset -c 16-27 java -cp "$CP" graft.HostPhaseProbe mem "$1" "$2" \
    | tee -a "$LOG" | sed -E 's/.*"units_per_sec":([0-9.]+).*/\1/'
}

while true; do
  ups=$(probe 12 4800)
  echo "$(date -u +%H:%M:%S) mem12=$ups (threshold $THRESH)" >&2
  if awk -v u="$ups" -v t="$THRESH" 'BEGIN{exit !(u>=t)}'; then
    echo "clean phase detected — launching scale_cluster $ENTITIES x$REPS" >&2
    bash bench/scale_cluster.sh "$ENTITIES" "$REPS"
    probe 12 4800 >/dev/null   # post-measurement phase evidence
    exit 0
  fi
  sleep 300
done
