#!/usr/bin/env bash
# Interleaved N-vs-4N scaling evidence: alternate the two pinned levels
# (lo,hi,lo,hi,...) so BOTH sample the same host-noise phases.
#
# Why this exists: scale_pinned.sh runs all reps of one level, then all
# reps of the other. On a host whose throughput phases shift on ~minutes
# timescales (measured round 4: identical work cost 1264-3874
# task-core-seconds across invocations), a phase boundary between the two
# blocks confounds the ratio in either direction — one invocation
# produced a nonsense >1.0 "efficiency". Interleaving bounds the phase
# drift between any lo/hi pair to one run's duration, and best-of-k per
# level then picks comparable least-contended samples.
#
# Per (level, rep) sample: a fresh taskset-pinned 16g JVM runs ONE
# measured execution, warmed by a small-corpus run (JIT/codegen/classes
# warm at any size — ScaleBench arg 4).
#
# Usage: bench/scale_interleaved.sh [entities] [reps] [loCpus] [hiCpus] [heapGb]
set -euo pipefail
cd "$(dirname "$0")/.."

ENTITIES="${1:-200000}"
REPS="${2:-2}"
LO="${3:-4}"
HI="${4:-16}"
HEAP_GB="${5:-16}"
WARMUP=20000

CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

run_one() {
  local cpus="$1"
  local last=$(( cpus - 1 ))
  mkdir -p /dev/shm/spark-local
  taskset -c "0-$last" java $ADD_OPENS -Xms"${HEAP_GB}g" -Xmx"${HEAP_GB}g" -XX:+AlwaysPreTouch -XX:+UseTransparentHugePages \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dspark.local.dir=/dev/shm/spark-local \
    -cp "$CP" graft.ScaleBench "$ENTITIES" "$cpus" 1 "$WARMUP" 2>/dev/null \
    | tail -1
}

echo "# interleaved: entities=$ENTITIES reps=$REPS levels=$LO,$HI heap=${HEAP_GB}g warmup=$WARMUP" >&2
ROWS=""
for r in $(seq 1 "$REPS"); do
  for c in "$LO" "$HI"; do
    J=$(run_one "$c")
    echo "$J"
    ROWS="$ROWS$J"$'\n'
  done
done

# best (min total_sec) per level → efficiency
echo "$ROWS" | awk -v lo="$LO" -v hi="$HI" '
  /"cpus":/ {
    match($0, /"cpus":[0-9]+/);      c = substr($0, RSTART+7, RLENGTH-7)+0
    match($0, /"total_sec":[0-9.]+/); t = substr($0, RSTART+12, RLENGTH-12)+0
    match($0, /"pairs_per_sec":[0-9]+/); p = substr($0, RSTART+16, RLENGTH-16)+0
    if (!(c in bestT) || t < bestT[c]) { bestT[c] = t; bestP[c] = p }
  }
  END {
    ratio = hi/lo
    printf("{\"scaling_interleaved\":{\"n_cpus\":%d,\"xn_cpus\":%d,\"total_sec_n\":%.2f,\"total_sec_xn\":%.2f,\"efficiency\":%.2f,\"pairs_per_sec_n\":%d,\"pairs_per_sec_xn\":%d,\"score_efficiency\":%.2f}}\n",
      lo, hi, bestT[lo], bestT[hi], (bestT[lo]/bestT[hi])/ratio,
      bestP[lo], bestP[hi], (bestP[hi]/bestP[lo])/ratio)
  }'
