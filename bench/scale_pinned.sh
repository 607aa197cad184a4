#!/usr/bin/env bash
# N-vs-4N scaling evidence under faithful resource isolation.
#
# The north rule's criterion is throughput scaling efficiency >=0.8 between
# N- and 4N-EXECUTOR cluster runs. This sandbox has no cluster, so each
# "cluster size" is emulated by ONE JVM that owns exactly the resources
# that cluster would have:
#   - CPU: pinned with `taskset -c 0-(N-1)` — without pinning, a local[8]
#     run on a 32-core box still uses all 32 cores for GC, JIT, netty IO
#     and parquet threads, i.e. the small "cluster" silently borrows 4x
#     resources and the measured efficiency understates true scaling.
#   - Memory: the SAME modest heap at both levels (default 16g — the size
#     of one production executor). Real clusters scale out with many
#     fixed-size executor heaps, not one giant heap; measured here, a 64g
#     heap made G1 young collections ~0.75s each (261s of GC in one run)
#     and corrupted the measurement, while the workload fits 16g at both
#     levels with zero spill, so equal heaps keep memory out of the
#     comparison entirely.
# JVM thread pools (GC, common FJ pool) size themselves from the pinned
# affinity mask (Linux sched_getaffinity), so parallelism follows the
# pin automatically.
#
# Usage: bench/scale_pinned.sh [entities] [reps] [loCpus] [hiCpus] [heapGb]
# Writes one JSON line per level (from graft.ScaleBench single-level mode)
# plus a derived efficiency line.
set -euo pipefail
cd "$(dirname "$0")/.."

ENTITIES="${1:-200000}"
REPS="${2:-2}"
LO="${3:-8}"
HI="${4:-32}"
HEAP_GB="${5:-16}"

CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

run_level() {
  local cpus="$1"
  local heap=$HEAP_GB
  local last=$(( cpus - 1 ))
  mkdir -p /dev/shm/spark-local
  taskset -c "0-$last" java $ADD_OPENS -Xms"${heap}g" -Xmx"${heap}g" -XX:+AlwaysPreTouch -XX:+UseTransparentHugePages \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dspark.local.dir=/dev/shm/spark-local \
    -cp "$CP" graft.ScaleBench "$ENTITIES" "$cpus" "$REPS" 2>/dev/null \
    | tail -1
}

echo "# entities=$ENTITIES reps=$REPS levels=$LO,$HI heap=${HEAP_GB}g/JVM (pinned via taskset)" >&2
LO_JSON=$(run_level "$LO")
echo "$LO_JSON"
HI_JSON=$(run_level "$HI")
echo "$HI_JSON"

# efficiency = (pairs/sec_hi / pairs/sec_lo) / (hi/lo); same for total_sec
echo "$LO_JSON $HI_JSON" | awk -v lo="$LO" -v hi="$HI" '{
  n = split($0, a, /"pairs_per_sec":/); plo = a[2]+0; phi = a[3]+0
  split($0, b, /"total_sec":/);          tlo = b[2]+0; thi = b[3]+0
  ratio = hi/lo
  printf("{\"scaling\":{\"n_cpus\":%d,\"xn_cpus\":%d,\"total_sec_n\":%.2f,\"total_sec_xn\":%.2f,\"speedup\":%.2f,\"efficiency\":%.2f,\"pairs_per_sec_n\":%.0f,\"pairs_per_sec_xn\":%.0f,\"score_efficiency\":%.2f}}\n",
    lo, hi, tlo, thi, tlo/thi, (tlo/thi)/ratio, plo, phi, (phi/plo)/ratio)
}'
