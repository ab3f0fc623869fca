#!/bin/bash
# round-20 scale-curve for the STEADY-STATE SERVING surface (VERDICT
# r19 task 6): x1 (sf0.01) and x10 (sf0.1) RUNS=5 rows for three
# representative builtOnce-converted lines, proving the served path is
# near-flat at 10x the way the probe gates are. Within one Bench JVM
# the first timed repetition pays the build; the RUNS=5 median is the
# served cost.
cd "$(dirname "$0")/.."
Q=similarity_ivfpq_streamed,retrieval_bm25_asof,dedup_neardup_asof,tpch_q1
OUT=tools/scaling_r20_served.txt
{ echo "=== round-20 served-path scaling: $Q ==="
  echo "launch: $(date -u +%FT%TZ) load=$(cut -d' ' -f1-3 /proc/loadavg) commit=$(git rev-parse --short HEAD)"
  for sf in sf0.01 sf0.1; do
    echo "--- $sf ---"
    SPARK_GRAFT_SF_DIR=/root/testdata/$sf SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_RUNS=5 SPARK_GRAFT_ONLY=$Q sbt -batch "runMain graft.Bench" 2>/dev/null \
      | grep -o '{"metric".*'
  done
  echo "end: $(date -u +%FT%TZ) load=$(cut -d' ' -f1-3 /proc/loadavg)"
} > "$OUT" 2>&1
touch tools/SCALING_R20_DONE
