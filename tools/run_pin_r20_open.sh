#!/bin/bash
# round-20 OPENING full-surface pin: RUNS=5, run-alone, against the
# provenance-restored bars (r17 clean values for unconverted lines) —
# the first series whose scatter/suspect flags read against honest
# bars (VERDICT r19 task 1).
cd "$(dirname "$0")/.."
RAW=tools/bench_pin_r20_open_258q_raw.txt
{ echo "launch: $(date -u +%FT%TZ) load=$(cut -d' ' -f1-3 /proc/loadavg) commit=$(git rev-parse --short HEAD)"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_RUNS=5 sbt -batch "runMain graft.Bench"
  echo "end: $(date -u +%FT%TZ) load=$(cut -d' ' -f1-3 /proc/loadavg)"
} > "$RAW" 2> tools/bench_pin_r20_open_258q_err.txt
grep -o '{"metric":"total","value":[0-9.]*,"unit":"sec","queries".*' "$RAW" | head -1 > tools/bench_pin_r20_open_258q.json
touch tools/PIN_R20_OPEN_DONE
