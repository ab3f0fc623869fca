#!/bin/bash
# round-19 CLOSING full-257 pin: RUNS=5, run-alone, post-builtOnce
# conversion (lifecycle composites measure steady-state serving).
cd /root/repo
RAW=tools/bench_pin_r19_final_257q_try2_raw.txt
{ echo "launch: $(date -u +%FT%TZ) load=$(cut -d' ' -f1-3 /proc/loadavg) commit=$(git rev-parse --short HEAD)"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_RUNS=5 sbt -batch "runMain graft.Bench"
  echo "end: $(date -u +%FT%TZ) load=$(cut -d' ' -f1-3 /proc/loadavg)"
} > "$RAW" 2> tools/bench_pin_r19_final_257q_try2_err.txt
grep -o '{"metric":"total","value":[0-9.]*,"unit":"sec","queries".*' "$RAW" | head -1 > tools/bench_pin_r19_final_257q_try2.json
touch tools/PIN_R19_CLOSE2_DONE
