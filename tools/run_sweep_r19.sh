#!/bin/bash
# round-19 full-surface correctness sweep: Verify + DuckDB compare at
# all three SFs (the round-18 discipline, tools/correctness_r18_sweeps.txt)
cd "$(dirname "$0")/.."
OUT=tools/correctness_r19_sweeps.txt
: > "$OUT"
for sf in sf0.001 sf0.01 sf0.1; do
  echo "=== $sf $(date -u +%FT%TZ) ===" >> "$OUT"
  SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /root/testdata/$sf target/verify_$sf" 2>&1 \
    | grep -E '\[verify\]' >> "$OUT"
  python3 tools/compare_local.py /root/testdata/$sf target/verify_$sf 2>&1 \
    | tail -3 >> "$OUT"
done
touch tools/SWEEP_R19_DONE
