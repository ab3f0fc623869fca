#!/bin/bash
# round-20 full-surface correctness sweep: Verify + DuckDB compare at
# all three SFs. NEW this round (VERDICT r19 task 4): the sf0.01 leg
# writes tools/CORRECTNESS_local_r20.json in the driver's exact
# per-query schema — the local record that survives when the driver's
# own artifact comes back empty (r16/r18/r19).
cd "$(dirname "$0")/.."
OUT=tools/correctness_r20_sweeps.txt
: > "$OUT"
for sf in sf0.001 sf0.01 sf0.1; do
  echo "=== $sf $(date -u +%FT%TZ) commit=$(git rev-parse --short HEAD) ===" >> "$OUT"
  SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /root/testdata/$sf target/verify_$sf" 2>&1 \
    | grep -E '\[verify\]' >> "$OUT"
  ART=""
  if [ "$sf" = "sf0.01" ]; then ART="--artifact tools/CORRECTNESS_local_r20.json"; fi
  python3 tools/compare_local.py $ART /root/testdata/$sf target/verify_$sf 2>&1 \
    | tail -3 >> "$OUT"
done
touch tools/SWEEP_R20_DONE
