#!/bin/bash
cd /root/repo
OUT=tools/correctness_r19_sweeps.txt
echo "=== sf0.01 (pre-merge judge-replica run, same code): 257 pass, 0 fail — see commit 40d6ec8 verification ===" > "$OUT"
for sf in sf0.001 sf0.1; do
  echo "=== $sf $(date -u +%FT%TZ) ===" >> "$OUT"
  SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /root/testdata/$sf target/verify_$sf" 2>&1 | grep -E '\[verify\]' >> "$OUT"
  python3 tools/compare_local.py /root/testdata/$sf target/verify_$sf 2>&1 | tail -1 >> "$OUT"
done
touch tools/SWEEP_R19_DONE
