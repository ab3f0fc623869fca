#!/bin/bash
# round-20 same-window A/B (VERDICT r19 tasks 1+2): the six 1.5-1.9x
# r17->r19 drift lines PLUS the sketch canary, RUNS=5 at the r17
# commit (6da9dd2, worktree .wt_r20_r17) then HEAD, back to back in
# one window. Splits code-drift from host-drift for both the drift
# lines and the sketch_quantile_hist band that was missed in all five
# r19 series.
cd "$(dirname "$0")/.."
Q=corpus_quality_streamed,corpus_sample_gumbel,corpus_select_budget,dedup_exact_hash,similarity_bitext_margin_ann,similarity_bitext_mined,sketch_quantile_hist,tpch_q1
OUT=tools/bench_ab_r20_8q.txt
{ echo "=== A/B round-20: 6 drift lines + sketch canary + tpch_q1, RUNS=5, sf0.1, same window ==="
  echo "launch: $(date -u +%FT%TZ) load=$(cut -d' ' -f1-3 /proc/loadavg)"
  echo "--- SIDE A: r17 commit 6da9dd2 (worktree .wt_r20_r17) ---"
  ( cd .wt_r20_r17 && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_RUNS=5 SPARK_GRAFT_ONLY=$Q sbt -batch "runMain graft.Bench" 2>/dev/null \
      | grep -o '{"metric".*' )
  echo "mid: $(date -u +%FT%TZ) load=$(cut -d' ' -f1-3 /proc/loadavg)"
  echo "--- SIDE B: HEAD $(git rev-parse --short HEAD) ---"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_RUNS=5 SPARK_GRAFT_ONLY=$Q sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -o '{"metric".*'
  echo "end: $(date -u +%FT%TZ) load=$(cut -d' ' -f1-3 /proc/loadavg)"
} > "$OUT" 2>&1
touch tools/AB_R20_DONE
