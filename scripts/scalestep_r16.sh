#!/bin/bash
# Round-16 sf1 scale-step: the round's new/reworked families measured at
# sf0.1 and the deterministic x10 (/tmp/sf1, graft.ScaleData), min over
# 3 passes x internal runs per (query, SF), q02 as the cross-round load
# control. One JVM per (query, SF) so nothing shares a session; never
# run while anything else benches (NOTES item 46: the box lies under
# single runs).
#
# Regenerate /tmp/sf1 first if absent:
#   sbt -batch "runMain graft.ScaleData /root/testdata/sf0.1 /tmp/sf1 10"
set -u
OUT=${1:-/tmp/scalestep_r16}
mkdir -p "$OUT"
QUERIES="q02_filter_project q285_theil_sen_selection \
q286_linkage_blocked_highcard q175b_ivf_incremental_replay"
for q in $QUERIES; do
  for sf in /root/testdata/sf0.1 /tmp/sf1; do
    tag=$(basename "$sf")
    echo "=== $q @ $tag ==="
    SPARK_GRAFT_SF_DIR="$sf" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SKIP_STREAM=1 \
      SPARK_GRAFT_BENCH_FILTER="$q" SPARK_GRAFT_BENCH_PASSES=3 \
      sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' \
      > "$OUT/${q}_${tag}.json"
    tail -c 300 "$OUT/${q}_${tag}.json"; echo
  done
done
