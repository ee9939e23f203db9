#!/bin/bash
# Round-17 scale-steps. Run each block ALONE (never beside a bench):
# the box lies under concurrent load (NOTES item 46).
#
# 1. TxTable family at 10x commit volume (VERDICT r16 task #6):
#    1,200 upserts + compact-every-10, files-opened audit, full-span
#    keyHistory, CDF-stream drain. Appends to SCALESTEP_TXTABLE.json.
#    A 120-commit baseline line first makes the scaling exponent
#    readable from the same file.
#
# 2. linkageBlocked auto-k vs pinned k at sf1 (VERDICT r16 task #3):
#    the q286 fixture on /tmp/sf1 (11.1M-value dictionary), k=0 = AUTO
#    (operator default; picks 5 there), vs the r16-measured fixed k=4
#    (780 s, 522M candidates). Regenerate /tmp/sf1 first if absent:
#      sbt -batch "runMain graft.ScaleData /root/testdata/sf0.1 /tmp/sf1 10"
set -u
sbt -batch "runMain graft.TxScaleStep 120 10"
sbt -batch "runMain graft.TxScaleStep 1200 10"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.LinkageScaleStep 0" 2>/dev/null | grep '"k"'
SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.LinkageScaleStep 0" 2>/dev/null | grep '"k"'
