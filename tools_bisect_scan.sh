#!/bin/bash
# Bisect the long-scan TPU fault: batch x steps x pallas-kernel subset.
# One TPU process at a time; each cell is a fresh process.
set -u
OUT=/tmp/bisect_scan.log
: > $OUT
for STEPS in 10 20; do
  for NOPK in all "" chol noslip mpr; do
    echo "=== steps=$STEPS FLYBODY_NO_PALLAS='$NOPK'" | tee -a $OUT
    BENCH_STEPS=$STEPS BENCH_BATCH=8192 FLYBODY_NO_PALLAS="$NOPK" \
      timeout 900 python bench.py >> $OUT 2>&1
    rc=$?
    echo "rc=$rc" | tee -a $OUT
    tail -1 $OUT
    if [ $rc -ne 0 ]; then sleep 180; fi  # let the TPU worker recover
  done
done
echo DONE | tee -a $OUT
