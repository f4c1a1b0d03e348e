#!/bin/bash
# Post-ladder sequence for round 9: run AFTER the sf100 rung + merge
# complete (dev/scale_ladder.sh writes SCALE_BENCH_SF100_REFORCED.json).
# Compiles + full-tests the five queued code-review fixes, then re-runs
# the interval skew bench so the committed artifact matches the
# committed code. Each step logs to its own file; the script stops on
# the first failure so a red suite never reaches the bench step.
set -e
cd "$(dirname "$0")/.."
echo "=== compile ($(date -u +%H:%M:%S)) ==="
sbt -batch compile > post_compile.log 2>&1
echo "=== test ($(date -u +%H:%M:%S)) ==="
sbt -batch test > post_test.log 2>&1
tail -5 post_test.log
echo "=== interval skew bench ($(date -u +%H:%M:%S)) ==="
sbt -batch "runMain graft.tools.IntervalSkewBench" > post_skew.log 2>&1 || \
  echo "skew bench main absent or failed - check post_skew.log"
echo "=== done ($(date -u +%H:%M:%S)) ==="
