#!/bin/bash
# Single-rung sf100 rerun + re-merge (round 11): the first sf100 rung
# of this round lost 14 cells to the new disk gate before the
# reusable-scratch wipe existed; this reruns the rung on the fixed
# binary and re-merges the three-rung artifact.
set -u
cd "$(dirname "$0")/.."
rm -f SCALE_RUNG_sf100.0.json
RUNG_TMP=$(mktemp -d /tmp/graft_rung_XXXX)
SPARK_GRAFT_OUT=SCALE_RUNG_sf100.0.json \
SPARK_GRAFT_STREAMING=off \
SPARK_GRAFT_SKIP=docs_simhash_pairs \
SPARK_DRIVER_MEM=24g \
SPARK_LOCAL_DIRS="$RUNG_TMP" \
JAVA_TOOL_OPTIONS="-Djava.io.tmpdir=$RUNG_TMP" \
  sbt -batch "runMain graft.tools.ScaleBench /root/synth 100.0" \
  > ladder_sf100.0.log 2>&1
echo "rung exit=$? ($(date -u +%H:%M:%S))"
rm -rf "$RUNG_TMP"
python3 dev/merge_ladder.py SCALE_BENCH_SF100_REFORCED.json \
  SCALE_RUNG_sf10.0.json SCALE_RUNG_sf31.6.json SCALE_RUNG_sf100.0.json
echo done
