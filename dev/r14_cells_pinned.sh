#!/bin/bash
# r14_cells.sh new-row rungs, driven through dev/run_main.sh against a
# PINNED classes snapshot (no sbt lock, immune to concurrent source
# edits): snapshot target/scala-2.13/classes first, e.g.
#   cp -r target/scala-2.13/classes /tmp/graft_r14_classes
# Usage: dev/r14_cells_pinned.sh [workDir] [classesDir]
set -u
WORK=${1:-/root/synth}
CLASSES=${2:-/tmp/graft_r14_classes}
cd "$(dirname "$0")/.."

run_rung() {
  local SF=$1 ONLYQ=$2 OUT=$3 REPEAT=${4:-2}
  rm -f "$OUT"
  local RUNG_TMP
  RUNG_TMP=$(mktemp -d /tmp/graft_r14_XXXX)
  GRAFT_CLASSES="$CLASSES" \
  SPARK_GRAFT_OUT="$OUT" \
  SPARK_GRAFT_ONLY="$ONLYQ" \
  SPARK_GRAFT_STREAMING=off \
  SPARK_GRAFT_REPEAT=$REPEAT \
  SPARK_DRIVER_MEM=24g \
  SPARK_LOCAL_DIRS="$RUNG_TMP" \
  JAVA_TOOL_OPTIONS="-Djava.io.tmpdir=$RUNG_TMP" \
    dev/run_main.sh graft.tools.ScaleBench "$WORK" "$SF" \
    > "r14_cell_sf${SF}_$(echo "$ONLYQ" | cut -c1-12).log" 2>&1
  echo "rung sf$SF $ONLYQ exit=$? ($(date -u +%H:%M:%S))"
  rm -rf "$RUNG_TMP"
}

for SF in 10.0 31.6 100.0; do
  echo "=== r14 new-row rung sf$SF ($(date -u +%H:%M:%S)) ==="
  run_rung "$SF" \
    "multimodal_phash_pairs,docs_curation_pipeline_v2,multimodal_audio_fp_pairs" \
    "EXP_R14_SF${SF}.json"
done
