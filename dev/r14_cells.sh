#!/bin/bash
# Round-14 isolated scale cells (fresh JVM per rung — the scale_ladder
# containment posture): the two new/changed rows' decade curves
# (multimodal_phash_pairs, docs_curation_pipeline_v2) and the
# etl_upsert quiet-window watch-row cell (round-13 verdict task 4).
# ONLY-mode caveat (recorded): at-rest builds are skipped, which is
# irrelevant here — neither new row depends on an at-rest build, and
# etl_upsert builds its own staged state per rep.
#
# Usage: dev/r14_cells.sh [workDir]
set -u
WORK=${1:-/root/synth}
cd "$(dirname "$0")/.."

run_rung() {
  local SF=$1 ONLYQ=$2 OUT=$3 REPEAT=${4:-2}
  rm -f "$OUT"
  local RUNG_TMP
  RUNG_TMP=$(mktemp -d /tmp/graft_r14_XXXX)
  SPARK_GRAFT_OUT="$OUT" \
  SPARK_GRAFT_ONLY="$ONLYQ" \
  SPARK_GRAFT_STREAMING=off \
  SPARK_GRAFT_REPEAT=$REPEAT \
  SPARK_DRIVER_MEM=24g \
  SPARK_LOCAL_DIRS="$RUNG_TMP" \
  JAVA_TOOL_OPTIONS="-Djava.io.tmpdir=$RUNG_TMP" \
    sbt -batch "runMain graft.tools.ScaleBench $WORK $SF" \
    > "r14_cell_sf${SF}_$(echo "$ONLYQ" | cut -c1-12).log" 2>&1
  echo "rung sf$SF $ONLYQ exit=$? ($(date -u +%H:%M:%S))"
  rm -rf "$RUNG_TMP"
}

# Quiet cell first: the watch-row attribution needs load <~2 at start,
# and the host is quietest before the decade rungs run.
# (Already recorded this round: EXP_UPSERT_QUIET_SF100.json, plus the
# EXP_UPSERT_PREFOLD_SF100.json A/B that attributed and reversed the
# probe fold — skip unless re-measuring.)
if [ ! -f EXP_UPSERT_QUIET_SF100.json ]; then
  echo "=== etl_upsert quiet cell sf100 ($(date -u +%H:%M:%S)) load: $(cat /proc/loadavg) ==="
  run_rung 100.0 "etl_upsert" "EXP_UPSERT_QUIET_SF100.json" 2
fi

for SF in 10.0 31.6 100.0; do
  echo "=== r14 new-row rung sf$SF ($(date -u +%H:%M:%S)) ==="
  run_rung "$SF" \
    "multimodal_phash_pairs,docs_curation_pipeline_v2,multimodal_audio_fp_pairs" \
    "EXP_R14_SF${SF}.json"
done
