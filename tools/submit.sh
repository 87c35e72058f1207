#!/usr/bin/env bash
# spark-submit launcher for the KG construction pipeline (graft.PipelineMain)
# at a chosen cluster size. The north rule's scaling criterion runs this
# TWICE — once at N executors, once at 4N — against the same input and
# compares triples/sec (target efficiency >= 0.8):
#
#   N_EXECUTORS=8  tools/submit.sh s3a://bucket/pages  s3a://bucket/kg-store
#   N_EXECUTORS=32 tools/submit.sh s3a://bucket/pages  s3a://bucket/kg-store-4n
#
# In this sandbox (no cluster manager) the equivalent evidence is
# `graft.Bench`'s interleaved local[N]/local[4N] pairs — see BENCH.md.
set -euo pipefail
PAGES="${1:?usage: submit.sh <pages-parquet-dir> <out-root> [extra PipelineMain args]}"
OUT="${2:?usage: submit.sh <pages-parquet-dir> <out-root> [extra PipelineMain args]}"
N_EXECUTORS="${N_EXECUTORS:-8}"
EXECUTOR_CORES="${EXECUTOR_CORES:-4}"
EXECUTOR_MEMORY="${EXECUTOR_MEMORY:-8g}"

sbt -batch package
# newest-mtime jar, glob-safe under pipefail (an unmatched glob must not
# kill the script, and an old version must never be submitted silently)
JAR=$(find target/scala-2.13 -maxdepth 1 -name '*.jar' -printf '%T@ %p\n' \
  | sort -rn | head -1 | cut -d' ' -f2-)
[ -n "$JAR" ] || { echo "no jar found under target/scala-2.13" >&2; exit 1; }

exec spark-submit \
  --class graft.PipelineMain \
  --num-executors "$N_EXECUTORS" \
  --executor-cores "$EXECUTOR_CORES" \
  --executor-memory "$EXECUTOR_MEMORY" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf "spark.sql.shuffle.partitions=$((N_EXECUTORS * EXECUTOR_CORES * 2))" \
  "$JAR" --pages "$PAGES" --out "$OUT" "${@:3}"
