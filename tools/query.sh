#!/usr/bin/env bash
# spark-submit launcher for SPARQL queries over a materialized store
# (graft.QueryMain) — the query-side twin of submit.sh: submit.sh builds
# the bucketed store, this runs a SPARQL file over it and writes the
# solutions.
#
#   N_EXECUTORS=8 tools/query.sh s3a://bucket/kg-store query.rq s3a://bucket/solutions
#   N_EXECUTORS=8 tools/query.sh s3a://bucket/kg-store construct.rq s3a://bucket/nt --format ntriples
#
# Extra args pass through to QueryMain (--format values|parquet|ntriples,
# --base <iri>). To query a raw RDF file / parquet frame instead of a
# store, invoke spark-submit directly with --data (see QueryMain scaladoc).
set -euo pipefail
STORE="${1:?usage: query.sh <store-root> <query.rq> <out-dir> [extra QueryMain args]}"
QUERY="${2:?usage: query.sh <store-root> <query.rq> <out-dir> [extra QueryMain args]}"
OUT="${3:?usage: query.sh <store-root> <query.rq> <out-dir> [extra QueryMain args]}"
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
  --class graft.QueryMain \
  --num-executors "$N_EXECUTORS" \
  --executor-cores "$EXECUTOR_CORES" \
  --executor-memory "$EXECUTOR_MEMORY" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf "spark.sql.shuffle.partitions=$((N_EXECUTORS * EXECUTOR_CORES * 2))" \
  "$JAR" --store "$STORE" --query "$QUERY" --out "$OUT" "${@:4}"
