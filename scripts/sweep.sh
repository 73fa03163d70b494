#!/bin/bash
# Determinism sweep: run the full SparkEntry.queries set through
# graft.Verify at sf0.001 under each plan-shaping axis, then the DuckDB
# compare (scripts/check.py). A query is determinism-clean when its
# result hashes identically to the oracle under every axis — shuffle
# width, AQE, codegen mode, and scan splits must not change any result.
#
# Run ONLY on settled code (PLANS.md round-9 process scar: sweeping from
# target/classes while a ServiceLoader registration compiles produces
# phantom failures). Usage: scripts/sweep.sh [sfdir]
set -u
SF="${1:-/root/testdata/sf0.001}"
cd "$(dirname "$0")/.."
declare -A AXES=(
  [shuffle7]="spark.sql.shuffle.partitions=7"
  [aqe_off]="spark.sql.adaptive.enabled=false"
  [no_codegen]="spark.sql.codegen.wholeStage=false;spark.sql.codegen.factoryMode=NO_CODEGEN"
  [splits_1mb]="spark.sql.files.maxPartitionBytes=1048576;spark.sql.files.openCostInBytes=0"
)
for axis in shuffle7 aqe_off no_codegen splits_1mb; do
  out="/tmp/sweep_${axis}"
  rm -rf "$out"
  echo "=== axis $axis: ${AXES[$axis]}"
  SPARK_GRAFT_CONF="${AXES[$axis]}" SPARK_GRAFT_CPUS=8 \
    sbt "runMain graft.Verify $SF $out" 2>&1 | grep "\[verify\]"
  python3 scripts/check.py "$SF" "$out" 2>&1 | tail -3
done
