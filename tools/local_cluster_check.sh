#!/usr/bin/env bash
# Multi-JVM correctness check (VERDICT r8 Next #2).
#
# local[32] runs every task in the driver JVM, which hides three
# whole classes of cluster bugs: closure-serialization failures
# (anything captured by a mapPartitions lambda that isn't actually
# Serializable), localCheckpoint lifetime assumptions, and listener /
# session-state assumptions (CapStats.install). This script runs the
# FULL driver-contract Verify — all SparkEntry.queries — on
# local-cluster[2,8,4096]: two separate executor JVMs, 8 cores each,
# real serialization on every task and shuffle, then the same DuckDB
# oracle compare the driver uses. q38 additionally runs dupClusters in
# reliable-checkpoint mode (SPARK_GRAFT_CHECKPOINT_DIR), so the
# 1000-executor recovery path executes end-to-end.
#
# Usage: tools/local_cluster_check.sh [sfDir] [outDir]
# Passes iff every oracle query compares clean (exit 0).
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.01}
OUT=${2:-target/vcluster}

sbt -batch package
# exclude the -tests jar: when Test/ compiled more recently the bare
# glob's newest match is the tests jar, which has no graft.Verify
JAR=$(ls -t target/scala-2.13/pigeonopticsspark_2.13-*.jar | grep -v -- -tests | head -1)

export SPARK_GRAFT_MASTER="local-cluster[2,8,4096]"
# 2 executors x 8 cores: match shuffle partitions to total cores
export SPARK_GRAFT_CPUS=16
export SPARK_GRAFT_CHECKPOINT_DIR=target/ckpt-cluster

rm -rf "$OUT" target/ckpt-cluster
/opt/spark/bin/spark-submit \
  --master "$SPARK_GRAFT_MASTER" \
  --driver-memory 8g \
  --conf spark.executor.memory=4g \
  --conf spark.ui.enabled=false \
  --conf spark.sql.session.timeZone=UTC \
  --class graft.Verify "$JAR" "$SF" "$OUT"

python3 tools/compare.py "$SF" "$OUT"
