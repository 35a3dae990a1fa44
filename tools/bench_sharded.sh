#!/bin/bash
# Sharded full-suite bench (r12 verdict item 8): run the suite as N
# fresh-JVM alphabetical cohorts so no query's timing depends on 400+
# other plans churning the codegen cache, then merge the shard detail
# files into the BENCH_FULL.json shape with tools/merge_bench.py.
#
# Usage: tools/bench_sharded.sh [N_SHARDS] [SF_DIR] [OUT]
set -e
N=${1:-8}
SF=${2:-/root/testdata/sf0.1}
OUT=${3:-BENCH_FULL.json}
cd "$(dirname "$0")/.."
shards=()
for ((i = 0; i < N; i++)); do
  f=/tmp/bench_shard_${i}_of_${N}.json
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
    SPARK_GRAFT_BENCH_SHARD="$i/$N" SPARK_GRAFT_BENCH_OUT=$f \
    sbt -batch "runMain graft.Bench" 2>&1 | grep '{"metric"' || true
  shards+=("$f")
done
python3 tools/merge_bench.py "$OUT" "${shards[@]}"
echo "merged -> $OUT"
