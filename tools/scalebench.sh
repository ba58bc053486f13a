#!/bin/bash
# Regenerate the ScaleUp replicas and re-run the bench at every scale
# point (sf0.1 driver data + 10x/30x/100x replicas), refreshing the
# committed BENCH*.json artifacts at the current HEAD. Each step logs to
# /tmp/scalebench/. Usage: tools/scalebench.sh [gen|bench|all]
set -e
cd /root/repo
mkdir -p /tmp/scalebench
MODE="${1:-all}"

if [ "$MODE" = "gen" ] || [ "$MODE" = "all" ]; then
  for f in "sf1 10" "sf3 30" "sf10 100"; do
    set -- $f
    echo "=== ScaleUp $1 (factor $2) $(date -u +%H:%M:%S)"
    sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 target/scale/$1 $2" \
      > "/tmp/scalebench/gen_$1.log" 2>&1
  done
fi

if [ "$MODE" = "bench" ] || [ "$MODE" = "all" ]; then
  echo "=== Bench sf0.1 $(date -u +%H:%M:%S)"
  SPARK_GRAFT_BENCH_OUT=BENCH.json \
    sbt -batch "runMain graft.Bench /root/testdata/sf0.1" \
    > /tmp/scalebench/bench_sf0.1.log 2>&1
  for s in sf1 sf3 sf10; do
    echo "=== Bench $s $(date -u +%H:%M:%S)"
    SPARK_GRAFT_BENCH_OUT="BENCH_$s.json" \
      sbt -batch "runMain graft.Bench target/scale/$s" \
      > "/tmp/scalebench/bench_$s.log" 2>&1
  done
fi
echo "=== scalebench done $(date -u +%H:%M:%S)"
