#!/bin/bash
# Round-9 end-of-session artifact refresh: bench at every scale point
# (replicas already generated), then the at-scale oracle gate at sf1 and
# sf3. Logs to /tmp/scalebench/.
set -e
cd /root/repo
mkdir -p /tmp/scalebench

tools/scalebench.sh bench

for s in sf1 sf3; do
  echo "=== Scale verify $s $(date -u +%H:%M:%S)"
  SPARK_GRAFT_VERIFY_SKIP=d05_embed_dup,d06_cosine_topk \
    sbt -batch "runMain graft.Verify target/scale/$s /tmp/scaleverify_$s" \
    > "/tmp/scalebench/verify_$s.log" 2>&1
  echo "=== Scalecheck $s $(date -u +%H:%M:%S)"
  python3 tools/scalecheck.py "target/scale/$s" "/tmp/scaleverify_$s" \
    > "SCALECHECK_$s.txt" 2>&1 || true
  tail -1 "SCALECHECK_$s.txt"
done
echo "=== refresh done $(date -u +%H:%M:%S)"
