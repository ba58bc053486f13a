#!/bin/bash
# Round evidence sweep (the round-13 script, name made round-neutral):
# bench at 4 scale points, then the at-scale oracle gates at sf1 and
# sf3. Sequential — contention poisons medians.
set -e
cd /root/repo
mkdir -p /tmp/scalebench
bash tools/scalebench.sh bench
for s in sf1 sf3; do
  echo "=== Scalecheck $s $(date -u +%H:%M:%S)"
  rm -rf /tmp/sv_$s
  SPARK_GRAFT_VERIFY_SKIP=d05_embed_dup,d06_cosine_topk \
    sbt -batch "runMain graft.Verify target/scale/$s /tmp/sv_$s" \
    > /tmp/scalebench/verify_$s.log 2>&1
  python3 tools/scalecheck.py target/scale/$s /tmp/sv_$s > SCALECHECK_$s.txt
  tail -1 SCALECHECK_$s.txt
done
echo "=== sweep done $(date -u +%H:%M:%S)"
