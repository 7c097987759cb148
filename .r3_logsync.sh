#!/bin/bash
# Mirror the round-3 measurement battery's logs into the repo every
# 5 min so they survive session/round boundaries (the driver commits
# uncommitted work at round end). Detached companion to .r3_measure.sh.
set -u
mkdir -p /root/repo/measurements/r3
while true; do
  cp -f /tmp/r3m/*.log /root/repo/measurements/r3/ 2>/dev/null
  sleep 300
done
