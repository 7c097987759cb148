#!/bin/bash
set -u
cd /root/repo
until grep -q "FINAL2 DONE" measurements/r5/driver.log 2>/dev/null; do sleep 60; done
timeout 3600 python .r5_chunk2.py > measurements/r5/chunk2.log 2>&1
echo "CHUNK2 DONE $(date -u +%H:%M:%S)" >> measurements/r5/driver.log
