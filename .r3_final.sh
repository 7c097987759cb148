#!/bin/bash
# Round-3 final refresh: runs AFTER the probe battery and after the
# probe winners are applied as defaults. Sequential (one process at a
# time; CLAUDE.md timing rules), each step bounded, logs under /tmp/r3f/.
# Order: CPU-only steps first (tests, multichip dryrun — TPU idle), then
# the TPU measurement set with no CPU work alongside.
set -u
mkdir -p /tmp/r3f
cd /root/repo

run() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)" >> /tmp/r3f/driver.log
  timeout "$tmo" "$@" > "/tmp/r3f/$name.log" 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S)" >> /tmp/r3f/driver.log
}

run pytest 1800 python -m pytest tests/ -q
run dryrun 900 python -c "
import __graft_entry__ as g
g.dryrun_multichip(8)
print('dryrun ok')
"
run stages_250k 1200 python bench.py --stages 250000
run stages_1m 1500 python bench.py --stages 1000000
run stages_2m 1800 python bench.py --stages 2000000
run scale 2400 python bench.py --scale
run suite 2400 python bench.py --suite
run parity 1800 python bench.py --parity
run headline 1200 python bench.py
mkdir -p /root/repo/measurements/r3
cp -f /tmp/r3f/*.log /root/repo/measurements/r3/ 2>/dev/null
echo "FINAL DONE $(date -u +%H:%M:%S)" >> /tmp/r3f/driver.log
run pytest2 3600 python -m pytest tests/ -q --durations=25
cp -f /tmp/r3f/*.log /root/repo/measurements/r3/ 2>/dev/null
echo "PYTEST2 DONE $(date -u +%H:%M:%S)" >> /tmp/r3f/driver.log
run probe_gather2 1200 python .probe_gather.py
cp -f /tmp/r3f/*.log /root/repo/measurements/r3/ 2>/dev/null
echo "GATHER2 DONE $(date -u +%H:%M:%S)" >> /tmp/r3f/driver.log
