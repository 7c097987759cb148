#!/bin/bash
# Round-4 measurement battery: runs once the axon tunnel is back.
# Sequential (one process at a time; CLAUDE.md timing rules), each step
# bounded, logs under /tmp/r4m/ (synced into measurements/r4/ after).
#
# DECISION PROBES FIRST — suite/scale/headline run later, once probe
# winners are applied as defaults.
set -u
mkdir -p /tmp/r4m
cd /root/repo

run() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)" >> /tmp/r4m/driver.log
  timeout "$tmo" "$@" > "/tmp/r4m/$name.log" 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S)" >> /tmp/r4m/driver.log
}

# Wait for the tunnel: a trivial device query must succeed.
until timeout 180 python -c "import jax; print(jax.devices()[0])" \
      > /tmp/r4m/up.log 2>&1; do
  echo "tunnel down $(date -u +%H:%M:%S)" >> /tmp/r4m/driver.log
  sleep 120
done
echo "TUNNEL UP $(date -u +%H:%M:%S)" >> /tmp/r4m/driver.log

# 1. Small-config floor: is it the amortized host fetch? (decides the
#    bench time-targeting change + configs 1/3 verdict)
run probe_floor 2400 python .probe_floor.py
# 2. Budget utilization at 1M/2M (headroom for stream-frac tightening).
run probe_util 1800 python .probe_util.py
# 3. rows=4 vs rows=2 interleaved A/B at 500k/1M/2M.
run ab_rows4 3600 python .ab_rows4.py
echo "PROBES DONE $(date -u +%H:%M:%S)" >> /tmp/r4m/driver.log
# 4. Remaining stage attributions at shipped flags (2M already logged).
run stages_1m 1500 python bench.py --stages 1000000
run stages_250k 1200 python bench.py --stages 250000
echo "ALL DONE $(date -u +%H:%M:%S)" >> /tmp/r4m/driver.log
