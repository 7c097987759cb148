#!/bin/bash
# Round-4 battery, phase 2: waits for phase 1 (ALL DONE in
# /tmp/r4m/driver.log), then runs the z-cull A/B and any follow-ups
# queued in /tmp/r4m/phase2.d/*.sh (dropped there by the session as
# decisions land). Logs under /tmp/r4m/.
set -u
mkdir -p /tmp/r4m /tmp/r4m/phase2.d
cd /root/repo

run() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)" >> /tmp/r4m/driver.log
  timeout "$tmo" "$@" > "/tmp/r4m/$name.log" 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S)" >> /tmp/r4m/driver.log
}

until grep -q "ALL DONE" /tmp/r4m/driver.log 2>/dev/null; do
  sleep 60
done
until timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  sleep 120
done

run ab_zcull 3600 python .ab_zcull.py
for f in /tmp/r4m/phase2.d/*.sh; do
  [ -e "$f" ] || continue
  name=$(basename "$f" .sh)
  run "p2_$name" 3600 bash "$f"
done
echo "PHASE2 DONE $(date -u +%H:%M:%S)" >> /tmp/r4m/driver.log
