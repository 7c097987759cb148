#!/bin/bash
# Round-4 battery, phase 3: FINAL numbers at settled defaults.
# Launch manually once flag decisions from phases 1-2 are applied.
set -u
mkdir -p /tmp/r4m
cd /root/repo

run() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)" >> /tmp/r4m/driver.log
  timeout "$tmo" "$@" > "/tmp/r4m/$name.log" 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S)" >> /tmp/r4m/driver.log
}

until timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  sleep 120
done

run headline 2400 python bench.py
run suite 3600 python bench.py --suite
run scale 3600 python bench.py --scale
run parity 2400 python bench.py --parity
run stages2m_final 1800 python bench.py --stages 2000000
echo "PHASE3 DONE $(date -u +%H:%M:%S)" >> /tmp/r4m/driver.log
