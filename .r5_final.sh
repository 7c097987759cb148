#!/bin/bash
# Final round-5 bench battery — run ONLY with the box otherwise idle.
set -u
cd /root/repo
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)" >> measurements/r5/driver.log
  timeout "$tmo" "$@" > "measurements/r5/$name.log" 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S)" >> measurements/r5/driver.log
}
until timeout 180 python -c "import jax; print(jax.devices()[0])" \
      > measurements/r5/up5.log 2>&1; do
  sleep 120
done
run headline 2400 python bench.py
run suite 3600 python bench.py --suite
run scale 5400 python bench.py --scale
run parity 2400 python bench.py --parity
run stages_1m 1800 python bench.py --stages 1000000
echo "FINAL DONE $(date -u +%H:%M:%S)" >> measurements/r5/driver.log
