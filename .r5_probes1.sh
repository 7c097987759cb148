#!/bin/bash
set -u
cd /root/repo
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)" >> measurements/r5/driver.log
  timeout "$tmo" "$@" > "measurements/r5/$name.log" 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S)" >> measurements/r5/driver.log
}
until timeout 180 python -c "import jax; print(jax.devices()[0])" \
      > measurements/r5/up.log 2>&1; do
  echo "tunnel down $(date -u +%H:%M:%S)" >> measurements/r5/driver.log
  sleep 120
done
echo "TUNNEL UP $(date -u +%H:%M:%S)" >> measurements/r5/driver.log
run prims 3600 python .r5_prims.py
run gap2m 3600 python .r5_gap.py
echo "BATCH1 DONE $(date -u +%H:%M:%S)" >> measurements/r5/driver.log
