#!/bin/bash
set -u
cd /root/repo
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)" >> measurements/r5/driver.log
  timeout "$tmo" "$@" > "measurements/r5/$name.log" 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S)" >> measurements/r5/driver.log
}
until grep -q "BATCH3 DONE" measurements/r5/driver.log 2>/dev/null; do sleep 60; done
until timeout 180 python -c "import jax; print(jax.devices()[0])" \
      > measurements/r5/up4.log 2>&1; do
  echo "tunnel down (b4) $(date -u +%H:%M:%S)" >> measurements/r5/driver.log
  sleep 120
done
run texwin_v2 3000 python .r5_texwin.py
echo "BATCH4 DONE $(date -u +%H:%M:%S)" >> measurements/r5/driver.log
