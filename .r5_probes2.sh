#!/bin/bash
set -u
cd /root/repo
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)" >> measurements/r5/driver.log
  timeout "$tmo" "$@" > "measurements/r5/$name.log" 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S)" >> measurements/r5/driver.log
}
# Wait for batch 1 to finish (driver.log sentinel), then the tunnel.
until grep -q "BATCH1 DONE" measurements/r5/driver.log 2>/dev/null; do sleep 60; done
until timeout 180 python -c "import jax; print(jax.devices()[0])" \
      > measurements/r5/up2.log 2>&1; do
  echo "tunnel down (b2) $(date -u +%H:%M:%S)" >> measurements/r5/driver.log
  sleep 120
done
run setup_attr 3000 python .r5_setup.py
run texwin 3000 python .r5_texwin.py
run stages_2m 2400 python bench.py --stages 2000000
echo "BATCH2 DONE $(date -u +%H:%M:%S)" >> measurements/r5/driver.log
