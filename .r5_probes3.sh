#!/bin/bash
set -u
cd /root/repo
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)" >> measurements/r5/driver.log
  timeout "$tmo" "$@" > "measurements/r5/$name.log" 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S)" >> measurements/r5/driver.log
}
until grep -q "BATCH2 DONE" measurements/r5/driver.log 2>/dev/null; do sleep 60; done
until timeout 180 python -c "import jax; print(jax.devices()[0])" \
      > measurements/r5/up3.log 2>&1; do
  echo "tunnel down (b3) $(date -u +%H:%M:%S)" >> measurements/r5/driver.log
  sleep 120
done
run rot 3000 python .r5_rot.py
run blk 3600 python .r5_blk.py
echo "BATCH3 DONE $(date -u +%H:%M:%S)" >> measurements/r5/driver.log
