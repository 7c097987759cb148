#!/bin/bash
# Round-3 measurement battery: runs once the axon tunnel is back.
# Sequential (one-process-at-a-time; CLAUDE.md timing rules), each step
# bounded, logs under /tmp/r3m/.
set -u
mkdir -p /tmp/r3m
cd /root/repo

run() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)" >> /tmp/r3m/driver.log
  timeout "$tmo" "$@" > "/tmp/r3m/$name.log" 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S)" >> /tmp/r3m/driver.log
}

# Wait for the tunnel: a trivial device query must succeed.
until timeout 180 python -c "import jax; print(jax.devices()[0])" \
      > /tmp/r3m/up.log 2>&1; do
  echo "tunnel down $(date -u +%H:%M:%S)" >> /tmp/r3m/driver.log
  sleep 120
done
echo "TUNNEL UP $(date -u +%H:%M:%S)" >> /tmp/r3m/driver.log

# 1. Split-packing A/B (decides PACK_SPLIT default).
run ab_split 2400 python .ab_split.py
# 2. Fused vs XLA setup A/B.
run ab_setup 2400 python .ab_setup.py
# 3. Stage breakdowns at the scale points.
run stages_250k 1200 python bench.py --stages 250000
run stages_1m 1500 python bench.py --stages 1000000
run stages_2m 1800 python bench.py --stages 2000000
# 4. On-chip parity, all five configs (config-5 budget fix validation).
run parity 3600 python bench.py --parity
# 5. Full suite + scaling sweep + headline.
run suite 3600 python bench.py --suite
run scale 3600 python bench.py --scale
run headline 1200 python bench.py
echo "ALL DONE $(date -u +%H:%M:%S)" >> /tmp/r3m/driver.log
# 6. Sort/scatter microbench (appended; runs after the suite).
run probe_sort 1800 python .probe_sort.py
echo "ALL DONE2 $(date -u +%H:%M:%S)" >> /tmp/r3m/driver.log
run ab_compact 2400 python .ab_compact.py
echo "ALL DONE3 $(date -u +%H:%M:%S)" >> /tmp/r3m/driver.log
run probe_setup_blk 2400 python .probe_setup_blk.py
echo "ALL DONE4 $(date -u +%H:%M:%S)" >> /tmp/r3m/driver.log
run ab_budget 2400 python .ab_budget.py
echo "ALL DONE5 $(date -u +%H:%M:%S)" >> /tmp/r3m/driver.log
run ab_tileh 2400 python .ab_tileh.py
echo "ALL DONE6 $(date -u +%H:%M:%S)" >> /tmp/r3m/driver.log
run ab_freshskip 2400 python .ab_freshskip.py
echo "ALL DONE7 $(date -u +%H:%M:%S)" >> /tmp/r3m/driver.log
run probe_gather 2400 python .probe_gather.py
echo "ALL DONE8 $(date -u +%H:%M:%S)" >> /tmp/r3m/driver.log
