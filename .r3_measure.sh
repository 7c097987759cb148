#!/bin/bash
# Round-3 measurement battery: runs once the axon tunnel is back.
# Sequential (one-process-at-a-time; CLAUDE.md timing rules), each step
# bounded, logs under /tmp/r3m/.
#
# DECISION PROBES ONLY — suite/scale/parity/headline run afterwards,
# once the probe winners are applied as defaults (benching them before
# the decisions would record stale-default numbers).
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

# Flag-default deciders, cheapest/highest-leverage first.
run ab_split 2400 python .ab_split.py
run ab_compact 2400 python .ab_compact.py
run ab_budget 2400 python .ab_budget.py
run ab_freshskip 2400 python .ab_freshskip.py
run ab_tileh 2400 python .ab_tileh.py
run probe_setup_blk 2400 python .probe_setup_blk.py
run ab_setup 2400 python .ab_setup.py
run probe_gather 2400 python .probe_gather.py
run probe_sort 1800 python .probe_sort.py
echo "PROBES DONE $(date -u +%H:%M:%S)" >> /tmp/r3m/driver.log
# Stage attribution at the scale points (current defaults; re-run the
# interesting ones after decisions).
run stages_250k 1200 python bench.py --stages 250000
run stages_1m 1500 python bench.py --stages 1000000
run stages_2m 1800 python bench.py --stages 2000000
echo "ALL DONE $(date -u +%H:%M:%S)" >> /tmp/r3m/driver.log
run ab_fold 2400 python .ab_fold.py
echo "FOLD DONE $(date -u +%H:%M:%S)" >> /tmp/r3m/driver.log
run ab_setup_packed 2400 python .ab_setup_packed.py
echo "SETUP_PACKED DONE $(date -u +%H:%M:%S)" >> /tmp/r3m/driver.log
