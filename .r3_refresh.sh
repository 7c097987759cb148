#!/bin/bash
# Round-3 measurement refresh: waits for the tunneled TPU to come back,
# then runs the full serial measurement sequence (one TPU process at a
# time, per CLAUDE.md timing rules). Each step logs to /tmp/r3_*.log.
cd /root/repo
probe() {
  timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
}
echo "[$(date +%T)] waiting for TPU..."
until probe; do
  echo "[$(date +%T)] tunnel still down"
  sleep 120
done
echo "[$(date +%T)] TPU is back"

run() { # name, cmd...
  name=$1; shift
  echo "[$(date +%T)] START $name"
  timeout 3000 "$@" > "/tmp/r3_$name.log" 2>&1
  echo "[$(date +%T)] DONE $name rc=$?"
}

run ab_split   python .ab_split.py
run stages_1m  python bench.py --stages 1000000
run stages_2m  python bench.py --stages 2000000
run scale      python bench.py --scale
run suite      python bench.py --suite
run parity     python bench.py --parity
run headline   python bench.py
echo "[$(date +%T)] ALL DONE"
