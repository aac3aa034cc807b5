#!/bin/bash
# Round-4 TPU job queue: runs the recorded-receipt jobs back-to-back once
# the in-flight north-star 2^19 finishes. Each step is timeout-wrapped and
# preceded by a cheap device probe (the tunnel can wedge for ~30+ min after
# an OOM mid-claim; the probe loop waits it out instead of burning a job).
set -u
cd /root/repo

probe() {
  for i in $(seq 1 30); do
    if timeout 300 python -c "import jax, jax.numpy as jnp; x=jnp.ones((8,8)); print(float((x@x).sum()))" >/dev/null 2>&1; then
      return 0
    fi
    echo "[queue] probe $i failed; sleeping 120s" >&2
    sleep 120
  done
  return 1
}

step() {
  local name="$1"; shift
  local tmo="$1"; shift
  echo "[queue] === $name (timeout ${tmo}s) ===" >&2
  probe || { echo "[queue] device unreachable; skipping $name" >&2; return 1; }
  timeout "$tmo" "$@" > "queue_${name}.log" 2>&1
  local rc=$?
  echo "[queue] $name rc=$rc" >&2
  return $rc
}

# wait for the externally-launched northstar 2^19 (pid file optional)
while pgrep -f "northstar_g1.py 19" >/dev/null 2>&1; do sleep 60; done

step northstar20 10800 python scripts/northstar_g1.py 20
step kernels 3600 python scripts/bench_kernels.py 20 120
step heavy_g2 7200 env HEAVY_NUM_IO=16 python scripts/heavy_standard_config.py g2
step bench 3600 python bench.py
echo "[queue] done" >&2
