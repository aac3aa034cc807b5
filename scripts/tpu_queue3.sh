#!/bin/bash
# Third-wave TPU queue: re-record bench with the gather/pipeline fixes,
# warm G2 phase table, and the fq12 family on the chip.
set -u
cd /root/repo

probe() {
  for i in $(seq 1 40); do
    if timeout 300 python -c "import jax, jax.numpy as jnp; x=jnp.ones((8,8)); print(float((x@x).sum()))" >/dev/null 2>&1; then
      return 0
    fi
    echo "[queue3] probe $i failed; sleeping 120s" >&2
    sleep 120
  done
  return 1
}

step() {
  local name="$1"; shift
  local tmo="$1"; shift
  echo "[queue3] === $name (timeout ${tmo}s) ===" >&2
  probe || { echo "[queue3] device unreachable; skipping $name" >&2; return 1; }
  timeout "$tmo" "$@" > "queue_${name}.log" 2>&1
  local rc=$?
  echo "[queue3] $name rc=$rc" >&2
  return $rc
}

while pgrep -f "tpu_queue2.sh" | grep -qv $$; do sleep 60; done

step bench2 3600 python bench.py
step heavy_g2_warm 5400 env HEAVY_NUM_IO=16 python scripts/heavy_standard_config.py g2
step heavy_fq12 7200 env HEAVY_NUM_IO=16 python scripts/heavy_standard_config.py fq12
echo "[queue3] done" >&2
