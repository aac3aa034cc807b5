#!/bin/bash
# Second-wave TPU queue: waits for the first queue (kernels/heavy_g2/bench)
# to drain, then retries the 2^20 north star with the streamed host aux
# build, records a warm 2^19 prove, and validates mesh-Pallas on a
# 1-device TPU mesh.
set -u
cd /root/repo

probe() {
  for i in $(seq 1 40); do
    if timeout 300 python -c "import jax, jax.numpy as jnp; x=jnp.ones((8,8)); print(float((x@x).sum()))" >/dev/null 2>&1; then
      return 0
    fi
    echo "[queue2] probe $i failed; sleeping 120s" >&2
    sleep 120
  done
  return 1
}

step() {
  local name="$1"; shift
  local tmo="$1"; shift
  echo "[queue2] === $name (timeout ${tmo}s) ===" >&2
  probe || { echo "[queue2] device unreachable; skipping $name" >&2; return 1; }
  timeout "$tmo" "$@" > "queue_${name}.log" 2>&1
  local rc=$?
  echo "[queue2] $name rc=$rc" >&2
  return $rc
}

while pgrep -f "tpu_queue.sh" | grep -qv $$; do sleep 60; done

step northstar20_retry 10800 python scripts/northstar_g1.py 20
step northstar19_warm 7200 env NORTHSTAR_PROVES=2 python scripts/northstar_g1.py 19
step mesh_pallas 3600 env STARKY_MESH_PALLAS=1 python scripts/mesh_pallas_chip.py
echo "[queue2] done" >&2
