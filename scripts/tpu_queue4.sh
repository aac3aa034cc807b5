#!/bin/bash
# Fourth-wave TPU queue (round 4 continuation): runs strictly AFTER the
# 2^20 north-star prove exits (waits on its exact PID, never probes the
# chip while it is working), then re-records bench with the
# gather-restriction + device-prefetch pipeline fixes, the warm G2 phase
# table, and the fq12 family on the chip.
set -u
cd /root/repo

NORTHSTAR_PID="${1:-}"

if [ -n "$NORTHSTAR_PID" ]; then
  echo "[queue4] waiting for northstar pid $NORTHSTAR_PID" >&2
  while kill -0 "$NORTHSTAR_PID" 2>/dev/null; do sleep 30; done
  echo "[queue4] northstar exited" >&2
fi

probe() {
  for i in $(seq 1 40); do
    if timeout 300 python -c "import jax, jax.numpy as jnp; x=jnp.ones((8,8)); print(float((x@x).sum()))" >/dev/null 2>&1; then
      return 0
    fi
    echo "[queue4] probe $i failed; sleeping 120s" >&2
    sleep 120
  done
  return 1
}

step() {
  local name="$1"; shift
  local tmo="$1"; shift
  echo "[queue4] === $name (timeout ${tmo}s) ===" >&2
  probe || { echo "[queue4] device unreachable; skipping $name" >&2; return 1; }
  timeout "$tmo" "$@" > "queue_${name}.log" 2>&1
  local rc=$?
  echo "[queue4] $name rc=$rc" >&2
  return $rc
}

step bench4 3600 python bench.py
step heavy_g2_warm 5400 env HEAVY_NUM_IO=16 python scripts/heavy_standard_config.py g2
step heavy_fq12 7200 env HEAVY_NUM_IO=16 python scripts/heavy_standard_config.py fq12
echo "[queue4] done" >&2
