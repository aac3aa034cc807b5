#!/bin/bash
# Round-5 wave C2 (post-OOM retry): waits out the wedged tunnel, then
# mesh-Pallas validation, the 2^20 north-star RETRY (glibc-trim hygiene +
# MALLOC_ARENA_MAX=2 + RSS heartbeat; compile cache warm from the killed
# attempt), the final bench (Pallas keccak kernel hardware validation),
# then the heavy-family records.
set -u
cd /root/repo

probe() {
  for i in $(seq 1 60); do
    if timeout 240 python -c "import jax, jax.numpy as jnp; x=jnp.ones((8,8)); print(float((x@x).sum()))" >/dev/null 2>&1; then
      return 0
    fi
    echo "[queue5b] probe $i failed; sleeping 60s" >&2
    sleep 60
  done
  return 1
}

step() {
  local name="$1"; shift
  local tmo="$1"; shift
  echo "[queue5b] === $name (timeout ${tmo}s) $(date -u +%T) ===" >&2
  probe || { echo "[queue5b] device unreachable; skipping $name" >&2; return 1; }
  timeout "$tmo" "$@" > "queue_${name}.log" 2>&1
  local rc=$?
  echo "[queue5b] $name rc=$rc $(date -u +%T)" >&2
  return $rc
}

step mesh_pallas_r5 2400 env STARKY_MESH_PALLAS=1 python scripts/mesh_pallas_chip.py

step northstar20_r5b 7000 env STARKY_MERKLE_HASH=keccak NORTHSTAR_PROVES=2 \
  MALLOC_ARENA_MAX=2 python scripts/northstar_g1.py 20 &
NS_BG=$!
sleep 10
NS_PID=$(pgrep -f "northstar_g1.py 20" | head -1 || true)
if [ -n "${NS_PID:-}" ]; then
  bash scripts/northstar_watch.sh "$NS_PID" queue_northstar20_r5b.log &
fi
wait "$NS_BG"

step bench_r5e 1500 env STARKY_BENCH_TOTAL_S=1200 python bench.py
step heavy_g2_warm_r5 4200 env HEAVY_NUM_IO=16 python scripts/heavy_standard_config.py g2
step heavy_fq12_r5 5400 env HEAVY_NUM_IO=16 python scripts/heavy_standard_config.py fq12
echo "[queue5b] done $(date -u +%T)" >&2
