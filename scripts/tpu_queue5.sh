#!/bin/bash
# Round-5 chip queue, wave C: the 2^20 north star (keccak Merkle config,
# warm re-prove included), then the heavy-family records and the mesh-Pallas
# hardware validation. Steps are serialized on the single chip; each probes
# the device first and logs to queue_<name>.log.
set -u
cd /root/repo

probe() {
  for i in $(seq 1 30); do
    if timeout 300 python -c "import jax, jax.numpy as jnp; x=jnp.ones((8,8)); print(float((x@x).sum()))" >/dev/null 2>&1; then
      return 0
    fi
    echo "[queue5] probe $i failed; sleeping 90s" >&2
    sleep 90
  done
  return 1
}

step() {
  local name="$1"; shift
  local tmo="$1"; shift
  echo "[queue5] === $name (timeout ${tmo}s) $(date -u +%T) ===" >&2
  probe || { echo "[queue5] device unreachable; skipping $name" >&2; return 1; }
  timeout "$tmo" "$@" > "queue_${name}.log" 2>&1
  local rc=$?
  echo "[queue5] $name rc=$rc $(date -u +%T)" >&2
  return $rc
}

# 1. North star: 2^20 rows, keccak Merkle hash, warm re-prove (PROVES=2).
#    The watcher appends the result to BASELINE.md whether it lands or not.
step northstar20_r5 12000 env STARKY_MERKLE_HASH=keccak NORTHSTAR_PROVES=2 \
  python scripts/northstar_g1.py 20 &
NS_BG=$!
sleep 5
NS_PID=$(pgrep -f "northstar_g1.py 20" | head -1 || true)
if [ -n "${NS_PID:-}" ]; then
  bash scripts/northstar_watch.sh "$NS_PID" queue_northstar20_r5.log &
fi
wait "$NS_BG"

# 2. Mesh-Pallas on the real chip (VERDICT r4 item 5; quick, run first)
step mesh_pallas_r5 3600 env STARKY_MESH_PALLAS=1 python scripts/mesh_pallas_chip.py

# 3. Warm G2 phase table at reference scale (VERDICT r4 item 6a)
step heavy_g2_warm_r5 5400 env HEAVY_NUM_IO=16 python scripts/heavy_standard_config.py g2

# 4. First Fq12 TPU prove (VERDICT r4 item 6b)
step heavy_fq12_r5 7200 env HEAVY_NUM_IO=16 python scripts/heavy_standard_config.py fq12

echo "[queue5] done $(date -u +%T)" >&2
