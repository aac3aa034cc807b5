#!/bin/bash
# Waits for the 2^20 north-star run (exact PID) and appends its result line
# to BASELINE.md so the number lands in the tracked artifact even if the
# interactive session ends first. Append-only; never rewrites history.
set -u
cd /root/repo
PID="$1"
LOG="$2"
while kill -0 "$PID" 2>/dev/null; do sleep 20; done
{
  echo ""
  echo "### North star 2^20 (round-4 continuation, $(date -u +%FT%TZ))"
  echo ""
  if grep -q '"metric"' "$LOG"; then
    echo "G1ExpAir num_io=2048 (1048576 x 404) on the real chip — completed:"
    echo ""
    echo '```json'
    grep '"metric"' "$LOG" | tail -1
    echo '```'
  else
    echo "Run exited WITHOUT a result record; last log lines:"
    echo ""
    echo '```'
    tail -5 "$LOG"
    echo '```'
  fi
} >> BASELINE.md
