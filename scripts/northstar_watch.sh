#!/bin/bash
# Waits for a north-star run and appends its result line to BASELINE.md so
# the number lands in the tracked artifact even if the interactive session
# ends first. Robust against PID reuse (verifies the PID's command line,
# ADVICE r4) and idempotent (a per-log marker prevents duplicate sections
# when the watcher is started twice for the same run).
set -u
cd /root/repo
PID="$1"
LOG="$2"
MARK="<!-- northstar-watch:$(basename "$LOG") -->"

if grep -qF "$MARK" BASELINE.md 2>/dev/null; then
  echo "[watch] $LOG already recorded; exiting" >&2
  exit 0
fi

# wait while the PID is alive AND still the northstar process (PID reuse by
# an unrelated long-lived process must not wedge the watcher forever)
while kill -0 "$PID" 2>/dev/null \
    && ps -p "$PID" -o args= 2>/dev/null | grep -q "northstar_g1"; do
  sleep 20
done

if grep -qF "$MARK" BASELINE.md 2>/dev/null; then
  exit 0
fi

{
  echo ""
  echo "$MARK"
  echo "### North star ($(basename "$LOG"), $(date -u +%FT%TZ))"
  echo ""
  if grep -q '"metric"' "$LOG"; then
    echo "Completed on the real chip:"
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
