#!/bin/bash
# Background TPU health watcher (round 5).
#
# The round-4 verdict's #1 demand: fire tools/capture_healthy.sh the moment
# the device probe clears threshold. The tunnel wedges and recovers on its
# own schedule (DEVICE_HEALTH_r04.json), so a human-in-the-loop poll wastes
# the healthy window. This watcher probes every PROBE_INTERVAL_S (default
# 900 s — gentle, per the recovery protocol: recovery needs idle time) and
# runs the full capture at the FIRST healthy reading. Every probe is
# appended to DEVICE_HEALTH_r05.jsonl so the round's health timeline is a
# recorded artifact either way.
#
# Usage: tools/health_watch.sh [max_hours]   (from anywhere; backgroundable)
set -u
cd "$(dirname "$0")/.."
MAX_HOURS=${1:-7}
INTERVAL=${PROBE_INTERVAL_S:-900}
# Fire threshold ≈ bench.py's own gate (35 % of v5e peak ~197 TF/s,
# bioem_tpu/runtime/health.py:threshold_tflops). Hardcoded for v5e on
# purpose: computing it exactly needs a device attach, which this watcher
# must never do outside the probe. A premature fire on a different chip
# kind is harmless — bench re-gates itself and the watcher keeps looping.
THRESH=${CAPTURE_MIN_TFLOPS:-69}
LOG=DEVICE_HEALTH_r05.jsonl
DEADLINE=$(( $(date +%s) + MAX_HOURS*3600 ))

note() { # tflops-or-null, note
  printf '{"utc": "%s", "tflops": %s, "note": "%s"}\n' \
    "$(date -u +%Y-%m-%dT%H:%M)" "$1" "$2" >> "$LOG"
}

note null "health_watch start (threshold ${THRESH} TF/s, interval ${INTERVAL}s)"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  OUT=$(timeout 300 tools/with_tpu.sh python tools/tpu_health.py 2>&1)
  RC=$?
  TF=$(printf '%s' "$OUT" | grep -o '[0-9.]* TF/s' | head -1 | grep -o '[0-9.]*')
  if [ $RC -ne 0 ] || [ -z "${TF:-}" ]; then
    note null "probe failed rc=$RC (wedged or hung)"
  else
    note "$TF" "watcher probe"
    # Degraded but responsive: pre-compile every capture config
    # (compiles are host-side and unaffected by device-side degradation)
    # so the eventual healthy window is spent measuring, not compiling.
    # Capped at 4 attempts — a flapping tunnel makes each attempt slow
    # and the watcher must not spend its life prewarming instead of
    # probing; after any attempt, re-probe IMMEDIATELY (no 15-min sleep)
    # in case a healthy window opened meanwhile.
    if [ "${TF%.*}" -lt "$THRESH" ] 2>/dev/null && [ ! -e /tmp/bioem_prewarmed ]; then
      TRIES=$(cat /tmp/bioem_prewarm_tries 2>/dev/null || echo 0)
      if [ "$TRIES" -lt 4 ]; then
        echo $((TRIES + 1)) > /tmp/bioem_prewarm_tries
        note "$TF" "degraded but responsive - running prewarm_cache.sh (attempt $((TRIES + 1)))"
        tools/prewarm_cache.sh > /tmp/prewarm.log 2>&1 \
          && touch /tmp/bioem_prewarmed \
          && note null "prewarm complete"
        continue
      fi
    fi
    # Integer compare on the floor of TF.
    if [ "${TF%.*}" -ge "$THRESH" ] 2>/dev/null; then
      note "$TF" "HEALTHY - firing capture_healthy.sh"
      tools/capture_healthy.sh > /tmp/capture_healthy.log 2>&1
      CRC=$?
      note null "capture_healthy.sh exited rc=$CRC (log /tmp/capture_healthy.log)"
      if [ $CRC -eq 0 ]; then
        note null "capture COMPLETE"
        exit 0
      fi
      # Mid-capture degradation: keep watching for the next window.
    fi
  fi
  sleep "$INTERVAL"
done
note null "health_watch deadline reached without a completed capture"
exit 2
