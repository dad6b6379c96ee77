#!/bin/bash
# Pre-compile every config tools/capture_healthy.sh will measure.
#
# Compilation is host-side and unaffected by the device-throughput
# degradation; the JAX compile cache persists across processes. Running
# this on a SICK device (health gate bypassed, 1 repeat, results
# discarded) means the healthy-window capture spends its minutes
# measuring instead of compiling.
set -u
cd "$(dirname "$0")/.."
FAILED=0
warm() {
  echo "== prewarm: $* =="
  local out rc
  out=$(tools/with_tpu.sh env BENCH_HEALTH_MIN_TFLOPS=0 BENCH_REPEATS=1 "$@" \
    python bench.py 2>&1)
  rc=$?
  printf '%s\n' "$out" | tail -1
  # A refused (wedged-tunnel) or failed warm must fail the script: the
  # caller (health_watch.sh) marks prewarm done only on full success —
  # round-5 incident: 4/5 warms were refused mid-recovery and the flag
  # file suppressed the retry.
  [ $rc -ne 0 ] && FAILED=1
}
warm BIOEM_TPU_AUTOTUNE=0 BIOEM_TPU_ORIENT_BLOCK=16 BIOEM_TPU_FUSED_LSE=1 \
  BIOEM_TPU_FUSED_BATCHED=0 BIOEM_TPU_PALLAS_IMG_TILE=64
warm BIOEM_TPU_AUTOTUNE=0 BIOEM_TPU_ORIENT_BLOCK=16 BIOEM_TPU_FUSED_LSE=1 \
  BIOEM_TPU_FUSED_BATCHED=1 BIOEM_TPU_PALLAS_IMG_TILE=64
warm BIOEM_TPU_AUTOTUNE=0 BIOEM_TPU_ORIENT_BLOCK=16 BIOEM_TPU_FUSED_LSE=1 \
  BIOEM_TPU_FUSED_BATCHED=1 BIOEM_TPU_PALLAS_IMG_TILE=32
warm BIOEM_TPU_AUTOTUNE=0 BIOEM_TPU_ORIENT_BLOCK=8 BIOEM_TPU_FUSED_LSE=1 \
  BIOEM_TPU_FUSED_BATCHED=1 BIOEM_TPU_PALLAS_IMG_TILE=64
warm BIOEM_TPU_AUTOTUNE=0 BIOEM_TPU_ORIENT_BLOCK=16 BIOEM_TPU_FUSED_LSE=0 \
  BIOEM_TPU_PALLAS_IMG_TILE=64
if [ "$FAILED" -ne 0 ]; then
  echo "prewarm INCOMPLETE (some configs refused/failed)"
  exit 1
fi
echo "prewarm complete"
