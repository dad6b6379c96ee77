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
warm() {
  echo "== prewarm: $* =="
  tools/with_tpu.sh env BENCH_HEALTH_MIN_TFLOPS=0 BENCH_REPEATS=1 "$@" \
    python bench.py 2>&1 | tail -1
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
echo "prewarm complete"
