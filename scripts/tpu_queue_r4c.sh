#!/bin/bash
# Round-4 TPU work queue, part 3 — the batch-curve attribution runs
# for VERDICT item 4, chained after tpu_queue_r4b.sh completes.
#
# (a) Re-measure the sliced fused path at B=2048/4096: the first
#     attempt hit an HTTP 500 in the backend's remote compile helper
#     (logs/r4/batch_curve_sliced.jsonl) — full tracebacks now land in
#     stderr. If B=2048 still fails at 2 slices, retry at 4 (512-row
#     slices) via ARVAE_FUSED_MAX_BATCH.
# (b) --ablate noreg over B in {256,512,1024}: if the ~10% per-sample
#     dip at B=1024 disappears without the O(B^2) pairwise AR-reg
#     term, the dip is the quadratic reg cost, not the kernel.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r4

DEADLINE=${R4_TPU_DEADLINE:-1787081000}

fits() {
  local need=$1
  if [ $(( $(date +%s) + need )) -ge "$DEADLINE" ]; then
    echo "-- skipping (deadline): needs ${need}s --"
    return 1
  fi
  return 0
}

echo "== 1. sliced fused curve at large B (retry of the HTTP 500) =="
fits 3600 && timeout -k 60 3600 python scripts/bench_batch_curve.py \
  --batches 2048,4096 \
  2> logs/r4/curve_large.stderr | tee logs/r4/batch_curve_large.jsonl

if grep -q '"error"' logs/r4/batch_curve_large.jsonl 2>/dev/null; then
  echo "== 1b. retry at 512-row slices =="
  fits 2400 && ARVAE_FUSED_MAX_BATCH=512 timeout -k 60 2400 \
    python scripts/bench_batch_curve.py --batches 2048,4096 --fused-only \
    2> logs/r4/curve_large512.stderr \
    | tee logs/r4/batch_curve_large512.jsonl
fi

echo "== 2. noreg ablation curve (B=1024 dip attribution) =="
fits 2400 && timeout -k 60 2400 python scripts/bench_batch_curve.py \
  --batches 256,512,1024 --fused-only --ablate noreg \
  2> logs/r4/curve_noreg.stderr | tee logs/r4/batch_curve_noreg.jsonl

echo "== 3. f32 vs bf16 image-step throughput =="
fits 2400 && timeout -k 60 2400 python scripts/bench_bf16.py \
  2> logs/r4/bf16.stderr | tee logs/r4/bf16.json

echo "== queue part 3 complete =="
