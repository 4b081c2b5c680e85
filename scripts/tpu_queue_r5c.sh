#!/bin/bash
# Round-5 TPU follow-up queue (runs after tpu_queue_r5.sh drains):
#   1. the fused B=2048 batch-curve cell (measured in r5 but lost to the
#      old runner's tail-3 truncation)
#   2. scan-unroll probe on the IMAGE headline (music gained +4.1%;
#      decides the framework default)
#   3. one bench.py preview with the adopted music unroll=4, so the
#      driver's end-of-round bench isn't the first run of the new path
# Runner fix vs r5: the full per-tag output is preserved under
# logs/r5/<tag>.out — only the console view is tailed. ONE TPU process
# at a time; deadline-guarded like every queue.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r5
AUDIT=logs/r5/audit.log
DEADLINE=${R5_TPU_DEADLINE:?set R5_TPU_DEADLINE (unix seconds)}

note() { echo "$(date +%s) $*" | tee -a "$AUDIT"; }

run_budget() {
  local need=$1 tag=$2; shift 2
  if [ $(( $(date +%s) + need )) -ge "$DEADLINE" ]; then
    note "SKIP-DEADLINE $tag (needs ${need}s)"
    return 1
  fi
  note "START $tag"
  timeout -k 60 "$need" "$@" > "logs/r5/${tag}.out" 2>&1
  local rc=$?
  tail -3 "logs/r5/${tag}.out"
  if [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ]; then
    note "KILLED-TIMEOUT $tag (budget ${need}s)"
  elif [ "$rc" -ne 0 ]; then
    note "FAILED rc=$rc $tag"
  else
    note "OK $tag"
  fi
  return "$rc"
}

# Budgets are realistic runtimes (measured this round: ~5-10 min each),
# not conservative caps — an oversized `need` makes the deadline guard
# skip stages that would in fact fit. Highest-value first: the preview
# exercises the exact code path the driver's end-of-round bench runs.
run_budget 1200 bench-preview python bench.py
run_budget 1200 image-unroll python scripts/bench_image_unroll.py
run_budget 900 curve-2048-fused python scripts/bench_batch_curve.py \
  --batches 2048 --fused-only

# Restore the two GLSR blessed-table rows (the r4d queue covers every
# other wiped cache family, but not GLSR — VERDICT r4 weak #1): the
# reference-default gamma=1 row (collapses by design, 10 ep) and the
# blessed gamma=1e-3 row (30 ep). Same invocations as
# scripts/glsr_gamma_sweep.py.
run_budget 900 glsr-gamma1 python train_measure_vae.py --glsr \
  -r rhy_complexity --gamma 1.0 --num_epochs 10 --rand 0
run_budget 1200 glsr-gamma1e-3 python train_measure_vae.py --glsr \
  -r rhy_complexity --gamma 0.001 --num_epochs 30 --rand 0

note "QUEUE-R5C-COMPLETE"
