#!/bin/bash
# Round-5 TPU work queue — the TPU-gated items still open at the end of
# round 4, ordered by value/cost:
#   1. finish the fader dSprites reference protocol (100 ep x 10 seeds;
#      the mnist half landed in round 4 — see RESULTS.md fader table)
#   2. the batch-curve attribution runs that round 4's reset swallowed
#      (noreg ablation + large-B sliced curve + bf16 comparison)
#   3. restore the wiped live metric caches at full protocol so
#      script_create_result_plots.py regenerates with zero misses
# ONE TPU process at a time; deadline-guarded.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r5

DEADLINE=${R5_TPU_DEADLINE:?set R5_TPU_DEADLINE (unix seconds)}

fits() {
  local need=$1
  if [ $(( $(date +%s) + need )) -ge "$DEADLINE" ]; then
    echo "-- skipping (deadline): needs ${need}s --"
    return 1
  fi
  return 0
}

echo "== 1. fader dSprites seeds (full grid, 100 epochs) =="
for s in 0 1 2 3 4 5 6 7 8 9; do
  [ -f "models/DspritesFader_r_${s}_b_4.0_/results_dict.json" ] && continue
  fits 1800 || break
  echo "-- fader dsprites seed $s --"
  timeout -k 60 1800 python train_image_fader.py -d dsprites \
    --num_epochs 100 --rand "$s" 2>&1 | tail -3 \
    | tee -a logs/r5/fader_dsprites.log
done
python scripts/aggregate_results.py "models/DspritesFader_r_*_b_4.0_" \
  2>&1 | tee logs/r5/fader_agg.txt

echo "== 2. batch-curve attribution (VERDICT r3 item 4 leftovers) =="
fits 2400 && timeout -k 60 2400 python scripts/bench_batch_curve.py \
  --batches 256,512,1024 --fused-only --ablate noreg \
  2> logs/r5/curve_noreg.stderr | tee logs/r5/batch_curve_noreg.jsonl
fits 3600 && timeout -k 60 3600 python scripts/bench_batch_curve.py \
  --batches 2048,4096 \
  2> logs/r5/curve_large.stderr | tee logs/r5/batch_curve_large.jsonl
fits 2400 && timeout -k 60 2400 python scripts/bench_bf16.py \
  2> logs/r5/bf16.stderr | tee logs/r5/bf16.json

echo "== 3. restore live metric caches (full protocols) =="
R4_TPU_DEADLINE="$DEADLINE" bash scripts/tpu_queue_r4d.sh

echo "== queue r5 complete =="
