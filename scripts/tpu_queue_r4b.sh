#!/bin/bash
# Round-4 TPU work queue, part 2 — the stages tpu_queue_r4.sh did not
# reach before the session restart killed it (bench ✓ 2997 steps/s,
# batch curve ✓, GLSR gamma sweep ✓ — see logs/r4/).
#
# ONE TPU process at a time; deadline-guarded like part 1 so the
# driver's end-of-round bench can't collide with a straggler stage.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r4

DEADLINE=${R4_TPU_DEADLINE:-1787081000}

fits() {  # fits <seconds-needed> — true if the stage fits the deadline
  local need=$1
  if [ $(( $(date +%s) + need )) -ge "$DEADLINE" ]; then
    echo "-- skipping (deadline): needs ${need}s --"
    return 1
  fi
  return 0
}

echo "== 1. launch-merge ceiling (VERDICT item 9; import fixed) =="
fits 1800 && timeout 1800 python scripts/bench_launch_merge.py \
  2> logs/r4/merge.stderr | tee logs/r4/launch_merge.json

echo "== 2. batch curve with the batch-sliced fused kernel (item 4) =="
fits 4800 && timeout 4800 python scripts/bench_batch_curve.py \
  --batches 256,512,1024,2048,4096 \
  2> logs/r4/curve_sliced.stderr | tee logs/r4/batch_curve_sliced.jsonl

echo "== 3. judge accuracy vs budget (VERDICT item 8) =="
fits 10800 && timeout 10800 python scripts/judge_budget_sweep.py 2>&1 \
  | tee logs/r4/judge_budget.log

echo "== 4. fader 100-epoch x 10-seed protocol (VERDICT item 3) =="
for d in mnist dsprites; do
  for s in 0 1 2 3 4 5 6 7 8 9; do
    fits 3600 || break 2
    echo "-- fader $d seed $s --"
    timeout 3600 python train_image_fader.py -d "$d" --num_epochs 100 \
      --rand "$s" 2>&1 | tail -5 | tee -a logs/r4/fader_${d}.log
  done
done

echo "== 5. regenerate GLSR tester figs on the non-degenerate run =="
fits 3600 && timeout 3600 python scripts/run_tester_sweep.py --glsr 2>&1 \
  | tee logs/r4/tester_sweep_glsr.log

echo "== 6. aggregate the fader protocol (mean ± std for RESULTS.md) =="
python scripts/aggregate_results.py \
  "models/MnistFader_r_*_b_4.0_" "models/DspritesFader_r_*_b_4.0_" \
  2>&1 | tee logs/r4/fader_agg.txt

echo "== queue complete =="
