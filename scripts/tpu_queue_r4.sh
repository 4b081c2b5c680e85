#!/bin/bash
# Round-4 TPU work queue — run serially the moment the tunnel returns
# (ONE TPU process at a time; this script is the only TPU user while it
# runs). Logs under logs/r4/. Ordered so the round artifact (bench)
# lands first and long protocol runs come later.
#
# Every stage is deadline-guarded: near the end of the round the DRIVER
# runs bench.py on the same single chip, and two concurrent TPU
# processes deadlock each other — so the queue refuses to start a stage
# it can't finish before R4_TPU_DEADLINE (epoch seconds).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r4

DEADLINE=${R4_TPU_DEADLINE:-1787059000}

fits() {  # fits <seconds-needed> — true if the stage fits the deadline
  local need=$1
  if [ $(( $(date +%s) + need )) -ge "$DEADLINE" ]; then
    echo "-- skipping (deadline): needs ${need}s --"
    return 1
  fi
  return 0
}

echo "== 1. bench (round artifact; validates the r3/r4 bench fixes) =="
# Budget must exceed bench's own worst case: probe retries (up to
# 1020 s) + 1500 s headline watchdog + 900 s secondary watchdog.
fits 4200 && timeout -k 60 4200 python bench.py 2> logs/r4/bench.stderr \
  | tee logs/r4/bench.json

echo "== 2. batch-size curve (VERDICT item 4) =="
fits 3600 && timeout -k 60 3600 python scripts/bench_batch_curve.py \
  2> logs/r4/curve.stderr | tee logs/r4/batch_curve.jsonl

echo "== 2b. launch-merge ceiling (VERDICT item 9) =="
fits 1800 && timeout -k 60 1800 python scripts/bench_launch_merge.py \
  2> logs/r4/merge.stderr | tee logs/r4/launch_merge.json

echo "== 3. GLSR gamma sweep (VERDICT item 6) =="
fits 14400 && timeout -k 60 14400 python scripts/glsr_gamma_sweep.py 2>&1 \
  | tee logs/r4/glsr_sweep.log

echo "== 4. judge accuracy vs budget (VERDICT item 8) =="
fits 10800 && timeout -k 60 10800 python scripts/judge_budget_sweep.py 2>&1 \
  | tee logs/r4/judge_budget.log

echo "== 5. fader 100-epoch x 10-seed protocol (VERDICT item 3) =="
for d in mnist dsprites; do
  for s in 0 1 2 3 4 5 6 7 8 9; do
    fits 3600 || break 2
    echo "-- fader $d seed $s --"
    timeout -k 60 3600 python train_image_fader.py -d "$d" --num_epochs 100 \
      --rand "$s" 2>&1 | tail -5 | tee -a logs/r4/fader_${d}.log
  done
done

echo "== 5b. regenerate tester figs (binned-MI interpretability probe) =="
fits 3600 && timeout -k 60 3600 python scripts/run_tester_sweep.py --glsr 2>&1 \
  | tee logs/r4/tester_sweep.log

echo "== 6. aggregate the fader protocol (mean ± std for RESULTS.md) =="
python scripts/aggregate_results.py \
  "models/MnistFader_r_*_b_4.0_" "models/DspritesFader_r_*_b_4.0_" \
  2>&1 | tee logs/r4/fader_agg.txt

echo "== queue complete =="
