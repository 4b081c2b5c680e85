#!/bin/bash
# Round-4 TPU work queue, part 5 — finish the fader reference protocol
# (VERDICT item 3's blessing) after the second machine reset wiped the
# host-local run artifacts, then re-warm the bench path. ONE TPU
# process at a time; every stage deadline-guarded so the driver's
# end-of-round bench finds the chip free.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r4

DEADLINE=${R4_TPU_DEADLINE:?set R4_TPU_DEADLINE (unix seconds)}

fits() {  # fits <seconds-needed>
  local need=$1
  if [ $(( $(date +%s) + need )) -ge "$DEADLINE" ]; then
    echo "-- skipping (deadline): needs ${need}s --"
    return 1
  fi
  return 0
}

echo "== 1. fader MNIST seeds 1-9 (100 epochs, warm cache) =="
for s in 1 2 3 4 5 6 7 8 9; do
  fits 900 || break
  echo "-- fader mnist seed $s --"
  timeout -k 60 900 python train_image_fader.py -d mnist \
    --num_epochs 100 --rand "$s" 2>&1 | tail -3 \
    | tee -a logs/r4/fader_mnist.log
done

echo "== 2. bench re-run (warms the driver's end-of-round path) =="
fits 1200 && timeout -k 60 1200 python bench.py \
  2> logs/r4/bench_rerun.stderr | tee logs/r4/bench_rerun.json

echo "== 3. fader dSprites seeds (full grid, 100 epochs) =="
for s in 0 1 2 3 4 5 6 7 8 9; do
  fits 1800 || break
  echo "-- fader dsprites seed $s --"
  timeout -k 60 1800 python train_image_fader.py -d dsprites \
    --num_epochs 100 --rand "$s" 2>&1 | tail -3 \
    | tee -a logs/r4/fader_dsprites.log
done

echo "== 4. aggregate whatever landed =="
# --epochs 100 gates on the protocol stamp inside results_dict.json:
# without it, the seed-0 dir (never trained by the loop above, but
# written by any 1-epoch smoke of train_image_fader.py) silently
# contaminates the blessed 100-epoch mean±std (ADVICE r4).
python scripts/aggregate_results.py --epochs 100 \
  "models/MnistFader_r_*_b_4.0_" "models/DspritesFader_r_*_b_4.0_" \
  2>&1 | tee logs/r4/fader_agg.txt

echo "== queue part 5 complete =="
