#!/bin/bash
# Round-4 TPU work queue, part 4 — restore the live metric caches the
# machine reset wiped (models/ is host-local): re-run the blessed
# protocols through the CURRENT code so `script_create_result_plots.py`
# regenerates from live caches again and the r3-blessed tables are
# re-validated end-to-end. Ordered by value/cost; every stage is
# deadline-guarded (the driver's end-of-round bench must find the TPU
# free).
set -u
cd "$(dirname "$0")/.."
# logs/r5 too: the chained r5b stage tees into logs/r5/queue_b.log
# before r5b's own mkdir runs — on a fresh post-reset host (logs/ is
# gitignored) the outer tee would otherwise fail and SIGPIPE-kill r5b.
mkdir -p logs/r4 logs/r5

DEADLINE=${R4_TPU_DEADLINE:-1787081000}

# Round 5: the bf16-parity + scan-unroll experiments are minutes; the
# restore stages below are hours and may be deadline-cut. Run the short
# ones first (idempotent — r5b skip-checks its parity caches).
if [ -x scripts/tpu_queue_r5b.sh ] || [ -f scripts/tpu_queue_r5b.sh ]; then
  R5_TPU_DEADLINE="$DEADLINE" bash scripts/tpu_queue_r5b.sh \
    2>&1 | tee logs/r5/queue_b.log | tail -5
fi

fits() {
  local need=$1
  if [ $(( $(date +%s) + need )) -ge "$DEADLINE" ]; then
    echo "-- skipping (deadline): needs ${need}s --"
    return 1
  fi
  return 0
}

echo "== 1. dSprites protocol (2 configs x 10 seeds x 15 epochs) =="
fits 2700 && timeout -k 60 2700 python train_image_vae.py -d dsprites \
  -r all --beta 1.0 --num_epochs 15 --skip_cached 2>&1 | tail -3
fits 2700 && timeout -k 60 2700 python train_image_vae.py -d dsprites \
  --beta 4.0 --num_epochs 15 --skip_cached 2>&1 | tail -3

echo "== 2. folk protocol (2 configs x 10 seeds x 30 epochs) =="
fits 2700 && timeout -k 60 2700 python train_measure_vae.py -r all --skip_cached \
  2>&1 | tail -3
fits 2700 && timeout -k 60 2700 python train_measure_vae.py --skip_cached 2>&1 | tail -3

echo "== 3. chorales protocol (2 configs x 10 seeds x 30 epochs) =="
fits 2700 && timeout -k 60 2700 python train_measure_vae.py -d bach \
  -r all --skip_cached 2>&1 | tail -3
fits 2700 && timeout -k 60 2700 python train_measure_vae.py -d bach --skip_cached \
  2>&1 | tail -3

echo "== 4. blessed seed-0 music variants (10 epochs each) =="
for args in "--decoder_type sr" "--decoder_type sr-no-input" \
            "--sampling multinomial"; do
  fits 1200 && timeout -k 60 1200 python train_measure_vae.py --rand 0 \
    -r all --num_epochs 10 $args 2>&1 | tail -3
done

echo "== 4b. retrain the MNIST ResNet judge (20 ep — the blessed budget) =="
# digit_pred_acc needs the judge checkpoint, which the host reset wiped;
# without it stage 5's restored caches would silently skip that metric
# (VERDICT r4 weak #6: restore with ONE judge and say which).
fits 1800 && timeout -k 60 1800 python test_mnist.py --num_epochs 20 \
  2>&1 | tail -3

echo "== 5. Morpho-MNIST protocol (2 configs x 10 seeds x 100 epochs) =="
fits 7200 && timeout -k 60 7200 python train_image_vae.py -d mnist \
  -r all --beta 1.0 --num_epochs 100 --skip_cached 2>&1 | tail -3
fits 7200 && timeout -k 60 7200 python train_image_vae.py -d mnist \
  --beta 4.0 --num_epochs 100 --skip_cached 2>&1 | tail -3

echo "== 6. gamma x delta sweep grid (hyper-as-data) =="
fits 5400 && timeout -k 60 5400 python script_hyper_param_exp.py -d mnist \
  2>&1 | tail -3

echo "== 7. regenerate the paper plots from the restored caches =="
timeout -k 60 1200 python script_create_result_plots.py 2>&1 | tail -5

echo "== queue part 4 complete =="
