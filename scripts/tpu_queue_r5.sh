#!/bin/bash
# Round-5 TPU work queue — VERDICT r4 items 1-4 + 7, ordered by
# value/cost:
#   0. finish the fader MNIST reference protocol (seeds 8,9 → 10 seeds)
#   1. fader dSprites reference protocol (100 ep x 10 seeds, full grid)
#   2. protocol-gated aggregation of both fader tables
#   3. bf16 decision + batch-curve attribution + image MFU curve
#   4. restore the wiped live metric caches (chain r4d) + plots
# ONE TPU process at a time; deadline-guarded. Skip checks gate on the
# protocol stamp inside results_dict.json, not mere file existence — a
# smoke run's cache must not suppress (or contaminate) a blessed
# protocol run (ADVICE r4). Timeout kills and deadline skips are logged
# per seed so the blessed seed count is auditable (ADVICE r4, low).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r5

DEADLINE=${R5_TPU_DEADLINE:?set R5_TPU_DEADLINE (unix seconds)}
AUDIT=logs/r5/audit.log

note() { echo "$(date +%s) $*" | tee -a "$AUDIT"; }

fits() {
  local need=$1 what=$2
  if [ $(( $(date +%s) + need )) -ge "$DEADLINE" ]; then
    note "SKIP-DEADLINE $what (needs ${need}s)"
    return 1
  fi
  return 0
}

# has_proto <run_dir> <epochs>: cache exists AND its stamped protocol
# trained for <epochs> epochs (retro-stamped legacy caches qualify).
has_proto() {
  python - "$1" "$2" <<'EOF'
import json, os, sys
d, ep = sys.argv[1], int(sys.argv[2])
try:
    p = json.load(open(os.path.join(d, "results_dict.json"))).get("protocol") or {}
except Exception:
    sys.exit(1)
sys.exit(0 if p.get("num_epochs") == ep else 1)
EOF
}

# run_budget <seconds> <tag> <cmd...>: deadline-check, run under
# timeout, log timeouts (rc=124/137) distinctly from other failures.
# FULL stdout/stderr are preserved per tag under logs/r5/<tag>.{out,stderr}
# — the former '2>&1 | tail -3' form truncated multi-line JSON outputs
# (it cost the fused B=2048 cell and the image-curve B=128 row) and
# merged JAX stderr warnings into data files tee'd by callers.
run_budget() {
  local need=$1 tag=$2; shift 2
  fits "$need" "$tag" || return 1
  note "START $tag"
  timeout -k 60 "$need" "$@" \
    > "logs/r5/${tag}.out" 2> "logs/r5/${tag}.stderr"
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

echo "== 0. fader MNIST seeds to 10 (100 epochs) =="
for s in 8 9; do
  has_proto "models/MnistFader_r_${s}_b_4.0_" 100 && { note "SKIP-CACHED mnist-fader-s$s"; continue; }
  run_budget 1500 "mnist-fader-s$s" \
    python train_image_fader.py -d mnist --num_epochs 100 --rand "$s" \
    | tee -a logs/r5/fader_mnist.log
done

echo "== 1. fader dSprites seeds (full grid, 100 epochs) =="
for s in 0 1 2 3 4 5 6 7 8 9; do
  has_proto "models/DspritesFader_r_${s}_b_4.0_" 100 && { note "SKIP-CACHED dsprites-fader-s$s"; continue; }
  run_budget 2400 "dsprites-fader-s$s" \
    python train_image_fader.py -d dsprites --num_epochs 100 --rand "$s" \
    | tee -a logs/r5/fader_dsprites.log
done

echo "== 2. protocol-gated aggregation =="
python scripts/aggregate_results.py --epochs 100 \
  "models/MnistFader_r_*_b_4.0_" "models/DspritesFader_r_*_b_4.0_" \
  2>&1 | tee logs/r5/fader_agg.txt

echo "== 3. perf attribution (VERDICT r4 items 3, 4, 7) =="
# full JSON outputs land in logs/r5/<tag>.out via run_budget
run_budget 2400 bf16-bench python scripts/bench_bf16.py
run_budget 2400 curve-noreg python scripts/bench_batch_curve.py \
  --batches 256,512,1024 --fused-only --ablate noreg
run_budget 3600 curve-large python scripts/bench_batch_curve.py \
  --batches 2048,4096
run_budget 3000 image-curve python scripts/bench_image_curve.py

echo "== 4. restore live metric caches (full protocols) =="
R4_TPU_DEADLINE="$DEADLINE" bash scripts/tpu_queue_r4d.sh \
  2>&1 | tee logs/r5/restore.log | tail -40

echo "== queue r5 complete =="
note "QUEUE-COMPLETE"
