#!/bin/bash
# Round-5 TPU queue, part b — runs AFTER tpu_queue_r5.sh drains:
#   1. bf16 convergence parity (VERDICT r4 item 3, second half): the
#      dSprites short protocol, AR config, 3 seeds, f32 vs bf16, each
#      arm in its OWN models dir so the blessed caches can't be touched.
#   2. scan-unroll composition experiment (VERDICT r4 item 8): 2/4
#      train steps inlined per scan iteration vs the unroll=1 control,
#      on the MeasureVAE hot step.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r5 runs_r5

DEADLINE=${R5_TPU_DEADLINE:?set R5_TPU_DEADLINE (unix seconds)}
AUDIT=logs/r5/audit.log

note() { echo "$(date +%s) $*" | tee -a "$AUDIT"; }

fits() {
  if [ $(( $(date +%s) + $1 )) -ge "$DEADLINE" ]; then
    note "SKIP-DEADLINE $2 (needs $1s)"; return 1
  fi
  return 0
}

run_budget() {
  local need=$1 tag=$2; shift 2
  fits "$need" "$tag" || return 1
  note "START $tag"
  timeout -k 60 "$need" "$@" 2>&1 | tail -3
  local rc=${PIPESTATUS[0]}
  if [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ]; then note "KILLED-TIMEOUT $tag"
  elif [ "$rc" -ne 0 ]; then note "FAILED rc=$rc $tag"
  else note "OK $tag"; fi
  return "$rc"
}

echo "== 1. bf16 convergence parity (dSprites --short, AR, 3 seeds) =="
for s in 0 1 2; do
  [ -f "runs_r5/parity_f32/DspritesVAE_r_${s}_b_1.0_g_10.0_d_1.0_all_/results_dict.json" ] || \
  run_budget 1200 "parity-f32-s$s" env ARVAE_MODELS_DIR=runs_r5/parity_f32 \
    python train_image_vae.py -d dsprites --short -r all --beta 1.0 \
    --num_epochs 15 --rand "$s"
  [ -f "runs_r5/parity_bf16/DspritesVAE_r_${s}_b_1.0_g_10.0_d_1.0_all_/results_dict.json" ] || \
  run_budget 1200 "parity-bf16-s$s" env ARVAE_MODELS_DIR=runs_r5/parity_bf16 \
    python train_image_vae.py -d dsprites --short -r all --beta 1.0 \
    --num_epochs 15 --rand "$s" --bf16
done
# Only (re)write the parity report when BOTH arms are complete — a
# deadline-cut run must not clobber a previous complete report with one
# computed from partial dirs (e.g. 2 f32 seeds vs 0 bf16 seeds).
parity_ok=1
for s in 0 1 2; do
  for arm in f32 bf16; do
    [ -f "runs_r5/parity_${arm}/DspritesVAE_r_${s}_b_1.0_g_10.0_d_1.0_all_/results_dict.json" ] \
      || parity_ok=0
  done
done
if [ "$parity_ok" -eq 1 ]; then
  python scripts/compare_parity.py runs_r5/parity_f32 runs_r5/parity_bf16 \
    | tee logs/r5/bf16_parity.json
else
  note "SKIP-PARITY-REPORT (incomplete arms; bf16_parity.json untouched)"
fi

echo "== 2. scan-unroll composition experiment (MeasureVAE step) =="
# skip-check per cell: r4d re-runs this queue on every restore resume,
# and duplicate appended rows would double-count in any aggregation
for u in 1 2 4; do
  grep -qs "OK unroll-$u\$" logs/r5/unroll.jsonl \
    && { note "SKIP-CACHED unroll-$u"; continue; }
  run_budget 1500 "unroll-$u" python scripts/bench_measure_vae.py \
    --unroll "$u" | tee -a logs/r5/unroll.jsonl
done

echo "== queue r5b complete =="
note "QUEUE-R5B-COMPLETE"
