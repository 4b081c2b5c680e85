#!/bin/bash
# Round-5 TPU follow-up, part d (runs after tpu_queue_r5c.sh drains):
# finish the gamma x delta sweep restore. The r4d stage-6 run lost
# cells 22-35 to an uncaught per-cell failure at gamma=5, delta=100
# (traceback discarded by that stage's tail -3); the sweep is now
# per-cell fault-isolated, the partial cell dir was deleted, and this
# retry skips the finished cells via their checkpoints. Full output is
# preserved (no tail truncation).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r5
AUDIT=logs/r5/audit.log
DEADLINE=${R5_TPU_DEADLINE:?set R5_TPU_DEADLINE (unix seconds)}

note() { echo "$(date +%s) $*" | tee -a "$AUDIT"; }

if [ $(( $(date +%s) + 2100 )) -ge "$DEADLINE" ]; then
  note "SKIP-DEADLINE sweep-retry (needs 2100s)"
  exit 0
fi
note "START sweep-retry"
timeout -k 60 2100 python script_hyper_param_exp.py -d mnist \
  > logs/r5/sweep_retry.out 2>&1
rc=$?
grep -a "CELL-FAILED\|saved " logs/r5/sweep_retry.out | tail -5
if [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ]; then
  note "KILLED-TIMEOUT sweep-retry"
elif [ "$rc" -ne 0 ]; then
  note "FAILED rc=$rc sweep-retry"
else
  note "OK sweep-retry"
fi
note "QUEUE-R5D-COMPLETE"
