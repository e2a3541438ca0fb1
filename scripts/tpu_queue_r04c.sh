#!/bin/bash
# Round-4 TPU queue, wave C (final): after the feasibility run releases the
# chip, run the quality curriculum's stage 1 (64^3/128px, the r02-proven
# recipe) for as many steps as the round has left. Its checkpoint is the
# committed warm start for round 5's reference-scale stage 2 (runs/ is
# wiped between rounds, so the stage must land in git).
set -u
cd /root/repo
LOG=runs/tpu_queue_r04.log

FEAS_PID="${1:?usage: tpu_queue_r04c.sh <feasibility_pid>}"
while kill -0 "$FEAS_PID" 2>/dev/null; do sleep 10; done

{
  echo "=== $(date +%H:%M:%S) quality stage 1 (wave C) ==="
  timeout 2100 python scripts/quality_synthetic.py --phase b --steps-b 8000 \
    --dims 64 --hw 128 --samples 32 --rays 512 \
    --agg-packed pallas --bf16 --agg-remat save_gathers \
    --skip-eval --inflight-every 1000 --out runs/QUALITY_r04_stage1.json
  echo "--- exit=$? $(date +%H:%M:%S)"
  echo "WAVEC DONE $(date +%H:%M:%S)"
} >> "$LOG" 2>&1
