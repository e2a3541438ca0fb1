#!/bin/bash
# Round-5 TPU queue, wave A: gated on the stage-2 quality run's EXACT PID
# (one chip job at a time; ADVICE r04: gate every wave on the PID or a
# DONE marker, never assume). Runs the two probes the verdict asked for:
#   1. splat kernel under shard_map on a 1x1 TPU mesh  (VERDICT #3)
#   2. aggregation backward stage-split + kernel variants (VERDICT #2)
set -u
cd /root/repo
LOG=runs/tpu_queue_r05.log
PIDFILE=runs/quality_r05_stage2.pid

if [ -f "$PIDFILE" ]; then
  PID=$(grep -o '[0-9]*' "$PIDFILE" | head -1)
  echo "waiting on stage-2 pid $PID" >> "$LOG"
  while kill -0 "$PID" 2>/dev/null; do sleep 20; done
fi
echo "stage-2 done; wave A starts $(date)" >> "$LOG"

timeout 2400 python scripts/splat_shardmap_tpu.py \
  --out SPLAT_SHARDMAP_r05.json >> "$LOG" 2>&1
echo "splat_shardmap rc=$?" >> "$LOG"

timeout 3600 python scripts/agg_bwd_split.py \
  --out runs/AGG_SPLIT_r05.json >> "$LOG" 2>&1
echo "agg_bwd_split rc=$?" >> "$LOG"

touch runs/WAVE_A_DONE
echo "wave A done $(date)" >> "$LOG"
