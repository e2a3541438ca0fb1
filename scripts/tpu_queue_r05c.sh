#!/bin/bash
# Round-5 TPU queue, wave C: gated on wave B's DONE marker. The reference's
# third regime at reference scale (VERDICT r04 next #6): per-scene finetune
# at 128^3/480x640 warm-started from the stage-2 generalizable checkpoint
# (runs/quality_gen.ckpt, written by the stage-2 run before its evals).
set -u
cd /root/repo
LOG=runs/tpu_queue_r05.log

while [ ! -f runs/WAVE_B_DONE ]; do sleep 20; done
echo "wave C starts $(date)" >> "$LOG"

if [ ! -e runs/quality_gen.ckpt ]; then
  echo "wave C: no stage-2 checkpoint, skipping ft" >> "$LOG"
else
  timeout 7200 python scripts/quality_synthetic.py --phase ft \
    --steps-ft 2000 --dims 128 --hw 480 --w 640 --samples 64 --rays 512 \
    --agg-packed pallas --bf16 --agg-remat save_gathers --mesh-res 192 \
    --out QUALITY_r05_ft.json >> "$LOG" 2>&1
  echo "ft rc=$?" >> "$LOG"
fi

touch runs/WAVE_C_DONE
echo "wave C done $(date)" >> "$LOG"
