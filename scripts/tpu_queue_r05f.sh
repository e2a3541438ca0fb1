#!/bin/bash
# Round-5 TPU queue, wave F: re-run the full-stage MFU (wave B's attempt
# died on a transient remote-compile flake before its single end-of-run
# write; mfu.py now retries per stage and flushes per row).
set -u
cd /root/repo
LOG=runs/tpu_queue_r05.log

while [ ! -f runs/WAVE_E_DONE ]; do sleep 20; done
echo "wave F starts $(date)" >> "$LOG"

timeout 7200 python scripts/mfu.py --bf16 --agg-packed pallas \
  --agg-remat save_gathers_proj --splat-impl kernel2 \
  --stages feature,agg,unet,render,render_infer,train_step \
  --out MFU_r05.json >> "$LOG" 2>&1
echo "mfu(F) rc=$?" >> "$LOG"

touch runs/WAVE_F_DONE
echo "wave F done $(date)" >> "$LOG"
