#!/bin/bash
# Round-5 TPU queue, wave H: sharpen leg 2 with the FORCED inv_s ramp.
# Leg 1 (var-LR x8, QUALITY_r05_sharpen.json) showed the learned variance
# scalar follows the loss gradient DOWN at short step counts (27.9 ->
# 15.5) even as held-out sphere accuracy improved 40%; several NeuS
# descendants schedule sharpness instead of learning it. This leg
# projects inv_s up a log-linear 16 -> 80 ramp over +2500 steps from the
# sharpened checkpoint (restored from the leg-1 inflight).
set -u
cd /root/repo
LOG=runs/tpu_queue_r05.log
while [ ! -f runs/WAVE_G_DONE ]; do sleep 20; done
echo "wave H starts $(date)" >> "$LOG"
rm -rf runs/quality_gen_inflight_128.ckpt
timeout 5400 python scripts/quality_synthetic.py --phase b --steps-b 2500 \
  --dims 128 --hw 480 --w 640 --samples 64 --rays 512 \
  --agg-packed pallas --bf16 --agg-remat save_gathers \
  --resume-from runs/quality_gen.ckpt --inv-s-ramp 16:80 \
  --inflight-every 500 --mesh-res 192 \
  --out QUALITY_r05_sharpen2.json >> "$LOG" 2>&1
echo "sharpen2(ramp) rc=$?" >> "$LOG"
touch runs/WAVE_H_DONE
echo "wave H done $(date)" >> "$LOG"
