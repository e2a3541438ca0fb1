#!/bin/bash
# Round-5 TPU queue, wave I (final): per-scene finetune from the BEST
# generalizable checkpoint of the round (whatever wave H left in
# runs/quality_gen.ckpt — its phase-b rewrites it post-training), then
# the full dryrun determinism matrix (variant B initializes the TPU
# client, so it must own the chip — last in the queue by design).
set -u
cd /root/repo
LOG=runs/tpu_queue_r05.log
while [ ! -f runs/WAVE_H_DONE ]; do sleep 20; done
echo "wave I starts $(date)" >> "$LOG"

timeout 4800 python scripts/quality_synthetic.py --phase ft \
  --steps-ft 2000 --dims 128 --hw 480 --w 640 --samples 64 --rays 512 \
  --agg-packed pallas --bf16 --agg-remat save_gathers --mesh-res 192 \
  --out QUALITY_r05_ft2.json >> "$LOG" 2>&1
echo "ft2 rc=$?" >> "$LOG"

bash scripts/check_dryrun_multichip.sh MULTICHIP_MATRIX_r05.json \
  >> "$LOG" 2>&1
echo "matrix rc=$?" >> "$LOG"

touch runs/WAVE_I_DONE
echo "wave I done $(date)" >> "$LOG"
