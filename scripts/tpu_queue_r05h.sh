#!/bin/bash
# Round-5 TPU queue, wave H (adaptive): a SECOND sharpen leg, run only if
# wave D's first leg moved held-out accuracy (< 0.040 vs the 0.0424
# stage-2 floor). Warm-starts from runs/quality_gen.ckpt, which wave D's
# sharpen overwrites with its result.
set -u
cd /root/repo
LOG=runs/tpu_queue_r05.log
while [ ! -f runs/WAVE_G_DONE ]; do sleep 20; done
echo "wave H starts $(date)" >> "$LOG"

GO=$(python - <<'EOF2'
import json
try:
    d = json.load(open("QUALITY_r05_sharpen.json"))
    print("yes" if d.get("heldout_acc_mean", 1.0) < 0.040 else "no")
except Exception:
    print("no")
EOF2
)
echo "wave H go=$GO" >> "$LOG"
if [ "$GO" = "yes" ]; then
  rm -rf runs/quality_gen_inflight_128.ckpt
  timeout 5400 python scripts/quality_synthetic.py --phase b --steps-b 2500 \
    --dims 128 --hw 480 --w 640 --samples 64 --rays 512 \
    --agg-packed pallas --bf16 --agg-remat save_gathers \
    --resume-from runs/quality_gen.ckpt --var-lr-mult 8 \
    --inflight-every 500 --mesh-res 192 \
    --out QUALITY_r05_sharpen2.json >> "$LOG" 2>&1
  echo "sharpen2 rc=$?" >> "$LOG"
fi
touch runs/WAVE_H_DONE
echo "wave H done $(date)" >> "$LOG"
