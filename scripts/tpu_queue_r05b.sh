#!/bin/bash
# Round-5 TPU queue, wave B: gated on wave A's DONE marker (never on an
# assumption — ADVICE r04). Re-measures the roofline + train bench at the
# WINNING splat impl from wave A's stage-split, then bench.py (the r05
# warm-build-readback fix needs one on-chip validation).
set -u
cd /root/repo
LOG=runs/tpu_queue_r05.log

while [ ! -f runs/WAVE_A_DONE ]; do sleep 20; done
echo "wave B starts $(date)" >> "$LOG"

BEST=$(python - <<'EOF'
import json
try:
    d = json.load(open("runs/AGG_SPLIT_r05.json"))["stages"]
    rows = {k.split("agg_fwdbwd_")[1]: v["ms"] for k, v in d.items()
            if k.startswith("agg_fwdbwd_") and "ms" in v}
    print(min(rows, key=rows.get) if rows else "kernel")
except Exception:
    print("kernel")
EOF
)
echo "wave B splat impl: $BEST" >> "$LOG"

# full-stage roofline at the shipped config + the winning impl
timeout 5400 python scripts/mfu.py --bf16 --agg-packed pallas \
  --agg-remat save_gathers --splat-impl "$BEST" \
  --stages feature,agg,unet,render,render_infer,train_step \
  --out MFU_r05.json >> "$LOG" 2>&1
echo "mfu rc=$?" >> "$LOG"

timeout 3600 python scripts/bench_train.py --bf16 --agg-packed pallas \
  --agg-remat save_gathers --splat-impl "$BEST" --modes packed \
  --out TRAINBENCH_r05.json >> "$LOG" 2>&1
echo "bench_train rc=$?" >> "$LOG"

timeout 2400 python bench.py >> "$LOG" 2>&1
echo "bench rc=$?" >> "$LOG"

touch runs/WAVE_B_DONE
echo "wave B done $(date)" >> "$LOG"
