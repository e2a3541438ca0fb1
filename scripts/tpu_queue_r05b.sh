#!/bin/bash
# Round-5 TPU queue, wave B: gated on wave A's DONE marker (never on an
# assumption — ADVICE r04). Re-measures the roofline + train bench at the
# WINNING (splat impl, remat) combo from wave A's stage-split, then
# bench.py (the r05 warm-build-readback fix needs one on-chip validation).
set -u
cd /root/repo
LOG=runs/tpu_queue_r05.log

while [ ! -f runs/WAVE_A_DONE ]; do sleep 20; done
echo "wave B starts $(date)" >> "$LOG"

read -r BEST_IMPL BEST_REMAT <<< "$(python - <<'EOF'
import json
impl, remat = "kernel", "save_gathers"
try:
    d = json.load(open("runs/AGG_SPLIT_r05.json"))["stages"]
    rows = {k[len("agg_fwdbwd_"):]: v["ms"] for k, v in d.items()
            if k.startswith("agg_fwdbwd_") and "ms" in v}
    if rows:
        best = min(rows, key=rows.get)
        impl = best.split("@")[0]
        remat = best.split("@")[1] if "@" in best else "save_gathers"
except Exception:
    pass
print(impl, remat)
EOF
)"
echo "wave B splat impl: $BEST_IMPL remat: $BEST_REMAT" >> "$LOG"

# full-stage roofline at the shipped config + the winning combo
timeout 5400 python scripts/mfu.py --bf16 --agg-packed pallas \
  --agg-remat "$BEST_REMAT" --splat-impl "$BEST_IMPL" \
  --stages feature,agg,unet,render,render_infer,train_step \
  --out MFU_r05.json >> "$LOG" 2>&1
echo "mfu rc=$?" >> "$LOG"

timeout 3600 python scripts/bench_train.py --bf16 --agg-packed pallas \
  --agg-remat "$BEST_REMAT" --splat-impl "$BEST_IMPL" --modes packed \
  --out TRAINBENCH_r05.json >> "$LOG" 2>&1
echo "bench_train rc=$?" >> "$LOG"

timeout 2400 python bench.py >> "$LOG" 2>&1
echo "bench rc=$?" >> "$LOG"

touch runs/WAVE_B_DONE
echo "wave B done $(date)" >> "$LOG"
