#!/bin/bash
# Optional second-wave TPU measurements (run after tpu_queue_r03.sh and the
# quality run, if round time remains).
set -u
cd /root/repo
mkdir -p runs
LOG=runs/tpu_queue_r03b.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 4200 "$@" >> "$LOG" 2>&1
  echo "--- exit=$? $(date +%H:%M:%S)" >> "$LOG"
}
TB="python scripts/bench_train.py --modes packed --iters 8"
# gather-dtype effect alone: table_bf16 (f32 model, bf16 table reads)
run $TB --dims 256 --agg-packed table_bf16 --out runs/tb_256_tablebf16.json
# 128^3 fast config
run $TB --dims 128 --agg-packed pallas --bf16 --out runs/tb_128_pallas_bf16.json
# 192^3 (the verdict's 128/192/256 ladder)
run $TB --dims 192 --agg-packed pallas --bf16 --out runs/tb_192_pallas_bf16.json
# MFU stage attribution with the pallas backward
run python scripts/mfu.py --dims 256 --bf16 --agg-packed pallas --stages agg --out runs/mfu_agg_pallas.json
echo "QUEUE B DONE $(date +%H:%M:%S)" >> "$LOG"
