#!/bin/bash
# Serial TPU measurement queue for round 3 — ONE TPU job at a time (the
# tunneled chip hangs under concurrent clients). Each entry is a separate
# process under `timeout`; results land in runs/ as JSON parts that
# scripts/merge_trainbench.py folds into TRAINBENCH_r03.json.
set -u
cd /root/repo
mkdir -p runs
LOG=runs/tpu_queue_r03.log
: > "$LOG"

run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 4200 "$@" >> "$LOG" 2>&1
  echo "--- exit=$? $(date +%H:%M:%S)" >> "$LOG"
}

TB="python scripts/bench_train.py --modes packed --iters 8"

# 1. headline: 256^3, pallas splat backward + bf16 everywhere
run $TB --dims 256 --agg-packed pallas --bf16 --out runs/tb_256_pallas_bf16.json
# 2. ablation: same bf16 everywhere, scatter ("table") backward
run $TB --dims 256 --agg-packed table --bf16 --out runs/tb_256_table_bf16all.json
# 3. anchor: 256^3 table f32 (supersedes the stale TRAINBENCH_r02 number)
run $TB --dims 256 --agg-packed table --out runs/tb_256_table_f32.json
# 4. confirm the config.py 715 ms/step claim at 128^3 f32
run $TB --dims 128 --agg-packed table --out runs/tb_128_table_f32.json
# 5. render reconciliation (round-2 weak #6): identical config through
#    plain jit (bench.py path) and 1-device shard_map, at bench.py's 1024
#    rays and SCALING_r02's 2048 rays
run python scripts/bench_scaling.py --devices 1 --compare-plain
run python scripts/bench_scaling.py --devices 1 --compare-plain --rays_per_device 2048

# 9. warm the render cache / fresh headline render number
run python bench.py

echo "QUEUE DONE $(date +%H:%M:%S)" >> "$LOG"
