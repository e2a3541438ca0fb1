#!/bin/bash
# Round-3 TPU measurement queue, wave C (after the splat-kernel Mosaic fix;
# waves A/B superseded). ONE TPU job at a time. Results land in runs/ and
# merge into TRAINBENCH_r03.json via scripts/merge_trainbench.py.
set -u
cd /root/repo
mkdir -p runs
LOG=runs/tpu_queue_r03c.log
: > "$LOG"

run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 4200 "$@" >> "$LOG" 2>&1
  echo "--- exit=$? $(date +%H:%M:%S)" >> "$LOG"
}

TB="python scripts/bench_train.py --modes packed --iters 8"

# anchor: 256^3 table f32 (supersedes the stale TRAINBENCH_r02 number)
run $TB --dims 256 --agg-packed table --out runs/tb_256_table_f32.json
# confirm the config.py 715 ms/step claim at 128^3 f32
run $TB --dims 128 --agg-packed table --out runs/tb_128_table_f32.json
# 128^3 fast config (sizes the quality run)
run $TB --dims 128 --agg-packed pallas --bf16 --out runs/tb_128_pallas_bf16.json
# render reconciliation (round-2 weak #6): identical config through
# plain jit (bench.py path) and 1-device shard_map
run python scripts/bench_scaling.py --devices 1 --compare-plain
run python scripts/bench_scaling.py --devices 1 --compare-plain --rays_per_device 2048
# fresh headline render number
run python bench.py
# throughput-optimal val chunk (GATHER_PROBE ramp-up hypothesis)
run python scripts/bench_variants.py --rays-sweep 1024,2048,4096,8192 --out runs/rays_sweep.json

echo "QUEUE C DONE $(date +%H:%M:%S)" >> "$LOG"
# stage attribution with the pallas backward (where did the remaining
# agg-bwd milliseconds go — remat re-gather vs splat)
run python scripts/mfu.py --dims 256 --bf16 --agg-packed pallas --stages agg,train_step --out runs/mfu_agg_pallas.json
echo "QUEUE C2 DONE $(date +%H:%M:%S)" >> "$LOG"
