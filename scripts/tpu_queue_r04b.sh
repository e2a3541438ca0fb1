#!/bin/bash
# Round-4 TPU queue, wave B: render ray-chunk sweep, reference-recipe
# feasibility (VERDICT item 6), then the quality curriculum (item 2).
# Waits for wave 1 (TRAINBENCH + MFU) to release the chip. ONE TPU job at
# a time.
set -u
cd /root/repo
mkdir -p runs
LOG=runs/tpu_queue_r04.log

until grep -q "WAVE1 DONE" "$LOG" 2>/dev/null; do sleep 20; done

run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- exit=$? $(date +%H:%M:%S)" >> "$LOG"
}

# re-measure the remat-affected stages under the SHIPPED save_gathers
# policy (confs/dtu.yaml changed after wave 1 launched); merges in place
# into MFU_r04.json, leaving the remat-independent rows from the full-remat
# pass untouched
run 1800 python scripts/mfu.py --dims 256 --bf16 --agg-packed pallas \
  --agg-remat save_gathers --stages agg,train_step --out MFU_r04.json

# render plateau attempt (VERDICT item 5): throughput-optimal val chunk.
# bench.py's 1024-ray chunks put only 131k rows through the render-core
# gathers — GATHER_PROBE measured a 2-6x addressing ramp-up below ~256k
# rows, so bigger chunks should amortize it.
run 2400 python scripts/bench_variants.py --rays-sweep 4096,8192 \
  --out runs/rays_sweep_r04.json

# reference-recipe feasibility (VERDICT item 6): the FULL Runner train
# path (epoch loop, ckpt saves, val cycles with image render + mesh
# export) at reference scale — 256^3 cascade, 5 views, 480x640, 512 rays,
# 64+64 samples, pallas+bf16. 24 epochs x 6 scenes = 144 steps with two
# ckpt saves and one full val (mesh at 192^3). Done = no OOM/NaN, ckpts +
# val images + mesh in runs/feasibility_r04/.
run 2700 python -m gens_tpu.main --conf confs/synthetic.yaml --mode train \
  --set \
  base_exp_dir=runs/feasibility_r04 \
  'model.volume.volume_dims=[256,128,64,32,16]' \
  model.volume.packed_bilerp=pallas model.volume.dtype=bfloat16 \
  model.reg_network.dtype=bfloat16 \
  model.sdf_network.volume_dtype=bfloat16 model.sdf_network.mlp_dtype=bfloat16 \
  model.color_network.packed_dtype=bfloat16 \
  model.color_network.mlp_dtype=bfloat16 \
  model.render.n_samples=64 model.render.n_importance=64 \
  'train_dataset.img_hw=[480,640]' train_dataset.num_src_view=4 \
  'val_dataset.img_hw=[480,640]' val_dataset.val_res_level=4 \
  train.epochs=24 train.save_freq=10 train.val_freq=23 \
  train.log_freq=0.25 --mesh_resolution 192
echo "FEASIBILITY DONE $(date +%H:%M:%S)" >> "$LOG"

# quality curriculum stage 1: the r02-proven 64^3/128px recipe (reached
# 0.0185 held-out at 16k steps) as a warm start — the r03 checkpoint this
# round planned to resume from was lost with runs/. skip-eval: this stage
# only feeds stage 2's --resume-from.
run 4500 python scripts/quality_synthetic.py --phase b --steps-b 9000 \
  --dims 64 --hw 128 --samples 32 --rays 512 --agg-packed pallas --bf16 --agg-remat save_gathers \
  --skip-eval --out runs/QUALITY_r04_stage1.json
echo "STAGE1 DONE $(date +%H:%M:%S)" >> "$LOG"

# stage 2: reference scale (128^3 cascade, 480x640, 64+64 samples,
# pallas+bf16) warm-started from stage 1 — 13.3k total optimization steps
# vs r03's 6k cold (the underfit hypothesis, QUALITY.md). Evals (held-out
# sphere + held-out two-sphere union + one trained scene) run at the end
# and merge into QUALITY_r04.json. In-flight ckpt every 1000 steps; a
# re-invoke with lower --steps-b cuts the run short straight to evals.
run 7200 python scripts/quality_synthetic.py --phase b --steps-b 4300 \
  --dims 128 --hw 480 --w 640 --samples 64 --rays 512 \
  --agg-packed pallas --bf16 --agg-remat save_gathers \
  --resume-from runs/quality_gen.ckpt \
  --inflight-every 500 --mesh-res 192 --out QUALITY_r04.json

echo "WAVE2 DONE $(date +%H:%M:%S)" >> "$LOG"
