#!/bin/bash
# Round-4 TPU measurement queue. ONE TPU job at a time; run only after the
# quality run (runs/quality_r04.log) has released the chip.
set -u
cd /root/repo
mkdir -p runs
LOG=runs/tpu_queue_r04.log
: > "$LOG"

run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 4200 "$@" >> "$LOG" 2>&1
  echo "--- exit=$? $(date +%H:%M:%S)" >> "$LOG"
}

# 1. TRAINBENCH anchor: the shipped default (pallas + bf16) at 256^3 with
#    the round-4 corrected window bound (VERDICT item 3 needs the before/
#    after; r03 anchor was 2187 ms with the old windows)
run python scripts/bench_train.py --modes packed --iters 8 --dims 256 \
  --agg-packed pallas --bf16 --out runs/tb_256_pallas_bf16_r04.json

# 1b. A/B the save_gathers remat policy (skips the backward's supercell
#     re-gather at ~1.5 GB extra residents) at the same config
run python scripts/bench_train.py --modes packed --iters 8 --dims 256 \
  --agg-packed pallas --bf16 --agg-remat save_gathers \
  --out runs/tb_256_pallas_bf16_savegathers_r04.json

# 2. MFU / roofline at the DEFAULT config (VERDICT item 3: r03's artifact
#    was measured with agg_packed=table; the shipped default is pallas)
run python scripts/mfu.py --dims 256 --bf16 --agg-packed pallas \
  --out MFU_r04.json

# 3. render plateau (VERDICT item 5a): ray-chunk sweep — populations below
#    ~256k gather rows pay a 2-6x addressing ramp-up (GATHER_PROBE), and
#    bench.py's 1024-ray chunks sit at 131k render-core rows
run python scripts/bench_variants.py --rays-sweep 1024,2048,4096,8192 \
  --out runs/rays_sweep_r04.json

# 3b. fused single-gather ONLY in the hierarchical-sampling probes (the
#     tiny-population regime the round-3 everywhere-fused A/B conflated)
run python scripts/bench_variants.py \
  --variants baseline_r02,fused_sampling_only \
  --out runs/fused_sampling_ab_r04.json

# 4. fresh headline render number + warm compile cache for the driver's
#    round-end bench.py run
run python bench.py

# 5. reference-recipe feasibility (VERDICT item 6): the FULL Runner train
#    path (not the benched step fn) at reference scale — synthetic data,
#    256^3 cascade, 5 views, 480x640, 512 rays, 64+64 samples, pallas+bf16,
#    multi-epoch with checkpoint + val cycles (val renders images + exports
#    a mesh). Done = N steps, no OOM/NaN, meshes + ckpts in
#    runs/feasibility_r04/.
run python -m gens_tpu.main --conf confs/synthetic.yaml --mode train --set \
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
  train.epochs=40 train.save_freq=10 train.val_freq=20 \
  train.log_freq=0.25 --mesh_resolution 192

# 6. 256^3 quality evidence (cheap variant of VERDICT item 2's "ideally
#    one 256^3 run"): one-shot held-out evaluation of the 22k-step
#    checkpoint with the volume cascade REBUILT at 256^3 (networks are
#    resolution-independent; no 256^3 training time required)
run python scripts/quality_synthetic.py --phase eval --steps-b 16000 \
  --hw 480 --w 640 --dims 256 --samples 64 --bf16 --agg-packed pallas \
  --mesh-res 256 --out QUALITY_r04_256.json

echo "QUEUE R04 DONE $(date +%H:%M:%S)" >> "$LOG"
