#!/bin/bash
# Per-scene fine-tuning over the 15 test scans x ref views {23, 43}
# (parity with reference scripts/finetune.sh).
# usage: scripts/finetune_dtu.sh CKPT
CKPT=$1
for scene in scan24 scan37 scan40 scan55 scan63 scan65 scan69 scan83 \
             scan97 scan105 scan106 scan110 scan114 scan118 scan122; do
  for view in 23 43; do
    python -m gens_tpu.main --conf confs/dtu_finetune.yaml --mode finetune \
        --resume "$CKPT" --scene "$scene" --ref_view "$view"
  done
done
