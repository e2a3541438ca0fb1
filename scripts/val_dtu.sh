#!/bin/bash
# Inference over the DTU test split -> meshes + renders.
# usage: scripts/val_dtu.sh CKPT [extra args]
CKPT=$1; shift
python -m gens_tpu.main --conf confs/dtu.yaml --mode val --resume "$CKPT" "$@"
