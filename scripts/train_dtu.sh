#!/bin/bash
# DTU generalizable training (parity with reference scripts/run.sh).
# On a multi-chip host, data/view parallelism is configured via
# parallel.data / parallel.view in the config.
python -m gens_tpu.main --conf confs/dtu.yaml --mode train "$@"
