#!/bin/bash
# Round-5 TPU queue, wave E: revalidate the shard_map-on-TPU program at
# the NEW "auto" resolution (kernel2 promoted after wave A's measurement)
# — shipping a new default backward without this run would recreate the
# exact never-traced-under-shard_map seam wave A closed for v1.
set -u
cd /root/repo
LOG=runs/tpu_queue_r05.log

while [ ! -f runs/WAVE_D_DONE ]; do sleep 20; done
echo "wave E starts $(date)" >> "$LOG"

timeout 2400 python scripts/splat_shardmap_tpu.py \
  --out SPLAT_SHARDMAP_r05.json >> "$LOG" 2>&1
echo "splat_shardmap(kernel2) rc=$?" >> "$LOG"

touch runs/WAVE_E_DONE
echo "wave E done $(date)" >> "$LOG"
