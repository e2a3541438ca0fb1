#!/bin/bash
# Round-5 TPU queue, wave G: bench.py with the honest scalar fence on BOTH
# build timings (block_until_ready acks early on this tunnel, so wave B's
# run showed cold 40 s / warm 461 s — the cold build's real work drained
# inside the warm timer).
set -u
cd /root/repo
LOG=runs/tpu_queue_r05.log
while [ ! -f runs/WAVE_F_DONE ]; do sleep 20; done
echo "wave G starts $(date)" >> "$LOG"
timeout 3600 python bench.py >> "$LOG" 2>&1
echo "bench(G) rc=$?" >> "$LOG"
touch runs/WAVE_G_DONE
echo "wave G done $(date)" >> "$LOG"
