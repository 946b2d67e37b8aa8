#!/bin/bash
# Round-2 TPU measurement queue (run when the axon tunnel is healthy).
# Sequential to avoid TPU contention; each step bounded by timeout.
set -x
cd /root/repo

# 1) LIO street eval (600 distorted frames)
timeout 4000 python scripts/kitti_eval.py --frames 600 --configs lio \
  --distorted --json docs/kitti_eval_lio.json

# 2) loop closure on the lap circuit
timeout 2400 python scripts/kitti_eval.py --frames 330 --route lap \
  --configs map,loop --json docs/kitti_eval_loop.json

# 3) batched B=8 street sequences (per-sequence ATE)
timeout 4000 python scripts/kitti_eval.py --frames 600 --configs batch \
  --batch 8 --json docs/kitti_eval_batch.json

# 3b) km-scale distorted tour (map + LIO)
timeout 6000 python scripts/kitti_eval.py --frames 2000 --blocks 7 \
  --distorted --configs map,lio --json docs/kitti_eval_2km_distorted.json

# 4) bench modes
timeout 1800 python bench.py 2> docs/bench_16ring.stderr
MSF_BENCH_RINGS=64 timeout 1800 python bench.py 2> docs/bench_64ring.stderr
MSF_BENCH_LIO=1 timeout 1800 python bench.py 2> docs/bench_lio.stderr
MSF_BENCH_BATCHED=1 timeout 1800 python bench.py 2> docs/bench_batched.stderr
echo DONE
