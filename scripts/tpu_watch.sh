#!/bin/bash
# Watch the axon TPU tunnel; when it becomes healthy, run the round-2
# measurement queue (scripts/tpu_eval_queue.sh) once and exit.
# Probe = enumerate devices + run one tiny computation, bounded by timeout.
cd /root/repo
for i in $(seq 1 60); do
  echo "[tpu_watch] probe $i at $(date -u +%H:%M:%S)"
  if timeout 300 python -u -c "
import jax, jax.numpy as jnp
d = jax.devices()
print('devices:', d)
assert d and d[0].platform != 'cpu', d
x = jnp.ones((128, 128))
print('matmul ok:', float((x @ x).sum()))
"; then
    echo "[tpu_watch] tunnel healthy — running eval queue"
    bash scripts/tpu_eval_queue.sh
    echo "[tpu_watch] queue done"
    exit 0
  fi
  sleep 600
done
echo "[tpu_watch] gave up after 60 probes"
exit 1
