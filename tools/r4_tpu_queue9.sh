#!/bin/bash
# Round-4 queue 9: train-step byte-reduction measurements (VERDICT item
# #3). The queue-6 breakdown proved the f32 step runs at 96% of its HBM
# byte roofline (docs/PERFORMANCE.md round-4 train section); these legs
# measure the byte-reduction levers end to end.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r4_queue_results.log) 2>&1

echo "=== $(date) r4q9 health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r4q9'; exit 1; }

echo "=== $(date) train bench f32 (reference recipe, current default)"
BENCH_MODE=train timeout 2400 python bench.py
echo "--- exit: $?"

echo "=== $(date) train bench bf16 compute (BENCH_AMP=bf16)"
BENCH_MODE=train BENCH_AMP=bf16 timeout 2400 python bench.py
echo "--- exit: $?"

echo "=== $(date) train breakdown at bs64 (batch-scaling diagnostic)"
BENCH_BATCH=64 timeout 2400 python tools/profile_train_step.py
echo "--- exit: $?"

echo "=== $(date) train bench bf16 at 256x256 bs4 (bigger-shape check)"
BENCH_MODE=train BENCH_AMP=bf16 BENCH_BATCH=4 BENCH_PATCH=256 \
  timeout 3000 python bench.py
echo "--- exit: $?"
