#!/bin/bash
# Round-4 queue 13 (session-2 priority 3): the train-path byte-reduction
# legs (VERDICT #3), trimmed to the two headline configs. The bs64 and
# 256x256 diagnostics from queue 9 are deferred to round 5.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r4_queue_results.log) 2>&1

echo "=== $(date) r4q13 health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r4q13'; exit 1; }

echo "=== $(date) train bench f32 (reference recipe, current default)"
BENCH_MODE=train timeout 1800 python bench.py
echo "--- exit: $?"

echo "=== $(date) train bench bf16 compute (BENCH_AMP=bf16)"
BENCH_MODE=train BENCH_AMP=bf16 timeout 1800 python bench.py
echo "--- exit: $?"
