#!/bin/bash
# Round-4 queue 14 (session-2 priority 4, fires only if the window
# allows): multi-leg H-major zoo parity + timing on the three fastest
# candidates, then the default autoflip. The full 6-model sweep (queue
# 10b) is round-5 food.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r4_queue_results.log) 2>&1

echo "=== $(date) r4q14 health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r4q14'; exit 1; }

echo "=== $(date) hiw multi-leg zoo: TPU parity + both-path timing (trimmed)"
MODELS=densefuse,vifnet,ifcnn ITERS=3 \
  timeout 5400 python tools/probe_hiw_zoo.py
echo "--- probe_hiw_zoo exit: $?"

echo "=== $(date) r4 multi-leg default autoflip"
timeout 2400 python tools/r4_autoflip_multi.py
echo "--- autoflip_multi exit: $?"
