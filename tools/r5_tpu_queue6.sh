#!/bin/bash
# Round-5 queue 6 (VERDICT #7): the amp bf16 convergence leg (12-epoch
# f32-vs-bf16 reference recipe) and its autoflip. The sedrfuse/myfusion
# re-bench that used to lead this queue moved to r5_tpu_queue4b.sh so it
# lands before the long heavy-tail queue 5.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r5_queue_results.log) 2>&1

echo "=== $(date) r5q6 health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r5q6'; exit 1; }

echo "=== $(date) amp bf16 convergence leg (12-epoch reference recipe)"
timeout 5400 python tools/probe_amp_convergence.py
echo "--- probe_amp_convergence exit: $?"

echo "=== $(date) r5 amp default autoflip"
timeout 3600 python tools/r5_autoflip_amp.py
echo "--- autoflip_amp exit: $?"
