#!/bin/bash
# Round-4 queue 6: heavy-tail tiled redo AFTER the conv_tlane_dma
# VMEM-guard fix (over-budget wide layers now take the XLA conv instead
# of failing Mosaic's scoped limit) and with t2 ladder rungs + one
# retry on the stochastic remote-compile HTTP 500s that ate 8 of 10
# tiled legs in queue 4. Explicit model args force reruns.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r4_queue_results.log) 2>&1

echo "=== $(date) r4q6 health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r4q6'; exit 1; }

echo "=== $(date) train-step component breakdown (item #3 roofline data)"
timeout 2400 python tools/profile_train_step.py
echo "--- train profile exit: $?"

echo "=== $(date) int8 acceptance harness (SSIM/Qabf <= 1e-3 budget; retry post dtype fix)"
timeout 3600 python tools/int8_acceptance.py
echo "--- int8 acceptance exit: $?"

echo "=== $(date) sedrfuse hot-op probe (subpixel deconv, s2d stride-2)"
timeout 3000 python tools/probe_sedr.py
echo "--- probe_sedr exit: $?"

echo "=== $(date) sedrfuse + myfusion redo (subpixel deconv, shifted dw conv)"
timeout 7200 python tools/bench_zoo.py sedrfuse myfusion
echo "--- sedr/my zoo exit: $?"

echo "=== $(date) zoo heavy tail tiled redo (post vmem-guard)"
timeout 21600 python tools/bench_zoo.py unfusion rfnnest nestfuse res2fusion mafusion
echo "--- zoo tail exit: $?"
