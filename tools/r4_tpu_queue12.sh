#!/bin/bash
# Round-4 queue 12 (session-2 priority 2): A/B the two env-gated
# formulations whose e2e numbers moved the wrong way in the same window
# as the VMEM-guard dispatch change (sedrfuse 37.8 -> 28.8, myfusion
# 16.1 -> 10.6). Four bench legs; the session (or r5) reads the log and
# sets MMIF_SUBPIXEL_DECONV / MMIF_DW_SHIFTED defaults accordingly.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r4_queue_results.log) 2>&1

echo "=== $(date) r4q12 health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r4q12'; exit 1; }

echo "=== $(date) sedrfuse b8 subpixel deconv ON"
BENCH_MODEL=sedrfuse BENCH_BATCH=8 MMIF_SUBPIXEL_DECONV=1 \
  timeout 1500 python bench.py
echo "--- exit: $?"

echo "=== $(date) sedrfuse b8 subpixel deconv OFF (lhs-dilated)"
BENCH_MODEL=sedrfuse BENCH_BATCH=8 MMIF_SUBPIXEL_DECONV=0 \
  timeout 1500 python bench.py
echo "--- exit: $?"

echo "=== $(date) myfusion b8 dw shifted ON"
BENCH_MODEL=myfusion BENCH_BATCH=8 MMIF_DW_SHIFTED=1 \
  timeout 1800 python bench.py
echo "--- exit: $?"

echo "=== $(date) myfusion b8 dw shifted OFF (XLA grouped)"
BENCH_MODEL=myfusion BENCH_BATCH=8 MMIF_DW_SHIFTED=0 \
  timeout 1800 python bench.py
echo "--- exit: $?"
