#!/bin/bash
# Round-4 queue 7 (second): int8 through the H-major chain — acceptance
# gate + both int8 headline legs (ops/pallas/hiw_int8.py).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r4_queue_results.log) 2>&1

echo "=== $(date) r4q7 health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r4q7'; exit 1; }

echo "=== $(date) int8 acceptance: deepfuse through the hiw-q chain"
timeout 2400 python tools/int8_acceptance.py deepfuse
echo "--- exit: $?"

echo "=== $(date) int8 headline bench (hiw-q chain, MMIF_HIW_INT8 default)"
BENCH_INT8=1 timeout 2400 python bench.py
echo "--- exit: $?"

echo "=== $(date) int8 headline bench, chain disabled (NHWC int8 baseline)"
BENCH_INT8=1 MMIF_HIW_INT8=0 timeout 2400 python bench.py
echo "--- exit: $?"

echo "=== $(date) r4 int8 headline autoflip"
timeout 3600 python tools/r4_autoflip_int8.py
echo "--- autoflip_int8 exit: $?"
