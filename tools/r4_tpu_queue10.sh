#!/bin/bash
# Round-4 queue 10: int8 through the H-major chain (ops/pallas/
# hiw_int8.py). The fat DeepFuse layers are MXU-bound after the hiw
# reformulation, so the int8 MXU mode's ~2x should finally move the
# headline (the NHWC int8 path measured 66.9 pairs/s — it bypassed the
# chain entirely). Acceptance gates accuracy (SSIM/Qabf <= 1e-3).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r4_queue_results.log) 2>&1

echo "=== $(date) r4q10 health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r4q10'; exit 1; }

echo "=== $(date) int8 acceptance: deepfuse through the hiw-q chain"
timeout 2400 python tools/int8_acceptance.py deepfuse
echo "--- exit: $?"

echo "=== $(date) int8 headline bench (hiw-q chain, MMIF_HIW_INT8 default)"
BENCH_INT8=1 timeout 2400 python bench.py
echo "--- exit: $?"

echo "=== $(date) int8 headline bench, chain disabled (NHWC int8 baseline)"
BENCH_INT8=1 MMIF_HIW_INT8=0 timeout 2400 python bench.py
echo "--- exit: $?"
