#!/bin/bash
# Round-5 queue 4 (VERDICT #2): land int8. Accuracy lever: CALIB=8
# calibration pairs (the r4 failure was calibration coverage,
# tools/probe_int8_fold.py); speed lever: the int8-RESIDENT enc1->dec0
# hop (half the DMA bytes on the fattest inter-layer strip). Two
# acceptance legs (full hiw-q set / skip-dec1 fallback), resident-hop
# A/B benches, then the r5 int8 autoflip decides skip config, resident
# default, and the headline flip.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r5_queue_results.log) 2>&1

echo "=== $(date) r5q4 health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r5q4'; exit 1; }

echo "=== $(date) int8 acceptance: deepfuse full hiw-q set (CALIB=8)"
CALIB=8 LIMIT=4 timeout 3000 python tools/int8_acceptance.py deepfuse
echo "--- exit: $?"

echo "=== $(date) int8 acceptance: deepfuse skip-dec1 fallback (CALIB=8)"
MMIF_INT8_SKIP=dec1 CALIB=8 LIMIT=4 \
  timeout 3000 python tools/int8_acceptance.py deepfuse
echo "--- exit: $?"

echo "=== $(date) int8 headline bench (hiw-q chain, res=1)"
BENCH_INT8=1 timeout 1500 python bench.py
echo "--- exit: $?"

echo "=== $(date) int8 headline bench (hiw-q chain, res=0)"
BENCH_INT8=1 MMIF_HIW_INT8_RES=0 timeout 1500 python bench.py
echo "--- exit: $?"

echo "=== $(date) bf16 headline bench (current default, for the margin)"
timeout 1500 python bench.py
echo "--- exit: $?"

echo "=== $(date) headline batch sweep (b24/b32, dispatch amortization)"
BENCH_BATCH=24 timeout 1200 python bench.py
BENCH_BATCH=32 timeout 1200 python bench.py
echo "--- exit: $?"

echo "=== $(date) r5 int8 autoflip"
timeout 3600 python tools/r5_autoflip_int8.py
echo "--- autoflip_int8 exit: $?"
