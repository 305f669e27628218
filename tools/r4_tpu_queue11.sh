#!/bin/bash
# Round-4 queue 11 (session-2 priority 1): the headline lever chain.
# (a) per-shape g sweep at the five DeepFuse headline shapes ->
#     HIW_G_TABLE autoflip -> headline re-measure;
# (b) int8 acceptance + the hiw-q int8 headline leg -> int8 default
#     autoflip (flips only on acceptance OK + >2% margin over (a)).
# Trimmed from queues 7+10 to fit the session-2 window: the NHWC int8
# baseline leg is dropped (already measured: 66.9 pairs/s, queue 5).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r4_queue_results.log) 2>&1

echo "=== $(date) r4q11 health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r4q11'; exit 1; }

echo "=== $(date) hiw per-shape g sweep (headline shapes first)"
SHAPES=1-16-5,16-32-7,32-32-7,32-16-5,16-1-5 ITERS=5 \
  timeout 3600 python tools/probe_hiw_g.py
echo "--- probe_hiw_g exit: $?"

echo "=== $(date) r4 g-table autoflip"
timeout 2400 python tools/r4_autoflip_g.py
echo "--- autoflip_g exit: $?"

echo "=== $(date) headline bench post g-table"
timeout 1500 python bench.py
echo "--- bench exit: $?"

echo "=== $(date) int8 acceptance: deepfuse through the hiw-q chain"
timeout 1800 python tools/int8_acceptance.py deepfuse
echo "--- exit: $?"

echo "=== $(date) int8 headline bench (hiw-q chain, MMIF_HIW_INT8 default)"
BENCH_INT8=1 timeout 1500 python bench.py
echo "--- exit: $?"

echo "=== $(date) r4 int8 headline autoflip"
timeout 2400 python tools/r4_autoflip_int8.py
echo "--- autoflip_int8 exit: $?"
