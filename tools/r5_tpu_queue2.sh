#!/bin/bash
# Round-5 queue 2 (VERDICT #3): finish the per-shape g table. The
# queue-11b rerun silently produced nothing (docs/r4_queue_results.log
# shows only its health check); the probe NaN bug it was rerunning for
# was fixed in d3a4d65. Covers the three DeepFuse decoder shapes, the
# multi-leg zoo shapes, and the enc1 rows x g sweep (docs/ROUND4.md
# item 1: enc1 is MXU-bound including band zeros — smaller-inflation g2
# at tuned strip heights is the remaining lever). Then folds the table
# and re-measures the headline.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r5_queue_results.log) 2>&1

echo "=== $(date) r5q2 health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r5q2'; exit 1; }

echo "=== $(date) hiw g sweep: dec shapes"
SHAPES=32-32-7,32-16-5,16-1-5 ITERS=5 \
  timeout 2700 python tools/probe_hiw_g.py
echo "--- probe_hiw_g exit: $?"

echo "=== $(date) hiw g sweep: zoo shapes"
SHAPES=16-16-3,64-64-3,64-32-3,32-16-3,128-64-3,1-64-7 ITERS=5 \
  timeout 3600 python tools/probe_hiw_g.py
echo "--- probe_hiw_g exit: $?"

echo "=== $(date) hiw enc1 rows x g sweep"
SHAPES=16-32-7 ROWS=8,16,32 ITERS=5 \
  timeout 2700 python tools/probe_hiw_g.py
echo "--- probe_hiw_g exit: $?"

echo "=== $(date) r5 g-table autoflip"
timeout 2400 python tools/r4_autoflip_g.py docs/r5_queue_results.log
echo "--- autoflip_g exit: $?"

echo "=== $(date) headline bench post g-table"
timeout 1500 python bench.py
echo "--- bench exit: $?"
