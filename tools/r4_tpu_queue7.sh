#!/bin/bash
# Round-4 queue 7: (a) per-shape g sweep of the production hiw conv ->
# HIW_G_TABLE autoflip -> headline bench re-measure; (b) multi-leg
# H-major zoo paths (DenseFuse/VIFNet/PFNetv1/IFCNN/DIFNet/PMGI): TPU
# parity + both-path timing -> default autoflip -> zoo table refresh.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r4_queue_results.log) 2>&1

echo "=== $(date) r4q7 health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r4q7'; exit 1; }

echo "=== $(date) hiw per-shape g sweep (production kernel)"
timeout 7200 python tools/probe_hiw_g.py
echo "--- probe_hiw_g exit: $?"

echo "=== $(date) hiw rows sweep at the two fat DeepFuse shapes"
SHAPES=16-32-7,32-32-7 ROWS=8,16,32 timeout 5400 python tools/probe_hiw_g.py
echo "--- probe_hiw_rows exit: $?"

echo "=== $(date) r4 g-table autoflip"
timeout 3600 python tools/r4_autoflip_g.py
echo "--- autoflip_g exit: $?"

echo "=== $(date) headline bench post g-table"
timeout 1800 python bench.py
echo "--- bench exit: $?"

echo "=== $(date) hiw multi-leg zoo: TPU parity + both-path timing"
timeout 14400 python tools/probe_hiw_zoo.py
echo "--- probe_hiw_zoo exit: $?"

echo "=== $(date) r4 multi-leg default autoflip"
timeout 3600 python tools/r4_autoflip_multi.py
echo "--- autoflip_multi exit: $?"

echo "=== $(date) zoo table refresh for the multi-leg models"
timeout 14400 python tools/bench_zoo.py densefuse vifnet pfnetv1 ifcnn difnet pmgi
echo "--- zoo refresh exit: $?"
