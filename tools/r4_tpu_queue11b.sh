#!/bin/bash
# Round-4 queue 11b (session-3): rerun the g-sweep legs that died with
# "nan" in queue 11. Root cause was the PROBE, not the kernel: it took
# mean() over the full guard-layout output, and the never-written guard
# rows decode non-finite from uninitialized HBM (valid slice was finite
# all along — reproduced + fixed on CPU interpret). This queue covers
# the three DeepFuse decoder shapes (incl. dec0, the known 12% loser)
# plus the zoo shapes deferred from queue 9b, then folds the table and
# re-measures the headline.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r4_queue_results.log) 2>&1

echo "=== $(date) r4q11b health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r4q11b'; exit 1; }

echo "=== $(date) hiw g sweep: dec shapes (valid-slice probe fix)"
SHAPES=32-32-7,32-16-5,16-1-5 ITERS=5 \
  timeout 2700 python tools/probe_hiw_g.py
echo "--- probe_hiw_g exit: $?"

echo "=== $(date) hiw g sweep: zoo shapes (densefuse/vifnet/ifcnn)"
SHAPES=16-16-3,64-64-3,64-32-3,32-16-3,128-64-3,1-64-7 ITERS=5 \
  timeout 3600 python tools/probe_hiw_g.py
echo "--- probe_hiw_g exit: $?"

echo "=== $(date) r4 g-table autoflip (post dec/zoo sweep)"
timeout 2400 python tools/r4_autoflip_g.py
echo "--- autoflip_g exit: $?"

echo "=== $(date) headline bench post dec g-table"
timeout 1500 python bench.py
echo "--- exit: $?"
