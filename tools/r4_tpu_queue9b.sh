#!/bin/bash
# Round-4 queue 9b (last): the lower-priority sweeps — hiw rows
# diagnostics at the fat DeepFuse shapes, and the multi-leg zoo table
# refresh (runs only if the window allows; results feed round 5).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r4_queue_results.log) 2>&1

echo "=== $(date) r4q9b health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r4q9b'; exit 1; }

echo "=== $(date) tiled tail with XLA convs (isolate the Pallas-in-lax.map compiler crash)"
for m in res2fusion mafusion nestfuse; do
  echo "--- $m b4 t4 MMIF_NO_PALLAS=1"
  BENCH_MODEL=$m BENCH_BATCH=4 BENCH_TILES=4 MMIF_NO_PALLAS=1 \
    timeout 1500 python bench.py
  echo "--- exit: $?"
done

echo "=== $(date) hiw rows sweep at the two fat DeepFuse shapes"
SHAPES=16-32-7,32-32-7 ROWS=8,16,32 ITERS=6 \
  timeout 5400 python tools/probe_hiw_g.py
echo "--- probe_hiw_rows exit: $?"

echo "=== $(date) zoo table refresh for the multi-leg models"
timeout 14400 python tools/bench_zoo.py densefuse vifnet pfnetv1 ifcnn difnet pmgi unfusion res2fusion
echo "--- zoo refresh exit: $?"

echo "=== $(date) hiw g sweep: remaining zoo shapes (round-5 table food)"
SHAPES=16-16-3,64-64-3,64-32-3,32-16-3,128-64-3,1-64-7 ITERS=6 \
  timeout 5400 python tools/probe_hiw_g.py
echo "--- probe_hiw_g zoo exit: $?"

echo "=== $(date) r4 g-table autoflip (zoo shapes)"
timeout 3600 python tools/r4_autoflip_g.py
echo "--- autoflip_g exit: $?"
