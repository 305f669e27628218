#!/bin/bash
# Round-4 queue 1: the measurements that gate everything else this round.
# Ordered so the halo-in-weights (hiw) decision data lands first — VERDICT
# round-3 item #1 ("Land the halo-in-weights conv formulation") needs the
# probe numbers before the production integration default can flip.
# Each step timeout-bounded; failures don't stop the queue.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r4_queue_results.log) 2>&1

echo "=== $(date) r4q1 health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r4q1'; exit 1; }

echo "=== $(date) probe_hiw: halo-in-weights vs production formulation"
timeout 3000 python tools/probe_hiw.py
echo "--- probe_hiw exit: $?"

echo "=== $(date) headline bench (current default, comparison base)"
timeout 1800 python bench.py
echo "--- bench exit: $?"

echo "=== $(date) hiw e2e: TPU parity smoke + both-path timing"
timeout 3000 python tools/probe_hiw_e2e.py
echo "--- probe_hiw_e2e exit: $?"

echo "=== $(date) headline bench with hiw chain (MMIF_CHAIN_HIW=1)"
MMIF_CHAIN_HIW=1 timeout 1800 python bench.py
echo "--- hiw bench exit: $?"

echo "=== $(date) r4 autoflip decision"
timeout 3600 python tools/r4_autoflip.py
echo "--- autoflip exit: $?"
