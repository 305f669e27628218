#!/bin/bash
# Round-4 queue 2z: the halo-in-weights (hiw) DECISION legs — these were
# appended to r4_tpu_queue1.sh after it had already run (its marker was
# set), so they never executed. Re-armed here at the highest remaining
# priority: the default-flip decision gates the round's headline number
# (VERDICT r3 item #1). Runs right after queue2 (watcher lexical order).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r4_queue_results.log) 2>&1

echo "=== $(date) r4q2z health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r4q2z'; exit 1; }

echo "=== $(date) hiw e2e: TPU parity smoke + both-path timing"
timeout 3000 python tools/probe_hiw_e2e.py
echo "--- probe_hiw_e2e exit: $?"

echo "=== $(date) headline bench (current default, comparison base)"
timeout 1800 python bench.py
echo "--- bench exit: $?"

echo "=== $(date) headline bench with hiw chain (MMIF_CHAIN_HIW=1)"
MMIF_CHAIN_HIW=1 timeout 1800 python bench.py
echo "--- hiw bench exit: $?"

echo "=== $(date) r4 autoflip decision"
timeout 3600 python tools/r4_autoflip.py
echo "--- autoflip exit: $?"
