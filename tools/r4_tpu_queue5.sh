#!/bin/bash
# Round-4 queue 5: re-arm the halo-in-weights DECISION legs after the
# c_in=1 DMA-alignment fix (commit 02f69e2). Every hiw e2e leg in queues
# 1/2z failed on the Mosaic dma_start alignment error at
# hiw_kernel.py:206; the fix landed after those runs, so the decision
# data (VERDICT r3 item #1, the round headline) still does not exist.
# Then the int8 headline leg (item #5) once the chain default is settled.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r4_queue_results.log) 2>&1

echo "=== $(date) r4q5 health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r4q5'; exit 1; }

echo "=== $(date) hiw e2e: TPU parity smoke + both-path timing"
timeout 3000 python tools/probe_hiw_e2e.py
echo "--- probe_hiw_e2e exit: $?"

echo "=== $(date) headline bench (current default, comparison base"
timeout 1800 python bench.py
echo "--- bench exit: $?"

echo "=== $(date) headline bench with hiw chain (MMIF_CHAIN_HIW=1)"
MMIF_CHAIN_HIW=1 timeout 1800 python bench.py
echo "--- hiw bench exit: $?"

echo "=== $(date) r4 autoflip decision"
timeout 3600 python tools/r4_autoflip.py
echo "--- autoflip exit: $?"

echo "=== $(date) int8 headline bench (BENCH_INT8=1)"
BENCH_INT8=1 timeout 1800 python bench.py
echo "--- int8 bench exit: $?"
