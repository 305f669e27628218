#!/bin/bash
# Round-5 queue 3 (VERDICT #5): re-bench sedrfuse and myfusion under the
# flipped formulation defaults (MMIF_SUBPIXEL_DECONV / MMIF_DW_SHIFTED
# now default OFF per the queue-12 A/B) so docs/zoo_bench.jsonl records
# the best-known measured configs, then the amp convergence leg
# (VERDICT #7) and its autoflip.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r5_queue_results.log) 2>&1

echo "=== $(date) r5q6 health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r5q6'; exit 1; }

echo "=== $(date) zoo re-bench: sedrfuse + myfusion (formulation defaults OFF)"
timeout 5400 python tools/bench_zoo.py sedrfuse myfusion
echo "--- bench_zoo exit: $?"
git add docs/zoo_bench.jsonl && git commit -m "Re-bench sedrfuse/myfusion under the measured formulation defaults" || true

echo "=== $(date) amp bf16 convergence leg (12-epoch reference recipe)"
timeout 5400 python tools/probe_amp_convergence.py
echo "--- probe_amp_convergence exit: $?"

echo "=== $(date) r5 amp default autoflip"
timeout 3600 python tools/r5_autoflip_amp.py
echo "--- autoflip_amp exit: $?"
