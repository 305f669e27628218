#!/bin/bash
# Round-5 queue 4b (VERDICT #5, split out of queue 6 so it lands before
# the long heavy-tail queue): re-bench sedrfuse and myfusion under the
# flipped formulation defaults (MMIF_SUBPIXEL_DECONV / MMIF_DW_SHIFTED
# default OFF per the r4 queue-12 A/B) so docs/zoo_bench.jsonl records
# the best-known measured configs.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r5_queue_results.log) 2>&1

echo "=== $(date) r5q4b health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r5q4b'; exit 1; }

echo "=== $(date) zoo re-bench: deepfuse (stale pre-g-table row) + sedrfuse + myfusion (formulation defaults OFF)"
timeout 5400 python tools/bench_zoo.py deepfuse sedrfuse myfusion
echo "--- bench_zoo exit: $?"
git add docs/zoo_bench.jsonl && git commit -m "Re-bench deepfuse/sedrfuse/myfusion under current defaults" || true
