#!/bin/bash
# Round-5 queue 2b: re-gate the four queue-1-blocklisted multi-leg models
# under the FLOOR-AWARE acceptance (tools/acceptance.py). Queue-1 showed
# their dSSIM/dQabf budgets pass (difnet 9e-9!) and the failures were the
# absolute f32 tripwire / absolute bf16 budget — both now measured against
# the model's own shipping-path floors. Measured wins waiting: difnet
# 82->240, ifcnn 73->121, vifnet 43->86, pfnetv1 48->86 pairs/s.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r5_queue_results.log) 2>&1

echo "=== $(date) r5q2b health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r5q2b'; exit 1; }

echo "=== $(date) hiw multi-leg re-gate (floor-aware): 4 blocklisted models"
MODELS=vifnet,pfnetv1,ifcnn,difnet ITERS=3 LIMIT=3 \
  timeout 9000 python tools/probe_hiw_zoo.py
echo "--- probe_hiw_zoo exit: $?"

echo "=== $(date) r5 multi-leg default autoflip (rerun)"
timeout 2400 python tools/r5_autoflip_multi.py
echo "--- autoflip_multi exit: $?"

echo "=== $(date) zoo re-bench: newly flipped models"
timeout 5400 python tools/bench_zoo.py vifnet pfnetv1 ifcnn difnet
echo "--- bench_zoo exit: $?"
git add docs/zoo_bench.jsonl && git commit -m "Re-bench the floor-aware-gated multi-leg zoo rows" || true
