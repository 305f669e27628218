#!/bin/bash
# Round-4 queue 4: heavy-tail zoo redo. Queue 2 was cut short (its tail
# sweep was repeatedly hit by far-side remote-compile HTTP 500s and was
# preempted so the hiw decision legs could run); this re-runs the four
# models that never landed a row plus the refresh leg. bench_zoo skips
# models whose current row already came from this round, so reruns are
# cheap when queue 2 did land something.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r4_queue_results.log) 2>&1

echo "=== $(date) r4q4 health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r4q4'; exit 1; }

echo "=== $(date) zoo heavy tail redo (tiling ladders)"
timeout 14400 python tools/bench_zoo.py rfnnest unfusion res2fusion mafusion
echo "--- zoo tail exit: $?"

echo "=== $(date) zoo remainder refresh (one-row-per-model rewrite)"
timeout 10800 python tools/bench_zoo.py nestfuse sedrfuse myfusion
echo "--- zoo refresh exit: $?"
