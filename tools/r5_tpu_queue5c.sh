#!/bin/bash
# Round-5 queue 5c: canonical bench.py re-bench of the heavy-tail zoo
# rows under the queue-5-gated defaults (overwrites the probe-folded
# provisional rows), then the section breakdown probe. Runs after the
# int8 grid (5b) — these rows already carry provisional measured
# numbers from tools/r5_fold_probe_zoo.py, so this queue is the
# lowest-marginal-value TPU work and goes last before the amp leg.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r5_queue_results.log) 2>&1

echo "=== $(date) r5q5c health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r5q5c'; exit 1; }

echo "=== $(date) zoo re-bench: heavy-tail models under the gated defaults"
timeout 5400 python tools/bench_zoo.py nestfuse rfnnest unfusion myfusion res2fusion mafusion dbnet pfnetv2
echo "--- bench_zoo exit: $?"
git add docs/zoo_bench.jsonl && git commit -m "Re-bench the gated H-major zoo rows (canonical bench.py numbers)" || true

echo "=== $(date) heavy-tail section breakdown (res2fusion/myfusion/unfusion)"
timeout 5400 python tools/probe_tail_breakdown.py res2fusion myfusion unfusion
echo "--- probe_tail_breakdown exit: $?"
