#!/bin/bash
# Round-4 queue 2: heavy-tail rescue measurements (VERDICT r3 item #2).
# Re-benches the five HBM-capacity-bound models through the (batch,
# tiles) ladders in tools/bench_zoo.py — two-phase height tiling
# (parallel/tiling.py) frees the decoder concat working sets so larger
# batches fit. Run after r4_tpu_queue1.sh (single TPU, exclusive use);
# the watcher (tools/r4_watch.sh) sequences queues by marker files.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r4_queue_results.log) 2>&1

echo "=== $(date) r4q2 health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r4q2'; exit 1; }

echo "=== $(date) zoo heavy tail with tiling ladders"
timeout 28800 python tools/bench_zoo.py nestfuse rfnnest unfusion res2fusion mafusion
echo "--- zoo tail exit: $?"

echo "=== $(date) zoo remainder refresh (one-row-per-model rewrite)"
timeout 14400 python tools/bench_zoo.py sedrfuse myfusion dbnet pfnetv2
echo "--- zoo refresh exit: $?"
