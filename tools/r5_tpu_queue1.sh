#!/bin/bash
# Round-5 queue 1 (VERDICT #1 + #6): unblock the multi-leg H-major chain.
# Round-4's "f32 parity failure" (2.9-4.7e-3) was MXU default-precision
# noise, not a kernel bug (tools/probe_precision.py: plain XLA f32 conv at
# default precision shows the same 1.98e-3 vs a HIGHEST-precision
# reference). Gate the six models through the unified dSSIM/dQabf
# acceptance, time both paths, flip defaults, re-bench the zoo rows.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r5_queue_results.log) 2>&1

echo "=== $(date) r5q1 health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r5q1'; exit 1; }

echo "=== $(date) precision probe (record the default-precision envelope)"
timeout 1200 python tools/probe_precision.py
echo "--- probe_precision exit: $?"

echo "=== $(date) hiw multi-leg zoo: unified gate + both-path timing (6 models)"
ITERS=3 LIMIT=3 timeout 9000 python tools/probe_hiw_zoo.py
echo "--- probe_hiw_zoo exit: $?"

echo "=== $(date) r5 multi-leg default autoflip"
timeout 2400 python tools/r5_autoflip_multi.py
echo "--- autoflip_multi exit: $?"

echo "=== $(date) zoo re-bench: the six multi-leg models"
timeout 5400 python tools/bench_zoo.py densefuse vifnet pfnetv1 ifcnn difnet pmgi
echo "--- bench_zoo exit: $?"
git add docs/zoo_bench.jsonl && git commit -m "Re-bench the six multi-leg zoo rows under the flipped H-major default" || true
