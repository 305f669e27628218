#!/bin/bash
# Round-5 queue 5 (VERDICT #4, heavy tail): gate + time the new H-major
# multi-leg nest paths (NestFuse / RFNNest whole-model chains,
# ops/pallas/hiw_scale.py + zoo._hiw_forward). Floor-aware acceptance,
# both-path timing, autoflip (unblocks via HIW_MULTI_BLOCKLIST), zoo
# re-bench. Interpret-mode parity already green on CPU
# (tests/test_hiw.py::test_model_hiw_path_parity nestfuse/rfnnest).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r5_queue_results.log) 2>&1

echo "=== $(date) r5q5 health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r5q5'; exit 1; }

echo "=== $(date) hiw nest gate + timing (nestfuse, rfnnest)"
# timeout trimmed 12000 -> 5400 so the autoflip + re-bench still get a
# slot before round end; the probe emits one JSON line per model as it
# goes, value-ordered, and the autoflip folds whatever completed
MODELS=nestfuse,rfnnest,unfusion,myfusion,res2fusion,mafusion,dbnet,pfnetv2 ITERS=3 LIMIT=3 \
  timeout 5400 python tools/probe_hiw_zoo.py
echo "--- probe_hiw_zoo exit: $?"

echo "=== $(date) r5 multi-leg default autoflip (nest)"
timeout 2400 python tools/r5_autoflip_multi.py
echo "--- autoflip_multi exit: $?"

echo "=== $(date) fold probe ON-path timings into the zoo table"
# cheap CPU fold so the zoo rows reflect the measured H-major wins even
# if the canonical bench.py re-bench (queue 5c) runs out of round time
timeout 600 python tools/r5_fold_probe_zoo.py
echo "--- fold_probe_zoo exit: $?"
