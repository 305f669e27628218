#!/bin/bash
# Round-5 queue 5b (was 4c): int8 acceptance ACROSS THE (skip x residency) GRID.
# Queue 4's full-set leg failed on TPU at dQabf 5.37e-3 (CALIB=8) even
# though the CPU fold probe predicted 2.5e-4 — and queue 4 only ran
# acceptance under the r5 default MMIF_HIW_INT8_RES=1, so the new
# int8-resident inter-layer requantization is the prime suspect and was
# never isolated. This queue runs the res=0 acceptance legs plus the
# skip-dec1 x residency benches, then a grid-aware autoflip
# (tools/r5_autoflip_int8b.py) that picks the fastest ACCEPTED combo.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r5_queue_results.log) 2>&1

echo "=== $(date) r5q4c health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r5q4c'; exit 1; }

echo "=== $(date) hiw gate retry: models lost to stochastic remote-compile 500s"
# the probe doesn't retry HTTP 500s the way bench_zoo does; re-run any
# heavy-tail model whose queue-5 record is an error, then re-fold
RETRY=$(python - <<'EOF'
import sys
sys.path.insert(0, "tools")
from r5_autoflip_multi import parse
recs = parse("docs/r5_queue_results.log")
heavy = ["nestfuse", "rfnnest", "unfusion", "myfusion",
         "res2fusion", "mafusion", "dbnet", "pfnetv2"]
print(",".join(n for n in heavy
               if n in recs and recs[n].get("error")))
EOF
)
if [ -n "$RETRY" ]; then
  echo "retrying: $RETRY"
  MODELS=$RETRY ITERS=3 LIMIT=3 timeout 2700 python tools/probe_hiw_zoo.py
  echo "--- probe retry exit: $?"
  timeout 2400 python tools/r5_autoflip_multi.py
  echo "--- autoflip_multi (retry) exit: $?"
  timeout 600 python tools/r5_fold_probe_zoo.py
  echo "--- fold (retry) exit: $?"
fi

echo "=== $(date) int8 acceptance grid: full set res=0 (CALIB=8)"
MMIF_HIW_INT8_RES=0 CALIB=8 LIMIT=4 \
  timeout 3000 python tools/int8_acceptance.py deepfuse
echo "--- exit: $?"

echo "=== $(date) int8 acceptance grid: skip-dec1 res=0 (CALIB=8)"
MMIF_HIW_INT8_RES=0 MMIF_INT8_SKIP=dec1 CALIB=8 LIMIT=4 \
  timeout 3000 python tools/int8_acceptance.py deepfuse
echo "--- exit: $?"

# (skip-dec1 bench legs dropped for time: the autoflip uses the queue-4
# full-set bench at matching residency as the margin proxy — skip-dec1
# only moves one of six legs to bf16, and the driver re-measures
# bench.py itself at round end, so the recorded headline is real.)

echo "=== $(date) r5 int8 grid autoflip"
timeout 3600 python tools/r5_autoflip_int8b.py
echo "--- autoflip_int8b exit: $?"
