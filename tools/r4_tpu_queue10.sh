#!/bin/bash
# Round-4 queue 10 (fires FIRST after queue 6 — lexical order): the
# highest-value measurements left this round, trimmed to fit the
# remaining window. (a) per-shape g sweep -> HIW_G_TABLE autoflip ->
# headline re-measure; (b) multi-leg H-major zoo paths: parity + timing
# -> default autoflip.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r4_queue_results.log) 2>&1

echo "=== $(date) r4q10 health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r4q10'; exit 1; }

echo "=== $(date) hiw per-shape g sweep (headline shapes first)"
SHAPES=1-16-5,16-32-7,32-32-7,32-16-5,16-1-5 ITERS=5 \
  timeout 4500 python tools/probe_hiw_g.py
echo "--- probe_hiw_g exit: $?"

echo "=== $(date) r4 g-table autoflip"
timeout 3600 python tools/r4_autoflip_g.py
echo "--- autoflip_g exit: $?"

echo "=== $(date) headline bench post g-table"
timeout 1800 python bench.py
echo "--- bench exit: $?"

echo "=== $(date) hiw multi-leg zoo: TPU parity + both-path timing"
ITERS=3 timeout 10800 python tools/probe_hiw_zoo.py
echo "--- probe_hiw_zoo exit: $?"

echo "=== $(date) r4 multi-leg default autoflip"
timeout 3600 python tools/r4_autoflip_multi.py
echo "--- autoflip_multi exit: $?"
