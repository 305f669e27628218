#!/bin/bash
# Round-3 follow-up queue: re-decide the s2d default with the FIXED
# packed enter/exit kernels (the first queue's MMIF_S2D_IO leg died on a
# Mosaic stride-2 slice rejection, fixed in ops/pallas/s2d_io.py — the
# XLA enter/exit glue it replaces measured 78ms of the 161ms s2d batch,
# so the variant was never fairly benched). Run ONLY after
# tools/r3_tpu_queue.sh has drained: both scripts assume exclusive use
# of the single TPU. Step headers must keep the exact marker strings
# tools/r3_autoflip.py greps for; the re-run "health check" header marks
# a fresh log segment so autoflip never mixes runs.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r3_queue_results.log) 2>&1

echo "=== $(date) health check (queue2: fixed s2d_io kernels)"
timeout 180 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting queue2'; exit 1; }

echo "=== $(date) s2d_io kernels: TPU compile + parity smoke"
# covers BOTH tail paths: h%16==8 (tail=4, the fixed deinterleave) via
# 40x256, and the headline 1224x1024 (612 packed rows, tail=4) shape
timeout 1500 python -c "
import numpy as np, jax, jax.numpy as jnp
from multi_modal_image_fusion_tpu.ops.pallas.conv_kernel import (
    CHAIN_GUARD, CHAIN_WG, chain_enter, chain_exit)
from multi_modal_image_fusion_tpu.ops.pallas.s2d_io import (
    s2d_chain_enter, s2d_chain_exit)
from multi_modal_image_fusion_tpu.ops.s2d import s2d_pack
r = np.random.RandomState(0)
for b, h, w in ((2, 40, 256), (1, 1224, 1024)):
    x = jnp.asarray(r.rand(b, h, w, 1) - 0.5, jnp.bfloat16)
    got = s2d_chain_enter(x)
    want = chain_enter(s2d_pack(x, 2))
    h2, w2 = h // 2, w // 2
    sl = (slice(None), slice(None), slice(CHAIN_GUARD, CHAIN_GUARD + h2),
          slice(CHAIN_WG, CHAIN_WG + w2))
    np.testing.assert_array_equal(np.asarray(got[sl]), np.asarray(want[sl]))
    back = s2d_chain_exit(got, h, w)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    print(f'  {b}x{h}x{w}: enter+exit roundtrip exact')
print('s2d_io TPU parity OK (incl. u32 bit-pun endianness)')
"
echo "--- s2d_io smoke exit: $?"

echo "=== $(date) probe_s2d_io (packed enter/exit glue share)"
timeout 1200 python tools/probe_s2d_io.py
echo "--- probe_s2d_io exit: $?"

echo "=== $(date) headline deepfuse b16 (current default, comparison base)"
timeout 1800 python bench.py

echo "=== $(date) headline deepfuse b16 with s2d packed chain"
MMIF_S2D=1 timeout 1800 python bench.py
echo "--- s2d bench exit: $?"

echo "=== $(date) s2d with packed enter/exit kernels (MMIF_S2D_IO=1)"
MMIF_S2D=1 MMIF_S2D_IO=1 timeout 1800 python bench.py
echo "--- s2d_io bench exit: $?"

echo "=== $(date) s2d_io with raised vmem budget"
# header deliberately does NOT match autoflip's 'budget' marker ("s2d
# with raised vmem budget"): queue1 measured the budget knob at +0.04%
# (99.66 vs 99.62) so it stays out of the decision; this run is
# diagnostic only.
MMIF_S2D=1 MMIF_S2D_IO=1 MMIF_CHAIN_VMEM_BUDGET=$((64*1024*1024)) \
  timeout 1800 python bench.py
echo "--- s2d_io budget bench exit: $?"

echo "=== $(date) autoflip: default the winning s2d variant (parity-gated)"
timeout 3900 python tools/r3_autoflip.py
echo "--- autoflip exit: $?"

# flash nl kernel re-measure: queue1's probe_nl and res2fusion flash legs
# all died on the same Mosaic both-axis broadcast, fixed in nl_kernel.py
echo "=== $(date) probe_nl retry (fixed broadcast lowering)"
timeout 1500 python tools/probe_nl.py
echo "--- probe_nl exit: $?"

echo "=== $(date) bench res2fusion b2 (flash nl kernel)"
BENCH_MODEL=res2fusion BENCH_BATCH=2 timeout 1800 python bench.py
if [ $? -ne 0 ]; then
  echo "=== flash path failed; res2fusion b2 with MMIF_FLASH_NL=0"
  MMIF_FLASH_NL=0 BENCH_MODEL=res2fusion BENCH_BATCH=2 timeout 1800 python bench.py
fi

echo "=== $(date) bench res2fusion b4 (flash nl kernel)"
BENCH_MODEL=res2fusion BENCH_BATCH=4 timeout 1800 python bench.py
echo "--- res2fusion b4 exit: $?"

echo "=== $(date) queue2 done"
python tools/summarize_queue.py docs/r3_queue_results.log \
  > docs/r3_queue_summary.md 2>/dev/null || true
