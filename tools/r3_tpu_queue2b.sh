#!/bin/bash
# Round-3 queue 2b: the s2d default decision, third attempt. Queue 2
# measured base=102.04 vs s2d(XLA glue)=99.99 pairs/s — the packed chain
# loses while its enter/exit glue costs 76 ms/batch (48.4+27.6 measured)
# — and its MMIF_S2D_IO leg died on a second Mosaic rejection (size-1
# slice of the 2-tiled phase dim, hit only at the headline shape). The
# IO kernels were rewritten (merged double-width rows, lane-sliced
# phases; commit 2142677); this queue re-runs the smoke, the glue probe,
# and a fresh base/s2d/io bench segment so tools/r3_autoflip.py decides
# within one run. Run after tools/r3_tpu_queue2.sh drains (single TPU).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r3_queue_results.log) 2>&1

echo "=== $(date) health check (queue2b: merged-row s2d_io kernels)"
timeout 180 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting queue2b'; exit 1; }

echo "=== $(date) s2d_io kernels: TPU compile + parity smoke"
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

echo "=== $(date) autoflip: default the winning s2d variant (parity-gated)"
timeout 3900 python tools/r3_autoflip.py
echo "--- autoflip exit: $?"

# flash nl: queue2's probe/benches ran the pre-fix kernel (its process
# started before commit 79b6390 removed the (1,1) vectors; AOT compile
# now passes for bn=256/512/1024) — re-measure the flash path for real
echo "=== $(date) probe_nl (flash kernel, no (1,1) vectors)"
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

echo "=== $(date) queue2b done"
python tools/summarize_queue.py docs/r3_queue_results.log \
  > docs/r3_queue_summary.md 2>/dev/null || true
