#!/bin/bash
# Round-3 queue 3: re-run the queue-1 legs whose results were lost with
# the container restart (queue 1 ran the morning of 2026-08-18; its log
# lived only in the working tree and /tmp, both wiped). Queue 2 already
# re-measures the s2d decision data and the flash-nl path; this queue
# covers the remainder: BASELINE config #4 full-res training, the
# per-layer s2d packed-conv rates, and the MAFusion benches. Run ONLY
# after tools/r3_tpu_queue2.sh has drained (single TPU, exclusive use).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r3_queue_results.log) 2>&1

echo "=== $(date) health check (queue3: lost queue-1 legs)"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting queue3'; exit 1; }

# /tmp/polar_full: 5 full-res 1224x1024 polar pairs from the reference
# samples, laid out train/{vis,po} + test/{vis,po} (80/20 split -> 4
# train / 1 valid pairs at bs 1).
if [ ! -d /tmp/polar_full/train/vis ]; then
  echo "=== $(date) preparing /tmp/polar_full from bundled samples"
  mkdir -p /tmp/polar_full/train /tmp/polar_full/test
  cp -r /root/reference/data/samples/polar/test/vis \
        /root/reference/data/samples/polar/test/po /tmp/polar_full/train/
  cp -r /root/reference/data/samples/polar/test/vis \
        /root/reference/data/samples/polar/test/po /tmp/polar_full/test/
fi

echo "=== $(date) config #4: unfusion full-res 1224x1024 polar training"
timeout 3000 python -m multi_modal_image_fusion_tpu.cli.train \
  --data polar --data_root /tmp/polar_full --model unfusion \
  --bs 1 --epoch 2 --no-use_patches --no-fix_size \
  --ckpt_root /tmp/ckpts_cfg4
rc=$?
echo "--- config4 exit: $rc"
if [ $rc -ne 0 ]; then
  echo "=== config #4 fallback: res2fusion full-res (VERDICT item 6 names either)"
  timeout 3000 python -m multi_modal_image_fusion_tpu.cli.train \
    --data polar --data_root /tmp/polar_full --model res2fusion \
    --bs 1 --epoch 2 --no-use_patches --no-fix_size \
    --ckpt_root /tmp/ckpts_cfg4_r2f
  echo "--- config4 fallback exit: $?"
fi

echo "=== $(date) config #4 with --fast_train (Pallas VJP at full res)"
timeout 3000 python -m multi_modal_image_fusion_tpu.cli.train \
  --data polar --data_root /tmp/polar_full --model unfusion \
  --bs 1 --epoch 1 --no-use_patches --no-fix_size --fast_train \
  --ckpt_root /tmp/ckpts_cfg4_fast
echo "--- config4 fast_train exit: $?"

echo "=== $(date) bench mafusion b1 (decomposed concat->conv decoders)"
BENCH_MODEL=mafusion BENCH_BATCH=1 timeout 1800 python bench.py
echo "--- mafusion b1 exit: $?"

echo "=== $(date) bench mafusion b2"
BENCH_MODEL=mafusion BENCH_BATCH=2 timeout 1800 python bench.py
echo "--- mafusion b2 exit: $?"

echo "=== $(date) probe_s2d (space-to-depth packed conv per-layer rates)"
timeout 3000 python tools/probe_s2d.py
echo "--- probe_s2d exit: $?"

echo "=== $(date) queue3 done"
python tools/summarize_queue.py docs/r3_queue_results.log \
  > docs/r3_queue_summary.md 2>/dev/null || true
