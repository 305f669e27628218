#!/bin/bash
# Round-4 queue 3: int8 acceptance + training-path profile + SEDRFuse
# breakdown. Runs after queues 1-2 (watcher sequences by marker files).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec > >(tee -a /root/repo/docs/r4_queue_results.log) 2>&1

echo "=== $(date) r4q3 health check"
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).mean()))
" || { echo 'TPU DOWN - aborting r4q3'; exit 1; }

echo "=== $(date) int8 acceptance harness (SSIM/Qabf <= 1e-3 budget)"
timeout 3600 python tools/int8_acceptance.py deepfuse densefuse vifnet
echo "--- int8 acceptance exit: $?"

echo "=== $(date) int8 headline bench (--int8-path DeepFuse, b16 full-res)"
MMIF_INT8_BENCH=1 timeout 1800 python - <<'PYEOF'
import functools, json, os, time
import numpy as np
import jax, jax.numpy as jnp
from multi_modal_image_fusion_tpu.models import create_model
from multi_modal_image_fusion_tpu.ops.quant import calibrate, quantized_inference

model = create_model("deepfuse")
r = np.random.RandomState(0)
B, H, W = 16, 1224, 1024
x1 = jnp.asarray(r.rand(B, H, W, 1), jnp.bfloat16)
x2 = jnp.asarray(r.rand(B, H, W, 1), jnp.bfloat16)
v = model.init(jax.random.PRNGKey(0), x1[:1, :256, :256], x2[:1, :256, :256], train=False)
v = jax.tree.map(lambda p: p.astype(jnp.bfloat16), v)
amax = calibrate(model, v, [(x1[:1, :256, :256], x2[:1, :256, :256])])

with quantized_inference(amax):
    @functools.partial(jax.jit, static_argnames="n")
    def loop(a, b, n):
        def body(i, carry):
            a, s = carry
            m = model.apply(v, a, b, train=False).astype(jnp.float32).mean()
            return a + (m * 1e-9).astype(a.dtype), s + m
        return jax.lax.fori_loop(0, n, body, (a, jnp.float32(0.0)))
    out = loop(x1, x2, 10); float(out[1])
    x1b = jnp.asarray(r.rand(B, H, W, 1), jnp.bfloat16)
    t0 = time.perf_counter(); out = loop(x1b, x2, 10); float(out[1])
    dt = time.perf_counter() - t0
print(json.dumps({"metric": "int8_fusion_throughput", "value": round(B*10/dt, 2), "unit": "pairs/s"}))
PYEOF
echo "--- int8 bench exit: $?"

echo "=== $(date) train-step profile at the reference config (item #3 data)"
BENCH_MODE=train timeout 2400 python bench.py
echo "--- train bench exit: $?"
BENCH_MODE=train BENCH_FAST_TRAIN=1 timeout 2400 python bench.py
echo "--- fast-train bench exit: $?"

echo "=== $(date) jax.profiler trace of the reference-config train step"
timeout 2400 python tools/profile_train_step.py
echo "--- train profile exit: $?"

echo "=== $(date) sedrfuse per-stage breakdown"
timeout 2400 python tools/probe_sedrfuse.py
echo "--- sedrfuse probe exit: $?"
