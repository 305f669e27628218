"""Benchmark: fused 1224x1024 pair throughput per chip (north star:
>= 2000 pairs/sec/chip on TPU v5e — BASELINE.md).

Protocol: flagship DeepFuse (the reference CLIs' default model,
train.py:228-239) fusing polarization-resolution (1224x1024, README.md:61-69)
grayscale pairs, batched, device-resident steady state; first execution
excluded as compile warmup (mirroring reference test.py:41-48).

Prints ONE JSON line:
  {"metric": "fusion_throughput_pairs_per_sec", "value": N,
   "unit": "pairs/s", "vs_baseline": N / 2000}
"""

import json
import os
import sys
import time

import numpy as np


def main():
    os.environ.setdefault("MMIF_COMPILE_CACHE",
                          os.path.expanduser("~/.cache/mmif_xla_cache"))
    import jax
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.models import create_model
    from multi_modal_image_fusion_tpu.utils.compile_cache import \
        enable_compilation_cache

    enable_compilation_cache()

    on_tpu = jax.devices()[0].platform == "tpu"
    H, W = 1224, 1024
    batch = int(os.environ.get("BENCH_BATCH", "8" if on_tpu else "1"))
    iters = int(os.environ.get("BENCH_ITERS", "20" if on_tpu else "2"))
    model_name = os.environ.get("BENCH_MODEL", "deepfuse")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    model = create_model(model_name)
    r = np.random.RandomState(0)
    x1 = jnp.asarray(r.rand(batch, H, W, 1), jnp.float32)
    x2 = jnp.asarray(r.rand(batch, H, W, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x1[:1], x2[:1],
                           train=False)
    variables = jax.tree.map(lambda p: p.astype(dtype), variables)
    x1 = x1.astype(dtype)
    x2 = x2.astype(dtype)

    @jax.jit
    def fuse_step(a, b):
        y = model.apply(variables, a, b, train=False)
        # derive the next input from the output: serializes iterations and
        # defeats result-caching/dedup of identical executions in the
        # runtime (repeat-same-args timing reads absurdly fast)
        a_next = a + y.mean().astype(a.dtype) * jnp.asarray(1e-6, a.dtype)
        return a_next, y

    # compile warmup
    x1, y = fuse_step(x1, x2)
    jax.block_until_ready(y)

    start = time.perf_counter()
    for _ in range(iters):
        x1, y = fuse_step(x1, x2)
    jax.block_until_ready(y)
    elapsed = time.perf_counter() - start

    pairs_per_sec = batch * iters / elapsed
    print(json.dumps({
        "metric": "fusion_throughput_pairs_per_sec",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / 2000.0, 4),
    }))


if __name__ == "__main__":
    main()
