"""Benchmark: fused 1224x1024 pair throughput per chip (north star:
>= 2000 pairs/sec/chip on TPU v5e — BASELINE.md).

Protocol: flagship DeepFuse (the reference CLIs' default model,
train.py:228-239) fusing polarization-resolution (1224x1024, README.md:61-69)
grayscale pairs, batched, device-resident steady state; first execution
excluded as compile warmup (mirroring reference test.py:41-48).

Two timing rules, both learned the hard way on this platform (see
docs/PERFORMANCE.md "Benchmark protocol"):
  1. every timed iteration chains on the FULL previous output (y.mean()),
     otherwise XLA dead-code-eliminates all but the fetched elements;
  2. the timed region ends at a scalar *fetch* (float(...)), because
     jax.block_until_ready can return before the device work completes
     behind this environment's TPU relay — round 1's 58 pairs/s headline
     was inflated ~3x by trusting it.

Prints ONE JSON line:
  {"metric": "fusion_throughput_pairs_per_sec", "value": N,
   "unit": "pairs/s", "vs_baseline": N / 2000}
"""

import functools
import json
import os
import time

import numpy as np


def main():
    os.environ.setdefault("MMIF_COMPILE_CACHE",
                          os.path.expanduser("~/.cache/mmif_xla_cache"))
    import jax
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.models import create_model
    from multi_modal_image_fusion_tpu.ops.layers import fast_inference
    from multi_modal_image_fusion_tpu.utils.compile_cache import \
        enable_compilation_cache

    enable_compilation_cache()

    on_tpu = jax.devices()[0].platform == "tpu"
    H, W = 1224, 1024
    batch = int(os.environ.get("BENCH_BATCH", "8" if on_tpu else "1"))
    iters = int(os.environ.get("BENCH_ITERS", "10" if on_tpu else "2"))
    model_name = os.environ.get("BENCH_MODEL", "deepfuse")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    model = create_model(model_name)
    r = np.random.RandomState(0)
    x1 = jnp.asarray(r.rand(batch, H, W, 1), jnp.float32)
    x2 = jnp.asarray(r.rand(batch, H, W, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x1[:1], x2[:1],
                           train=False)
    variables = jax.tree.map(lambda p: p.astype(dtype), variables)
    x2 = x2.astype(dtype)

    @functools.partial(jax.jit, static_argnames="n")
    def bench_loop(a, b, n):
        def body(i, carry):
            a, s = carry
            y = model.apply(variables, a, b, train=False)
            m = y.mean()      # depends on every output element: no DCE
            a = a + m.astype(a.dtype) * jnp.asarray(1e-6, a.dtype)
            return a, s + m.astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, (a, jnp.float32(0.0)))

    with fast_inference():
        # compile + warmup (result discarded)
        out = bench_loop(x1.astype(dtype), x2, iters)
        float(out[1])

        # timed: fresh host data (relay result-cache proof), scalar fetch
        # closes the region (block_until_ready is unreliable here)
        x1 = jnp.asarray(r.rand(batch, H, W, 1), dtype)
        jax.block_until_ready(x1)
        start = time.perf_counter()
        out = bench_loop(x1, x2, iters)
        float(out[1])
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
