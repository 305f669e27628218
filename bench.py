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

BENCH_MODE=train switches to the training benchmark instead (the
reference's hot loop, train.py:37-133): full jit'd train steps — forward +
3-loss bundle + backward + grad-clip + adam — at the reference default
config (DeepFuse, bs 16, 64x64 patches, SSIM+pixel+grad losses), same
honest timing protocol, reporting steps/s and patch-pairs/s.
"""

import functools
import json
import os
import time

import numpy as np

# int8 headline default (BENCH_INT8 env overrides). Flipped by
# tools/r4_autoflip_int8.py only when the measured int8 leg BEATS the
# bf16 headline AND the acceptance harness passes (SSIM/Qabf <= 1e-3,
# the BASELINE.json parity budget — so the headline metric keeps its
# accuracy contract).
INT8_DEFAULT = False


def main():
    os.environ.setdefault("MMIF_COMPILE_CACHE",
                          os.path.expanduser("~/.cache/mmif_xla_cache"))

    # Backend-init watchdog: when the TPU relay is down, jax.devices()
    # hangs indefinitely (device grants never arrive) — emit an explicit
    # error JSON line after a bounded wait instead of hanging the caller.
    import threading

    ready = threading.Event()

    def _probe():
        import jax as _jax
        _jax.devices()
        ready.set()

    threading.Thread(target=_probe, daemon=True).start()
    if not ready.wait(float(os.environ.get("BENCH_INIT_TIMEOUT", "1800"))):
        print(json.dumps({
            "metric": "fusion_throughput_pairs_per_sec", "value": 0.0,
            "unit": "pairs/s", "vs_baseline": 0.0,
            "error": "backend init timed out (TPU relay unavailable)"}))
        os._exit(2)

    import jax
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.models import create_model
    from multi_modal_image_fusion_tpu.ops.layers import fast_inference
    from multi_modal_image_fusion_tpu.utils.compile_cache import \
        enable_compilation_cache

    enable_compilation_cache()

    on_tpu = jax.devices()[0].platform == "tpu"
    H, W = 1224, 1024
    # b16 is the measured throughput knee (b8 88.8 / b16 101.5 / b24 102.0
    # / b32 102.4 pairs/s, round 3) — beyond it HBM working-set grows for
    # ~nothing
    batch = int(os.environ.get("BENCH_BATCH", "16" if on_tpu else "1"))
    iters = int(os.environ.get("BENCH_ITERS", "10" if on_tpu else "2"))
    model_name = os.environ.get("BENCH_MODEL", "deepfuse")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    # BENCH_TILES > 1: single-chip height tiling (parallel/tiling.py) —
    # trades halo recompute for the heavy tail's HBM-capacity-bound
    # decoder working sets. H pads (reflect) to a slab-aligned multiple;
    # throughput still counts the true 1224-row pairs.
    tiles = int(os.environ.get("BENCH_TILES", "0"))

    model = create_model(model_name)
    r = np.random.RandomState(0)
    Hp = H if tiles <= 1 else -(-H // (8 * tiles)) * (8 * tiles)
    x1 = jnp.asarray(r.rand(batch, H, W, 1), jnp.float32)
    x2 = jnp.asarray(r.rand(batch, H, W, 1), jnp.float32)
    # init at a small spatial size: param shapes are H/W-independent, and a
    # full-res f32 init forward OOMs HBM for the heavy nest/FS decoders
    # (MAFusion/Res2Fusion) before the bf16 bench even starts
    variables = model.init(jax.random.PRNGKey(0), x1[:1, :256, :256],
                           x2[:1, :256, :256], train=False)
    variables = jax.tree.map(lambda p: p.astype(dtype), variables)
    x2 = x2.astype(dtype)
    if tiles > 1:
        from multi_modal_image_fusion_tpu.parallel.tiling import \
            tiled_forward

        def fwd(a, b):
            pad = ((0, 0), (0, Hp - H), (0, 0), (0, 0))
            a = jnp.pad(a, pad, mode="reflect")
            b = jnp.pad(b, pad, mode="reflect")
            return tiled_forward(model, variables, a, b, tiles)[:, :H]
    else:
        def fwd(a, b):
            return model.apply(variables, a, b, train=False)

    # BENCH_INT8=1 (or INT8_DEFAULT, flipped by tools/r4_autoflip_int8.py
    # once the acceptance harness + both headline legs prove it): post-
    # training int8 inference (ops/quant.py) — calibrate per-layer
    # activation amax on a small slice (random data; the point is the
    # kernel path, not the statistics), then run the timed region under
    # quantized_inference so eligible convs hit the int8 MXU kernels
    # (ops/pallas/hiw_int8.py through the chain). The accuracy contract
    # stays the BASELINE.json budget: SSIM/Qabf within 1e-3 of bf16
    # (tools/int8_acceptance.py).
    qctx = None
    int8_on = os.environ.get("BENCH_INT8")
    if int8_on is None:
        int8_on = INT8_DEFAULT
    else:
        int8_on = int8_on not in ("", "0")
    if int8_on:
        from multi_modal_image_fusion_tpu.ops.quant import (
            calibrate, default_skip, quantized_inference)

        amax = calibrate(model, variables,
                         [(x1[:1, :256, :256].astype(dtype),
                           x2[:1, :256, :256].astype(dtype))])
        qctx = quantized_inference(amax, skip=default_skip(model_name))

    @functools.partial(jax.jit, static_argnames="n")
    def bench_loop(a, b, n):
        def body(i, carry):
            a, s = carry
            y = fwd(a, b)
            m = y.mean()      # depends on every output element: no DCE
            a = a + m.astype(a.dtype) * jnp.asarray(1e-6, a.dtype)
            return a, s + m.astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, (a, jnp.float32(0.0)))

    import contextlib
    with fast_inference(), (qctx or contextlib.nullcontext()):
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


def main_train():
    os.environ.setdefault("MMIF_COMPILE_CACHE",
                          os.path.expanduser("~/.cache/mmif_xla_cache"))
    import jax
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.models import create_model
    from multi_modal_image_fusion_tpu.train.schedules import make_lr_schedule
    from multi_modal_image_fusion_tpu.train.trainer import Trainer
    from multi_modal_image_fusion_tpu.utils.compile_cache import \
        enable_compilation_cache

    enable_compilation_cache()

    on_tpu = jax.devices()[0].platform == "tpu"
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    size = int(os.environ.get("BENCH_PATCH", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "50" if on_tpu else "3"))
    model_name = os.environ.get("BENCH_MODEL", "deepfuse")

    model = create_model(model_name)
    schedule = make_lr_schedule(1e-4, steps_per_epoch=1000, num_epochs=12)
    # BENCH_FAST_TRAIN=1 routes the convs through the differentiable Pallas
    # kernel (ops/pallas/conv_vjp); BENCH_AMP=bf16 runs the model compute
    # in bf16 with f32 master params/loss/Adam (train/trainer.py amp)
    trainer = Trainer(model, schedule,
                      fast=bool(os.environ.get("BENCH_FAST_TRAIN")),
                      amp=os.environ.get("BENCH_AMP") or None)

    r = np.random.RandomState(0)
    img1 = jnp.asarray(r.rand(batch, size, size, 1), jnp.float32)
    img2 = jnp.asarray(r.rand(batch, size, size, 1), jnp.float32)
    state = trainer.init_state(jax.random.PRNGKey(0), (img1, img2))

    # n chained train steps inside ONE jit: each step consumes the previous
    # state (serial by construction, DCE-proof — the updated params feed the
    # next forward), timed region closed by a param-scalar fetch.
    @functools.partial(jax.jit, static_argnames="n")
    def bench_loop(state, a, b, n):
        def body(i, st):
            return trainer._train_step_impl(st, a, b)[0]
        return jax.lax.fori_loop(0, n, body, state)

    from multi_modal_image_fusion_tpu.ops.layers import fast_training

    with fast_training(trainer.fast):   # scope must be live at trace time
        out = bench_loop(state, img1, img2, iters)   # compile + warmup
    float(jax.tree.leaves(out.params)[0].reshape(-1)[0])

    img1 = jnp.asarray(r.rand(batch, size, size, 1), jnp.float32)
    jax.block_until_ready(img1)
    start = time.perf_counter()
    out = bench_loop(state, img1, img2, iters)
    float(jax.tree.leaves(out.params)[0].reshape(-1)[0])
    elapsed = time.perf_counter() - start

    steps_per_sec = iters / elapsed
    print(json.dumps({
        "metric": "train_step_throughput",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "pairs_per_sec": round(steps_per_sec * batch, 1),
        "config": f"{model_name} bs{batch} {size}x{size}",
    }))


if __name__ == "__main__":
    if os.environ.get("BENCH_MODE") == "train":
        main_train()
    else:
        main()
