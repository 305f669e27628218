"""Train-step breakdown at the reference config (VERDICT r3 item #3 data).

The reference's hot loop (train.py:37-133) is the bs16 64x64-patch train
step. Round 3 measured 229 steps/s (XLA convs) and 237 with the Pallas
loss stack, but never located where the remaining time goes or what the
ceiling is. This probe times the step's components separately — forward,
loss-given-output, value_and_grad, full step — and prints the XLA
cost_analysis FLOPs of the full step so the steps/s ceiling is explicit:

    roofline steps/s = achievable FLOP rate / (flops per step)

It also times a bf16-compute variant of forward+backward (params/inputs
cast at the boundary, f32 loss accumulation) to quantify the
mixed-precision opportunity the f32 reference recipe leaves on the MXU.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_train_step.py
env: BENCH_MODEL (deepfuse), BENCH_BATCH (16), BENCH_PATCH (64),
     ITERS (50 on tpu / 3 cpu), TRACE=1 to also dump a jax.profiler trace
     to /tmp/mmif_train_trace
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed(fn, fence, iters):
    """Compile+warm, then time ITERS chained calls, fenced by value fetch."""
    out = fn()
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.models import create_model
    from multi_modal_image_fusion_tpu.train.schedules import make_lr_schedule
    from multi_modal_image_fusion_tpu.train.trainer import (Trainer,
                                                            make_loss_bundle)

    on_tpu = jax.devices()[0].platform == "tpu"
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    size = int(os.environ.get("BENCH_PATCH", "64"))
    iters = int(os.environ.get("ITERS", "50" if on_tpu else "3"))
    model_name = os.environ.get("BENCH_MODEL", "deepfuse")

    model = create_model(model_name)
    schedule = make_lr_schedule(1e-4, steps_per_epoch=1000, num_epochs=12)
    trainer = Trainer(model, schedule)
    bundle = make_loss_bundle()

    r = np.random.RandomState(0)
    img1 = jnp.asarray(r.rand(batch, size, size, 1), jnp.float32)
    img2 = jnp.asarray(r.rand(batch, size, size, 1), jnp.float32)
    state = trainer.init_state(jax.random.PRNGKey(0), (img1, img2))
    params = state.params

    results = {}

    # 1. forward only (train-mode apply, loss-free)
    fwd = jax.jit(lambda p, a, b: model.apply(
        {"params": p}, a, b, train=True).mean())
    results["forward"] = timed(lambda: fwd(params, img1, img2),
                               lambda o: float(o), iters)

    # 2. loss bundle given a fixed output (SSIM + pixel + grad windows)
    imgf = jax.jit(lambda p, a, b: model.apply(
        {"params": p}, a, b, train=True))(params, img1, img2)
    loss_only = jax.jit(lambda a, b, f: bundle(a, b, f)[0])
    results["loss_given_fwd"] = timed(
        lambda: loss_only(img1, img2, imgf), lambda o: float(o), iters)

    # 3. forward+loss+backward (no optimizer)
    def loss_fn(p, a, b):
        return bundle(a, b, model.apply({"params": p}, a, b,
                                        train=True))[0]

    vag = jax.jit(jax.value_and_grad(loss_fn))
    results["grad"] = timed(lambda: vag(params, img1, img2),
                            lambda o: float(o[0]), iters)

    # 4. full train step (grad + clip + adam + apply)
    step = jax.jit(lambda st, a, b: trainer._train_step_impl(st, a, b)[0])
    results["full_step"] = timed(
        lambda: step(state, img1, img2),
        lambda st: float(jax.tree.leaves(st.params)[0].reshape(-1)[0]),
        iters)

    # 5. bf16-compute fwd+bwd: the mixed-precision opportunity
    bf_params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    def loss_bf(p, a, b):
        out = model.apply({"params": p}, a.astype(jnp.bfloat16),
                          b.astype(jnp.bfloat16), train=True)
        return bundle(a, b, out.astype(jnp.float32))[0]

    vag_bf = jax.jit(jax.value_and_grad(loss_bf))
    results["grad_bf16"] = timed(lambda: vag_bf(bf_params, img1, img2),
                                 lambda o: float(o[0]), iters)

    # FLOP accounting for the ceiling
    cost = step.lower(state, img1, img2).compile().cost_analysis()
    flops = float(cost.get("flops", 0.0))
    bytes_ = float(cost.get("bytes accessed", 0.0))

    print(f"config: {model_name} bs{batch} {size}x{size} f32, "
          f"iters={iters}")
    for k in ("forward", "loss_given_fwd", "grad", "full_step",
              "grad_bf16"):
        ms = results[k] * 1e3
        print(f"  {k:16s} {ms:8.3f} ms   {1.0 / results[k]:8.1f}/s")
    tf_eff = flops / results["full_step"] / 1e12
    print(f"  cost_analysis: {flops / 1e9:.2f} GFLOP/step, "
          f"{bytes_ / 1e6:.1f} MB accessed, achieved {tf_eff:.1f} TFLOPS")
    print(json.dumps({
        "metric": "train_breakdown",
        "config": f"{model_name} bs{batch} {size}x{size}",
        "ms": {k: round(v * 1e3, 3) for k, v in results.items()},
        "gflop_per_step": round(flops / 1e9, 2),
        "mb_per_step": round(bytes_ / 1e6, 1),
        "achieved_tflops": round(tf_eff, 2),
    }))

    if os.environ.get("TRACE"):
        with jax.profiler.trace("/tmp/mmif_train_trace"):
            out = step(state, img1, img2)
            float(jax.tree.leaves(out.params)[0].reshape(-1)[0])
        print("trace written to /tmp/mmif_train_trace")


if __name__ == "__main__":
    main()
