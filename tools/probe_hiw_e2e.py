"""TPU end-to-end check of the H-major halo-in-weights DeepFuse chain.

Runs the whole DeepFuse forward twice on device — production C-major
chain vs MMIF_CHAIN_HIW H-major chain — and prints the relative maxdiff
(bf16 formulation noise; both accumulate in f32). Prints the
'hiw TPU parity OK' marker tools/r4_autoflip.py gates the default flip
on. Then times both at the headline config (honest protocol: fori_loop-
chained iters on y.mean(), value-fetch fence, warm second call).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_hiw_e2e.py
env: B (16), H (1224), W (1024), ITERS (10), SMALL (0)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.models import create_model
    from multi_modal_image_fusion_tpu.ops import layers as L

    small = bool(int(os.environ.get("SMALL", "0")))
    B = int(os.environ.get("B", "2" if small else "16"))
    H = int(os.environ.get("H", "256" if small else "1224"))
    W = int(os.environ.get("W", "256" if small else "1024"))
    iters = int(os.environ.get("ITERS", "10"))

    r = np.random.RandomState(0)
    model = create_model("deepfuse")
    init1 = jnp.asarray(r.rand(1, 64, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), init1, init1, train=False)
    variables = jax.tree.map(lambda v: v.astype(jnp.bfloat16), variables)

    img1 = jnp.asarray(r.rand(B, H, W, 1), jnp.bfloat16)
    img2 = jnp.asarray(r.rand(B, H, W, 1), jnp.bfloat16)

    def fwd():
        @jax.jit
        def f(a, b):
            with L.fast_inference():
                return model.apply(variables, a, b, train=False)
        return f

    # --- parity: C-major default vs H-major hiw, small batch first
    os.environ["MMIF_CHAIN_HIW"] = "0"
    y0 = np.asarray(fwd()(img1[:2], img2[:2]), np.float32)
    os.environ["MMIF_CHAIN_HIW"] = "1"
    y1 = np.asarray(fwd()(img1[:2], img2[:2]), np.float32)
    scale = np.abs(y0).max() + 1e-8
    rel = np.abs(y1 - y0).max() / scale
    print(f"hiw vs cmajor relative maxdiff: {rel:.3e}", flush=True)
    if rel < 2e-2:
        print("hiw TPU parity OK", flush=True)
    else:
        print("hiw TPU parity FAIL", flush=True)

    # --- timing both paths at the headline config
    for name, env in (("cmajor", "0"), ("hiw", "1")):
        os.environ["MMIF_CHAIN_HIW"] = env
        f = fwd()

        @functools.partial(jax.jit, static_argnames="n")
        def loop(a, b, n, f=f):
            def body(i, carry):
                a, s = carry
                m = f(a, b).astype(jnp.float32).mean()
                bump = jnp.where(m > 1e30, 1, 0).astype(a.dtype)
                return a + bump, s + m
            return jax.lax.fori_loop(0, n, body, (a, jnp.float32(0.0)))

        t0 = time.perf_counter()
        out = loop(img1, img2, iters)
        float(out[1])
        cs = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = loop(img1 + jnp.asarray(1e-3, img1.dtype), img2, iters)
        float(out[1])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:8s} {dt * 1e3:8.2f} ms  {B / dt:7.2f} pairs/s "
              f"(compile+first {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
