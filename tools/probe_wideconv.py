"""A/B probe: formulations for the very-wide chain-fallback convs.

MAFusion's FSDecoder DB1 (concat 960 -> hid 480, k3, full res) is 10.4
TFLOP/image — ~80% of the model's FLOPs — and currently runs through the
XLA NCHW fallback in ConvLayer's chain branch (layers.py wide-layer ladder).
TPU XLA lowers NHWC convs better than NCHW ones; this probe measures:

  nchw       conv_general_dilated NCHW (what the fallback does today)
  nhwc       transpose -> NHWC conv -> transpose back (costs included)
  nhwc_pure  NHWC conv with no transposes (layout ceiling)
  shift9     k*k shifted [C_in x C_out] matmuls accumulated in f32

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_wideconv.py
env: B (1), H (1224), W (1024), CIN (960), COUT (480), K (3), ITERS (10)
"""

import functools
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    B = int(os.environ.get("B", "1"))
    H = int(os.environ.get("H", "1224"))
    W = int(os.environ.get("W", "1024"))
    cin = int(os.environ.get("CIN", "960"))
    cout = int(os.environ.get("COUT", "480"))
    k = int(os.environ.get("K", "3"))
    iters = int(os.environ.get("ITERS", "10"))
    p = k // 2
    r = np.random.RandomState(0)

    # operands are pre-padded (the chain guard tensor already carries the
    # halo), so every variant runs a VALID conv of the same math
    x_nchw = jnp.asarray(r.rand(B, cin, H + 2 * p, W + 2 * p) - 0.5,
                         jnp.bfloat16)
    x_nhwc = jnp.asarray(np.moveaxis(np.asarray(x_nchw, np.float32), 1, -1),
                         jnp.bfloat16)
    w_hwio = jnp.asarray(r.rand(k, k, cin, cout) - 0.5, jnp.bfloat16)

    def f_nchw(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NCHW", "HWIO", "NCHW"))

    def f_nhwc(x, w):
        y = jax.lax.conv_general_dilated(
            jnp.moveaxis(x, 1, -1), w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.moveaxis(y, -1, 1)

    def f_nhwc_pure(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def f_shift9(x, w):
        y = None
        for kh in range(k):
            for kw in range(k):
                xs = x[:, :, kh:kh + H, kw:kw + W]
                yi = jnp.einsum("bihw,io->bohw", xs, w[kh, kw],
                                preferred_element_type=jnp.float32)
                y = yi if y is None else y + yi
        return y.astype(x.dtype)

    variants = [("nchw", f_nchw, x_nchw), ("nhwc", f_nhwc, x_nchw),
                ("nhwc_pure", f_nhwc_pure, x_nhwc),
                ("shift9", f_shift9, x_nchw)]
    flops = 2.0 * B * H * W * k * k * cin * cout
    for name, fn, x in variants:
        @functools.partial(jax.jit, static_argnames="n")
        def loop(x, w, n, fn=fn):
            def body(i, carry):
                x, s = carry
                m = fn(x, w).astype(jnp.float32).mean()
                bump = jnp.where(m > 1e30, 1, 0).astype(x.dtype)
                return x + bump, s + m
            return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))

        try:
            t0 = time.perf_counter()
            out = loop(x, w_hwio, iters)
            float(out[1])
            cs = time.perf_counter() - t0
            x2 = x + jnp.asarray(1e-3, x.dtype)
            t0 = time.perf_counter()
            out = loop(x2, w_hwio, iters)
            m = float(out[1])
            dt = (time.perf_counter() - t0) / iters
            print(f"{name:10s} {dt*1e3:8.2f} ms {flops/dt/1e12:6.2f} TF "
                  f"sum={m:.4f} (compile {cs:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name:10s} FAILED: {str(e).splitlines()[0][:140]}",
                  flush=True)


if __name__ == "__main__":
    main()
