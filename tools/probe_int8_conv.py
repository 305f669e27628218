"""int8 vs bf16 conv kernel at the production layer shape (decisive
measurement for the quantized inference path, docs/PERFORMANCE.md round 3).

Times conv_tlane_dma (bf16, rows=16 — the production config measured at
35 TF) against conv_tlane_dma_q (int8 x int8 -> int32, rows=32 per int8
tiling) with the honest on-device chained protocol.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_int8_conv.py
env: B, H, W, SHAPES ("k,cin,cout[;...]"), ITERS
"""

import functools
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.ops.pallas.conv_int8 import (
        conv_tlane_dma_q, quantize_input, quantize_weights)
    from multi_modal_image_fusion_tpu.ops.pallas.conv_kernel import (
        conv_tlane_dma)

    B = int(os.environ.get("B", "8"))
    H = int(os.environ.get("H", "1224"))
    W = int(os.environ.get("W", "1024"))
    iters = int(os.environ.get("ITERS", "10"))
    shapes = os.environ.get("SHAPES", "7,32,32;5,32,16")

    for spec in shapes.split(";"):
        k, cin, cout = map(int, spec.split(","))
        r = np.random.RandomState(0)
        xf = jnp.asarray(r.rand(B, H + k - 1, W + k - 1, cin) - 0.5,
                         jnp.float32)
        wf = jnp.asarray(r.rand(k, k, cin, cout) - 0.5, jnp.float32)
        wq, sw = quantize_weights(wf)
        xq, sx = quantize_input(xf)
        scale = np.asarray(sx * sw, np.float32)
        flops = 2.0 * B * H * W * k * k * cin * cout

        def fn_bf16(x, w, k=k):
            return conv_tlane_dma(x, w, k, rows=16)

        def fn_int8(x, w, k=k, scale=scale):
            return conv_tlane_dma_q(x, w, jnp.asarray(scale), k, rows=32,
                                    out_dtype=jnp.bfloat16)

        configs = [
            ("bf16 r16", fn_bf16, xf.astype(jnp.bfloat16),
             wf.astype(jnp.bfloat16)),
            ("int8 r32", fn_int8, xq, wq),
        ]
        ref = None
        for name, fn, x, w in configs:

            @functools.partial(jax.jit, static_argnames="n")
            def loop(x, w, n, fn=fn):
                def body(i, carry):
                    x, s = carry
                    m = fn(x, w).astype(jnp.float32).mean()
                    # data-dependent zero bump: keeps each iteration
                    # dependent without being constant-foldable
                    bump = jnp.where(m > 1e30, 1, 0).astype(x.dtype)
                    return x + bump, s + m
                return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))

            try:
                t0 = time.perf_counter()
                out = loop(x, w, iters)
                float(out[1])
                compile_s = time.perf_counter() - t0
                if x.dtype == jnp.int8:
                    x2 = jnp.clip(x.astype(jnp.int32) + 1, -127,
                                  127).astype(jnp.int8)
                else:
                    x2 = x + jnp.asarray(1e-3, x.dtype)
                t0 = time.perf_counter()
                out = loop(x2, w, iters)
                float(out[1])
                dt = (time.perf_counter() - t0) / iters
                y = fn(x, w).astype(jnp.float32)
                if ref is None:
                    ref = y
                    err = 0.0
                else:
                    err = float(jnp.abs(y - ref).max() / jnp.abs(ref).max())
                print(f"k{k} c{cin}->{cout} {name:9s} {dt*1e3:8.2f} ms  "
                      f"{flops/dt/1e12:7.2f} T(FL)OPS  rel-err {err:.3e}  "
                      f"(compile {compile_s:.0f}s)", flush=True)
            except Exception as e:
                msg = str(e).split("\n")[0][:200]
                print(f"k{k} c{cin}->{cout} {name:9s} FAILED: {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
