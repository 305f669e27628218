"""Microbenchmark: Pallas conv kernels vs XLA conv at the zoo's hot shapes.

On-device fori_loop timing with input chaining (see docs/PERFORMANCE.md
"Benchmark protocol" for why host-side loops lie on this platform).

Usage: python tools/bench_conv.py [variant ...]
  variants: xla tlane2 tlane sgemm   (default: xla tlane2)
env: ROWS, KWCHUNK, SHAPES ("k,cin,cout[;...]"), B, H, W
"""

import functools
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import pallas_archive as ck

    variants = sys.argv[1:] or ["xla", "tlane2"]
    B = int(os.environ.get("B", "8"))
    H = int(os.environ.get("H", "1224"))
    W = int(os.environ.get("W", "1024"))
    rows = int(os.environ.get("ROWS", "8"))
    kw_chunk = int(os.environ.get("KWCHUNK", "4"))
    shapes = os.environ.get("SHAPES", "7,32,32;7,16,32;5,32,16")
    iters = int(os.environ.get("ITERS", "10"))

    def xla_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def make_fn(variant, k):
        if variant == "xla":
            return xla_conv
        if variant == "tlane2":
            return functools.partial(ck.conv_tlane_gemm, k=k, rows=rows,
                                     kw_chunk=kw_chunk)
        if variant == "tlane":
            return functools.partial(ck.conv_shifted_gemm_tlane, k=k,
                                     rows=rows)
        if variant == "sgemm":
            return functools.partial(ck.conv_shifted_gemm, k=k, rows=rows)
        raise SystemExit(f"unknown variant {variant}")

    for spec in shapes.split(";"):
        k, cin, cout = map(int, spec.split(","))
        r = np.random.RandomState(0)
        x = jnp.asarray(r.rand(B, H + k - 1, W + k - 1, cin),
                        jnp.bfloat16)
        wgt = jnp.asarray(r.rand(k, k, cin, cout) - 0.5, jnp.bfloat16)
        flops = 2.0 * B * H * W * k * k * cin * cout

        ref = None
        for variant in variants:
            fn = make_fn(variant, k)

            @functools.partial(jax.jit, static_argnames="n")
            def loop(x, w, n, fn=fn):
                def body(i, carry):
                    x, s = carry
                    # chain on y.mean(): depends on EVERY output element, so
                    # XLA cannot dead-code-eliminate any part of the conv
                    m = y_mean = fn(x, w).mean()
                    x = x + m.astype(x.dtype) * jnp.asarray(1e-6, x.dtype)
                    return x, s + m.astype(jnp.float32)
                return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))

            try:
                t0 = time.perf_counter()
                out = loop(x, wgt, iters)
                jax.block_until_ready(out)
                compile_s = time.perf_counter() - t0
                x2 = x + jnp.asarray(1e-3, x.dtype)
                t0 = time.perf_counter()
                out = loop(x2, wgt, iters)
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / iters
                # numeric check vs XLA (single call)
                y = fn(x, wgt)
                if variant == "xla":
                    ref = y
                    err = 0.0
                elif ref is not None:
                    err = float(jnp.abs(y.astype(jnp.float32) -
                                        ref.astype(jnp.float32)).max())
                else:
                    err = float("nan")
                print(f"k{k} c{cin}->{cout} {variant:7s} "
                      f"{dt*1e3:8.2f} ms  {flops/dt/1e12:7.2f} TFLOPS  "
                      f"maxdiff {err:.3e}  (compile {compile_s:.0f}s)",
                      flush=True)
            except Exception as e:
                msg = str(e).split("\n")[0][:160]
                print(f"k{k} c{cin}->{cout} {variant:7s} FAILED: {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
