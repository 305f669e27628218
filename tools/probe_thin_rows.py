"""Rows sweep for the latency-bound thin chain layers (enc0 1->16, dec2
16->1): these are DMA-latency-serialized (tiny strips), so bigger rows
(fewer, larger DMAs) should win — unlike the fat layers where rows=16 is
the measured optimum (VPU-bound, smaller strips pipeline better).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_thin_rows.py
"""

import functools
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.ops.pallas.conv_kernel import (
        chain_shape, conv_tlane_chain)

    B = int(os.environ.get("B", "16"))
    H = int(os.environ.get("H", "1224"))
    W = int(os.environ.get("W", "1024"))
    iters = int(os.environ.get("ITERS", "10"))
    hg, wp = chain_shape(H, W)
    r = np.random.RandomState(0)

    shapes = [("enc0 1->16 k5", 1, 16, 5, 2 * B),
              ("dec2 16->1 k5", 16, 1, 5, B),
              ("dec1 32->16 k5", 32, 16, 5, B)]
    for name, cin, cout, k, b in shapes:
        x = jnp.asarray(r.rand(b, cin, hg, wp) - 0.5, jnp.bfloat16)
        w = jnp.asarray(r.rand(k, k, cin, cout) - 0.5, jnp.bfloat16)
        for rows in (16, 32, 64, 128):
            fn = functools.partial(conv_tlane_chain, k=k, h=H, w_valid=W,
                                   act="relu", rows=rows, halo=True)

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
                out = loop(x, w, iters)
                float(out[1])
                cs = time.perf_counter() - t0
                x2 = x + jnp.asarray(1e-3, x.dtype)
                t0 = time.perf_counter()
                out = loop(x2, w, iters)
                float(out[1])
                dt = (time.perf_counter() - t0) / iters
                flops = 2.0 * b * H * W * k * k * cin * cout
                print(f"{name:16s} rows={rows:3d} {dt*1e3:8.2f} ms "
                      f"{flops/dt/1e12:6.2f} TF (compile {cs:.0f}s)",
                      flush=True)
            except Exception as e:
                print(f"{name:16s} rows={rows:3d} FAILED: "
                      f"{str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
