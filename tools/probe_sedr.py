"""SEDRFuse hot-op decision probe (VERDICT r3 item #4: chain coverage).

SEDRFuse (reference core/model.py:247-316) is outside the chain-conv
contract: stride-2 GroupNorm encoder convs and stride-2 transpose
decoder convs. This probe times, at the real full-res shapes:

  1. transpose conv 256->128 @ 306x256 and 128->64 @ 612x512:
     lhs-dilated XLA vs the subpixel phase decomposition
     (ops/layers.transpose_conv_s2) — decides the default (already
     flipped in layers.py; this validates the win + parity on TPU).
  2. stride-2 conv 64->128 @ 1224x1024 and 128->256 @ 612x512:
     XLA strided conv vs space-to-depth + dense k2 stride-1 conv
     (phase-packed channels; 16/9 FLOP overhead but dense dots).
  3. the full sedrfuse forward, b8 full-res, honest protocol.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_sedr.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bench(f, *args, iters=20):
    y = f(*args)
    y.block_until_ready()
    float(y.reshape(-1)[0])          # value fetch: the only honest fence
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(*args)
    float(y.astype(np.float32).mean())
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.ops.layers import transpose_conv_s2

    r = np.random.RandomState(0)
    dt = jnp.bfloat16

    # ---- 1. transpose conv, both decoder shapes
    for (h, w, ci, co) in [(306, 256, 256, 128), (612, 512, 128, 64)]:
        x = jnp.asarray(r.rand(8, h, w, ci), dt)
        k = jnp.asarray(r.rand(3, 3, ci, co) - 0.5, dt)

        @jax.jit
        def dil(x, k):
            return jax.lax.conv_general_dilated(
                x, jnp.flip(k, axis=(0, 1)), (1, 1), ((1, 2), (1, 2)),
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        sub = jax.jit(transpose_conv_s2)
        td = bench(dil, x, k)
        ts = bench(sub, x, k)
        y0 = np.asarray(dil(x, k), np.float32)
        y1 = np.asarray(sub(x, k), np.float32)
        rel = np.abs(y1 - y0).max() / (np.abs(y0).max() + 1e-8)
        print(f"deconv {ci}->{co} @{h}x{w}: lhs-dilated {td*1e3:8.2f} ms"
              f"  subpixel {ts*1e3:8.2f} ms  ({td/ts:.2f}x, rel {rel:.1e})",
              flush=True)

    # ---- 2. stride-2 conv, both encoder shapes
    for (h, w, ci, co) in [(1224, 1024, 64, 128), (612, 512, 128, 256)]:
        x = jnp.asarray(r.rand(8, h, w, ci), dt)
        k = jnp.asarray(r.rand(3, 3, ci, co) - 0.5, dt)

        @jax.jit
        def strided(x, k):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                         mode="reflect")
            return jax.lax.conv_general_dilated(
                xp, k, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def s2d_dense(x, k):
            # out[o] = sum_t w[t] xp[2o+t]: pack xp parity phases as
            # channels, conv k=2 stride-1 dense (7 of 16 taps are zero)
            b, hh, ww, c = x.shape
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                         mode="reflect")
            xp = jnp.pad(xp, ((0, 0), (0, 1), (0, 1), (0, 0)))
            ph = [xp[:, di::2, dj::2, :][:, :hh // 2 + 1, :ww // 2 + 1]
                  for di in (0, 1) for dj in (0, 1)]
            xpk = jnp.concatenate(ph, axis=-1)       # (b, h/2+1, w/2+1, 4c)
            kk = jnp.zeros((2, 2, 4 * c, k.shape[-1]), x.dtype)
            # tap (th, tw) of the k3 kernel reads phase (th%2, tw%2) at
            # half-res offset (th//2, tw//2)
            for th in range(3):
                for tw in range(3):
                    p = (th % 2) * 2 + (tw % 2)
                    kk = kk.at[th // 2, tw // 2,
                               p * c:(p + 1) * c, :].set(k[th, tw])
            return jax.lax.conv_general_dilated(
                xpk, kk, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        ts_ = bench(strided, x, k)
        t2 = bench(s2d_dense, x, k)
        y0 = np.asarray(strided(x, k), np.float32)
        y1 = np.asarray(s2d_dense(x, k), np.float32)
        rel = np.abs(y1 - y0).max() / (np.abs(y0).max() + 1e-8)
        print(f"stride2 {ci}->{co} @{h}x{w}: strided {ts_*1e3:8.2f} ms"
              f"  s2d-dense {t2*1e3:8.2f} ms  ({ts_/t2:.2f}x, rel {rel:.1e})",
              flush=True)


if __name__ == "__main__":
    main()
