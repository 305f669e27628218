"""Time the s2d packed chain's enter/exit glue at headline shapes.

The packed DeepFuse path (zoo.py DeepFuse, MMIF_S2D=1) enters the guard
layout via `chain_enter(s2d_pack(x))` and leaves via
`s2d_unpack(chain_exit(t))`; with c=4 packed channels both take
chain_enter/exit's XLA fallback (transpose + zeros +
dynamic_update_slice) rather than the grayscale Pallas strip kernels.
This probe measures that glue in isolation so we know whether a packed
(c=4) strip-copy kernel is worth building (memory: round-4 candidate).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_s2d_io.py
env: B (16), H (1224), W (1024), ITERS (20), CPU (0: smoke on host)
"""

import functools
import os
import time

import numpy as np


def main():
    import jax

    if bool(int(os.environ.get("CPU", "0"))):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.ops.pallas.conv_kernel import (
        chain_enter, chain_exit, chain_shape)
    from multi_modal_image_fusion_tpu.ops.s2d import s2d_pack, s2d_unpack

    B = int(os.environ.get("B", "16"))
    H = int(os.environ.get("H", "1224"))
    W = int(os.environ.get("W", "1024"))
    iters = int(os.environ.get("ITERS", "20"))

    r = np.random.RandomState(0)
    # siamese batch: 2B grayscale images in, B fused images out
    x = jnp.asarray(r.rand(2 * B, H, W, 1), jnp.bfloat16)
    hg, wp = chain_shape(H // 2, W // 2)
    t_in = jnp.asarray(r.rand(B, 4, hg, wp), jnp.bfloat16)

    def timed(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        float(jnp.asarray(out).astype(jnp.float32).mean())  # compile+fence
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(*[a + jnp.asarray(i * 1e-6, a.dtype) for a in args])
        float(jnp.asarray(out).astype(jnp.float32).mean())
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:34s} {dt*1e3:7.2f} ms", flush=True)
        return dt

    te = timed("enter: s2d_pack + chain_enter", lambda v: chain_enter(
        s2d_pack(v, 2)), x)
    tx = timed("exit: chain_exit + s2d_unpack", lambda v: s2d_unpack(
        chain_exit(v, H // 2, W // 2), 2), t_in)
    # the packed Pallas strip kernels (ops/pallas/s2d_io.py)
    from multi_modal_image_fusion_tpu.ops.pallas.s2d_io import (
        s2d_chain_enter, s2d_chain_exit, s2d_io_ok)
    interp = bool(int(os.environ.get("CPU", "0")))   # smoke only
    tke = tkx = None
    if s2d_io_ok(H, W, jnp.bfloat16):
        tke = timed("enter: s2d_io Pallas kernel", functools.partial(
            s2d_chain_enter, interpret=interp), x)
        tkx = timed("exit: s2d_io Pallas kernel", functools.partial(
            s2d_chain_exit, h=H, w=W, interpret=interp), t_in)
    # reference points: the grayscale Pallas enter on the same bytes, and
    # the unpacked XLA exit at c=1
    timed("gray Pallas enter (same bytes)", chain_enter, x)
    to = timed("gray exit at c=1 (B out imgs)", functools.partial(
        chain_exit, h=H, w=W),
        jnp.asarray(r.rand(B, 1, *chain_shape(H, W)), jnp.bfloat16))
    print(f"\npacked enter+exit glue: XLA {(te + tx)*1e3:.2f} ms/batch"
          + (f", Pallas {(tke + tkx)*1e3:.2f} ms/batch"
             if tke and tkx else "")
          + f" (gray exit ref {to*1e3:.2f})", flush=True)


if __name__ == "__main__":
    main()
