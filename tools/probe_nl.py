"""Probe: flash nl-attention kernel vs the scanned XLA streaming path.

Res2Fusion's 'nl' spatial attention at full res (reference
core/fusion.py:84-117): q (B, 1224*1024, 112) x pooled k (B, 19584, 112).
The XLA path (`fusion._nl_spatial_blocked`) round-trips each energy block
through HBM three times; `nl_kernel.nl_spatial_flash` keeps energy tiles
VMEM-resident. Honest protocol: per-iter input perturbation (defeats the
relay result cache), per-iter float() fence.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_nl.py
env: B (1), H (1224), W (1024), C (112), ITERS (5)
"""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.ops.fusion import _nl_spatial_blocked
    from multi_modal_image_fusion_tpu.ops.pallas.nl_kernel import (
        nl_spatial_flash)

    B = int(os.environ.get("B", "1"))
    H = int(os.environ.get("H", "1224"))
    W = int(os.environ.get("W", "1024"))
    C = int(os.environ.get("C", "112"))
    iters = int(os.environ.get("ITERS", "5"))
    n, m = H * W, (H // 8) * (W // 8)

    r = np.random.RandomState(0)
    q = jnp.asarray(r.rand(B, n, C) * 2 - 1, jnp.bfloat16)
    k = jnp.asarray(r.rand(B, m, C) * 2 - 1, jnp.bfloat16)

    flops = 3 * 2 * B * n * m * C   # minmax dot + apply dot + pv dot

    def bench(name, fn):
        run = jax.jit(lambda q, k, s: fn(q + s, k).astype(
            jnp.float32).mean())
        t0 = time.perf_counter()
        out0 = float(run(q, k, jnp.bfloat16(0)))
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s "
              f"mean={out0:.5f}", flush=True)
        t0 = time.perf_counter()
        for i in range(iters):
            float(run(q, k, jnp.bfloat16((i + 1) * 2 ** -10)))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt * 1e3:.1f} ms  {flops / dt / 1e12:.1f} TF",
              flush=True)
        return dt

    # flash first but don't let a Mosaic rejection kill the probe — the
    # blocked baseline number is still wanted
    d_flash = None
    try:
        d_flash = bench("flash ", lambda q, k: nl_spatial_flash(q, k))
    except Exception as e:
        print(f"flash FAILED: {str(e).splitlines()[0][:200]}", flush=True)
    # block-size sweep: bn trades grid overhead vs VMEM residency
    for bn in (256, 1024):
        try:
            bench(f"flash bn={bn}",
                  lambda q, k, bn=bn: nl_spatial_flash(q, k, bn=bn))
        except Exception as e:
            print(f"flash bn={bn} FAILED: {str(e).splitlines()[0][:160]}",
                  flush=True)
    d_block = bench("blocked", lambda q, k: _nl_spatial_blocked(q, k))
    if d_flash:
        print(f"speedup: {d_block / d_flash:.2f}x", flush=True)

        # compiled-path parity (same inputs, bf16 tolerance)
        a = nl_spatial_flash(q, k).astype(jnp.float32)
        b = _nl_spatial_blocked(q, k).astype(jnp.float32)
        ref = float(jnp.abs(b).max())
        print("compiled rel maxdiff: "
              f"{float(jnp.abs(a - b).max()) / ref:.2e}", flush=True)


if __name__ == "__main__":
    main()
