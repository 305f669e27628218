"""A/B probe: chain-conv kw epilogue variants (acc_ref RMW vs SSA roll-sum).

The chain conv kernel is VMEM-bandwidth-bound (docs/PERFORMANCE.md: the dot
is ~10% of the strip critical path at 35 TF). The kw epilogue's acc_ref
init + k-1 in-place slice-adds cost ~31 MB/strip of VPU traffic at
k7/c32/rows16; the 'ssa' variant sums the k lane-shifted partial-product
slices as one SSA roll-expression fused into the staging write (no
accumulator buffer). This probe measures both at the DeepFuse hot shapes,
plus a rows sweep under 'ssa'.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_epilogue.py
env: B (16), H (1224), W (1024), ITERS (10), ROWS ("16" or "16,32")
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
    rows_list = [int(r) for r in os.environ.get("ROWS", "16,32").split(",")]
    hg, wp = chain_shape(H, W)
    r = np.random.RandomState(0)

    shapes = [("enc1 16->32 k7", 16, 32, 7, 2 * B),
              ("dec0 32->32 k7", 32, 32, 7, B),
              ("dec1 32->16 k5", 32, 16, 5, B)]
    for name, cin, cout, k, b in shapes:
        x = jnp.asarray(r.rand(b, cin, hg, wp) - 0.5, jnp.bfloat16)
        w = jnp.asarray(r.rand(k, k, cin, cout) - 0.5, jnp.bfloat16)
        ref = None
        for epi in ("acc", "ssa", "ssai"):
            for rows in (rows_list if epi == "ssa" else rows_list[:1]):
                fn = functools.partial(conv_tlane_chain, k=k, h=H,
                                       w_valid=W, act="relu", rows=rows,
                                       halo=True, epilogue=epi)

                @functools.partial(jax.jit, static_argnames="n")
                def loop(x, w, n, fn=fn):
                    def body(i, carry):
                        x, s = carry
                        m = fn(x, w).astype(jnp.float32).mean()
                        bump = jnp.where(m > 1e30, 1, 0).astype(x.dtype)
                        return x + bump, s + m
                    return jax.lax.fori_loop(0, n, body,
                                             (x, jnp.float32(0.0)))

                try:
                    t0 = time.perf_counter()
                    out = loop(x, w, iters)
                    float(out[1])
                    cs = time.perf_counter() - t0
                    x2 = x + jnp.asarray(1e-3, x.dtype)
                    t0 = time.perf_counter()
                    out = loop(x2, w, iters)
                    m = float(out[1])
                    dt = (time.perf_counter() - t0) / iters
                    flops = 2.0 * b * H * W * k * k * cin * cout
                    print(f"{name:16s} {epi} rows={rows:3d} "
                          f"{dt*1e3:8.2f} ms {flops/dt/1e12:6.2f} TF "
                          f"sum={m:.4f} (compile {cs:.0f}s)", flush=True)
                except Exception as e:
                    print(f"{name:16s} {epi} rows={rows:3d} FAILED: "
                          f"{str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
