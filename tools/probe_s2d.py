"""Rate probe: does space-to-depth packing beat the chain conv kernel's
VPU ceiling?

Runs conv_tlane_chain (the production kernel, UNMODIFIED — packed spans
are odd so the contract holds) at the DeepFuse layer shapes in original
vs f=2-packed geometry and reports ms per ORIGINAL-image-equivalent.
Packed correctness at image boundaries needs the per-phase mirror
variant (s2d_c); this probe measures RATE only, with halo=True mirrors
whose (numerically wrong for packed, cost-identical) geometry matches.

Per-layer verdict: packed wins when t_packed < t_orig. Theory
(docs/PERFORMANCE.md): VPU traffic ratio kp/k (0.71 k7, 0.60 k5), dot
FLOPs x(kp*f/k)^2 (2.04 k7) on a dot that is ~10% of the critical path.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_s2d.py
env: B (16), H (1224), W (1024), ITERS (10), INTERP (0: CPU smoke only)
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
    from multi_modal_image_fusion_tpu.ops.s2d import s2d_span

    B = int(os.environ.get("B", "16"))
    H = int(os.environ.get("H", "1224"))
    W = int(os.environ.get("W", "1024"))
    iters = int(os.environ.get("ITERS", "10"))
    interp = bool(int(os.environ.get("INTERP", "0")))
    if interp:
        jax.config.update("jax_platforms", "cpu")

    r = np.random.RandomState(0)

    def bench(name, b, cin, cout, k, h, w, rows, flops_orig):
        hg, wp = chain_shape(h, w)
        x = jnp.asarray(r.rand(b, cin, hg, wp) - 0.5, jnp.bfloat16)
        wgt = jnp.asarray(r.rand(k, k, cin, cout) - 0.5, jnp.bfloat16)

        @functools.partial(jax.jit, static_argnames="n")
        def loop(x, wgt, n):
            def body(i, carry):
                x, s = carry
                y = conv_tlane_chain(x, wgt, k, h=h, w_valid=w, rows=rows,
                                     halo=True, epilogue="ssa",
                                     act="relu", interpret=interp)
                m = y.astype(jnp.float32).mean()
                bump = jnp.where(m > 1e30, 1, 0).astype(x.dtype)
                return x + bump, s + m
            return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))

        try:
            t0 = time.perf_counter()
            out = loop(x, wgt, iters)
            float(out[1])
            cs = time.perf_counter() - t0
            x2 = x + jnp.asarray(1e-3, x.dtype)
            t0 = time.perf_counter()
            out = loop(x2, wgt, iters)
            float(out[1])
            dt = (time.perf_counter() - t0) / iters
            actual = 2.0 * b * h * w * k * k * cin * cout
            print(f"{name:28s} {dt*1e3:8.2f} ms  "
                  f"{actual/dt/1e12:6.2f} TF-actual  "
                  f"{flops_orig/dt/1e12:6.2f} TF-orig "
                  f"(compile {cs:.0f}s)", flush=True)
            return dt
        except Exception as e:
            print(f"{name:28s} FAILED: {str(e).splitlines()[0][:140]}",
                  flush=True)
            return None

    # DeepFuse layers: (name, cin, cout, k, batch_mult)
    layers = [("enc0 1->16 k5", 1, 16, 5, 2),
              ("enc1 16->32 k7", 16, 32, 7, 2),
              ("dec0 32->32 k7", 32, 32, 7, 1),
              ("dec1 32->16 k5", 32, 16, 5, 1),
              ("dec2 16->1 k5", 16, 1, 5, 1)]
    f = 2
    tot = {"orig": 0.0, "s2d": 0.0}
    for name, cin, cout, k, bm in layers:
        flops = 2.0 * bm * B * H * W * k * k * cin * cout
        t_o = bench(f"orig {name}", bm * B, cin, cout, k, H, W, 16, flops)
        kp = s2d_span(k, f)
        t_p = bench(f"s2d{f} {name} -> k{kp} c{f*f*cin}x{f*f*cout}",
                    bm * B, f * f * cin, f * f * cout, kp,
                    H // f, W // f, 16, flops)
        if t_p is None:
            t_p = bench(f"s2d{f} {name} rows=8",
                        bm * B, f * f * cin, f * f * cout, kp,
                        H // f, W // f, 8, flops)
        if t_o and t_p:
            tot["orig"] += t_o
            tot["s2d"] += t_p
            print(f"  -> ratio {t_o / t_p:.2f}x", flush=True)

    if tot["s2d"]:
        print(f"\nDeepFuse conv total: orig {tot['orig']*1e3:.1f} ms, "
              f"s2d {tot['s2d']*1e3:.1f} ms, "
              f"speedup {tot['orig']/tot['s2d']:.2f}x", flush=True)

    # f=4 on the two k7 layers (k7 -> k3 c512; 2.94x dot FLOPs)
    for name, cin, cout, k, bm in layers[1:3]:
        flops = 2.0 * bm * B * H * W * k * k * cin * cout
        kp = s2d_span(k, 4)
        t_p = bench(f"s2d4 {name} -> k{kp} c{16*cin}x{16*cout}",
                    bm * B, 16 * cin, 16 * cout, kp, H // 4, W // 4, 8,
                    flops)


if __name__ == "__main__":
    main()
