"""Per-stage wall-clock profile of the DeepFuse chain inference path.

Times each piece of the guard-layout forward separately (honest
protocol: on-device fori chaining + scalar-fetch fence) so the gap
between sum-of-convs and the end-to-end bench number is attributable:
enter/exit transposes, per-layer halo refreshes, the elementwise fusion
round trip, and each conv.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_chain.py
env: B (default 8), H (1224), W (1024), ITERS (10)
"""

import functools
import os
import time

import numpy as np


def timed(loop, x, iters, perturb):
    import jax

    t0 = time.perf_counter()
    out = loop(x, iters)
    float(out[1])
    compile_s = time.perf_counter() - t0
    x2 = perturb(x)
    t0 = time.perf_counter()
    out = loop(x2, iters)
    float(out[1])
    return (time.perf_counter() - t0) / iters, compile_s


def main():
    import jax
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.ops.pallas.conv_kernel import (
        chain_enter, chain_exit, chain_refresh_halo, chain_shape,
        conv_tlane_chain)

    B = int(os.environ.get("B", "8"))
    H = int(os.environ.get("H", "1224"))
    W = int(os.environ.get("W", "1024"))
    iters = int(os.environ.get("ITERS", "10"))
    hg, wp = chain_shape(H, W)
    r = np.random.RandomState(0)

    def mk(c, b=None):
        b = 2 * B if b is None else b
        return jnp.asarray(r.rand(b, c, hg, wp) - 0.5, jnp.bfloat16)

    def chain_loop(fn, x, dep=True):
        @functools.partial(jax.jit, static_argnames="n")
        def loop(x, n):
            def body(i, carry):
                x, s = carry
                y = fn(x)
                m = y.astype(jnp.float32).mean()
                bump = jnp.where(m > 1e30, 1, 0).astype(x.dtype)
                return x + bump, s + m
            return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))
        return loop

    perturb = lambda x: x + jnp.asarray(1e-3, x.dtype)

    # DeepFuse layer inventory: enc0 1->16 k5, enc1 16->32 k7 (siamese,
    # batch 2B), fusion (2B->B), dec0 32->32 k7, dec1 32->16 k5,
    # dec2 16->1 k5 (batch B)
    layers = [
        ("enc0 1->16 k5 b%d" % (2 * B), 1, 16, 5, 2 * B),
        ("enc1 16->32 k7 b%d" % (2 * B), 16, 32, 7, 2 * B),
        ("dec0 32->32 k7 b%d" % B, 32, 32, 7, B),
        ("dec1 32->16 k5 b%d" % B, 32, 16, 5, B),
        ("dec2 16->1 k5 b%d" % B, 16, 1, 5, B),
    ]

    total = 0.0
    for name, cin, cout, k, b in layers:
        w = jnp.asarray(r.rand(k, k, cin, cout) - 0.5, jnp.bfloat16)
        bias = jnp.asarray(r.rand(cout), jnp.float32)
        x = mk(cin, b)

        fn = lambda x, w=w, k=k, bias=bias: conv_tlane_chain(
            chain_refresh_halo(x, H, W, k // 2), w, k, h=H, w_valid=W,
            bias=bias, act="relu", rows=16)
        dt, cs = timed(chain_loop(fn, x), x, iters, perturb)
        flops = 2.0 * b * H * W * k * k * cin * cout
        print(f"{name:22s} conv+halo {dt*1e3:8.2f} ms "
              f"{flops/dt/1e12:6.1f} TF  (compile {cs:.0f}s)", flush=True)
        total += dt

        # halo refresh alone
        fnh = lambda x, k=k: chain_refresh_halo(x, H, W, k // 2)
        dth, cs = timed(chain_loop(fnh, x), x, iters, perturb)
        print(f"{name:22s} halo only {dth*1e3:8.2f} ms "
              f"(compile {cs:.0f}s)", flush=True)

    # elementwise fusion: (2B, 32) -> (B, 32)
    x = mk(32, 2 * B)
    fnf = lambda x: x[:B] + x[B:]
    dt, cs = timed(chain_loop(fnf, x), x, iters, perturb)
    print(f"{'fusion sum b%d' % B:22s}           {dt*1e3:8.2f} ms "
          f"(compile {cs:.0f}s)", flush=True)
    total += dt

    # enter (concat + transpose + place) and exit
    xin = jnp.asarray(r.rand(2 * B, H, W, 1), jnp.bfloat16)
    fne = lambda x: chain_enter(x)
    dt, cs = timed(chain_loop(fne, xin), xin, iters, perturb)
    print(f"{'chain_enter b%d' % (2 * B):22s}           {dt*1e3:8.2f} ms "
          f"(compile {cs:.0f}s)", flush=True)
    total += dt

    xout = mk(1, B)
    fnx = lambda x: chain_exit(x, H, W)
    dt, cs = timed(chain_loop(fnx, xout), xout, iters, perturb)
    print(f"{'chain_exit b%d' % B:22s}           {dt*1e3:8.2f} ms "
          f"(compile {cs:.0f}s)", flush=True)
    total += dt

    print(f"\nsum of stages (conv+halo rows + fusion + enter/exit): "
          f"{total*1e3:.1f} ms for {B} pairs "
          f"-> {B/total:.1f} pairs/s", flush=True)


if __name__ == "__main__":
    main()
