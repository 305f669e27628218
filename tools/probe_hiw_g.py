"""Per-shape g sweep of the PRODUCTION hiw chain conv (round-4 #1).

probe_hiw.py's standalone sweep already showed the pick heuristic losing
at the fattest DeepFuse layer (dec0 32->32 k7: g2 74.5 TF vs the picked
g4's 66.3) and timed out before covering the rest. This probe times
`conv_hiw_chain` itself — guard layout, reflect halos, bias+act
epilogue, the real thing — at every distinct conv shape of the H-major
zoo paths, over every legal g, and prints one JSON line per leg for
tools/r4_autoflip_g.py to fold into HIW_G_TABLE.

Timing: honest protocol (fori_loop-chained iters + DCE guard + warm
second call), tools/probe_breakdown.py style.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_hiw_g.py
env: B (16), H (1224), W (1024), ITERS (10), SHAPES (csv filter
     "cin-cout-k", default all)
"""

import functools
import json
import os
import time

import numpy as np

# (name, c_in, c_out, k, batch_scale): batch_scale 2 = pre-fusion layer
# (runs on both pair halves). Shapes cover DeepFuse (k5/k7) plus the
# DenseFuse/VIFNet/IFCNN H-major families (k3 stacks, dense growth).
SHAPES = [
    ("deepfuse enc0", 1, 16, 5, 2),
    ("deepfuse enc1", 16, 32, 7, 2),
    ("deepfuse dec0", 32, 32, 7, 1),
    ("deepfuse dec1", 32, 16, 5, 1),
    ("deepfuse dec2", 16, 1, 5, 1),
    ("densefuse dense", 16, 16, 3, 2),
    ("densefuse dec0", 64, 64, 3, 1),
    ("densefuse dec1", 64, 32, 3, 1),
    ("densefuse dec2", 32, 16, 3, 1),
    ("vifnet dec0", 128, 64, 3, 1),
    ("ifcnn conv2", 64, 64, 3, 2),
    ("ifcnn enc0", 1, 64, 7, 2),
]


def main():
    import jax
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.ops.pallas.conv_kernel import (
        CHAIN_GUARD, CHAIN_WG, chain_shape)
    from multi_modal_image_fusion_tpu.ops.pallas.hiw_kernel import (
        _hiw_g_ok, conv_hiw_chain, hiw_pick_g)

    B = int(os.environ.get("B", "16"))
    H = int(os.environ.get("H", "1224"))
    W = int(os.environ.get("W", "1024"))
    iters = int(os.environ.get("ITERS", "10"))
    filt = os.environ.get("SHAPES")
    filt = set(filt.split(",")) if filt else None
    rows_list = [int(x) for x in os.environ.get("ROWS", "16").split(",")]
    interp = bool(os.environ.get("INTERPRET"))  # CPU smoke only

    hg, wp = chain_shape(H, W)
    r = np.random.RandomState(0)

    for name, cin, cout, k, bs in SHAPES:
        key = f"{cin}-{cout}-{k}"
        if filt and key not in filt:
            continue
        b = B * bs
        x = jnp.zeros((b, hg * cin, wp), jnp.bfloat16)
        x = jax.lax.dynamic_update_slice(
            x, jnp.asarray(r.rand(b, H * cin, W) - 0.5, jnp.bfloat16),
            (0, CHAIN_GUARD * cin, CHAIN_WG))
        w = jnp.asarray(r.rand(k, k, cin, cout) - 0.5, jnp.bfloat16) * 0.1
        bias = jnp.asarray(r.rand(cout), jnp.float32)
        picked = hiw_pick_g(cin, cout, k)
        for rows in rows_list:
            for g in (2, 4, 8, 16):
                if g > rows or not _hiw_g_ok(g, cin, cout, rows):
                    continue

                @functools.partial(jax.jit,
                                   static_argnames=("n", "g", "rows"))
                def loop(x, w, bias, n, g, rows):
                    def body(i, carry):
                        x, s = carry
                        y = conv_hiw_chain(x, w, k, h=H, w_valid=W,
                                           c_in=cin, bias=bias, act="relu",
                                           g=g, rows=rows, interpret=interp)
                        # Reduce over the VALID slice only: the kernel never
                        # writes the guard rows/columns, and uninitialized
                        # HBM there can decode non-finite (the queue-11 dec-
                        # shape "nan" failures were exactly this).
                        yv = y[:, CHAIN_GUARD * cout:
                               (CHAIN_GUARD + H) * cout,
                               CHAIN_WG:CHAIN_WG + W]
                        m = yv.astype(jnp.float32).mean()
                        bump = jnp.where(m > 1e30, 1, 0).astype(x.dtype)
                        return x + bump, s + m
                    return jax.lax.fori_loop(0, n, body,
                                             (x, jnp.float32(0.0)))

                try:
                    t0 = time.perf_counter()
                    out = loop(x, w, bias, iters, g, rows)
                    m = float(out[1])
                    cs = time.perf_counter() - t0
                    assert np.isfinite(m), m
                    t0 = time.perf_counter()
                    out = loop(x + jnp.asarray(1e-3, x.dtype), w, bias,
                               iters, g, rows)
                    float(out[1])
                    dt = (time.perf_counter() - t0) / iters
                    flops = 2.0 * b * H * W * k * k * cin * cout
                    print(json.dumps({
                        "probe": "hiw_g", "shape": key, "name": name,
                        "g": g, "rows": rows,
                        "picked": g == picked and rows == 16,
                        "ms": round(dt * 1e3, 3),
                        "tf": round(flops / dt / 1e12, 2),
                        "compile_s": round(cs, 1)}), flush=True)
                except Exception as e:
                    print(json.dumps({
                        "probe": "hiw_g", "shape": key, "name": name,
                        "g": g, "rows": rows,
                        "error": str(e).splitlines()[0][:140]}),
                        flush=True)


if __name__ == "__main__":
    main()
