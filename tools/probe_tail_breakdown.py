"""Section timing for the heavy-tail models (encoder / fusion / full).

res2fusion sits at 1.6% of its FLOP ceiling and myfusion at 1.2%
(docs/PERFORMANCE.md round-4 rooflines) — the cost is not FLOPs, and
kernel-level probes cannot say WHICH section burns the time. This times
nested prefixes of the forward as separate jits (encoder only,
encoder+fusion, full model) under the production fast_inference context;
differences attribute wall time to encoder / fusion / decoder+glue.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python tools/probe_tail_breakdown.py [model ...]
env: H (1224), W (1024), ITERS (3), B (per-model default)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

DEFAULT_MODELS = ["res2fusion", "myfusion", "nestfuse", "unfusion"]
MODEL_B = {"res2fusion": 2, "myfusion": 8, "nestfuse": 4, "unfusion": 4,
           "mafusion": 2, "rfnnest": 4}


def main():
    import jax
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.models import create_model
    from multi_modal_image_fusion_tpu.ops import layers as L

    H = int(os.environ.get("H", "1224"))
    W = int(os.environ.get("W", "1024"))
    iters = int(os.environ.get("ITERS", "3"))
    names = sys.argv[1:] or DEFAULT_MODELS

    r = np.random.RandomState(0)
    for name in names:
        B = MODEL_B.get(name, int(os.environ.get("B", "4")))
        rec = {"probe": "tail_breakdown", "model": name, "b": B}
        try:
            model = create_model(name)
            init1 = jnp.asarray(r.rand(1, 64, 64, 1), jnp.float32)
            variables = model.init(jax.random.PRNGKey(0), init1, init1,
                                   train=False)
            vb = jax.tree.map(lambda v: v.astype(jnp.bfloat16), variables)
            img1 = jnp.asarray(r.rand(B, H, W, 1), jnp.bfloat16)
            img2 = jnp.asarray(r.rand(B, H, W, 1), jnp.bfloat16)

            def enc_only(m, a, b, train=False):
                if hasattr(m, "encoder_fn"):        # MyFusion
                    f1, f2 = m.encoder_fn(a, b, False)
                    return tuple(f1) + tuple(f2)
                return m.encoder(jnp.concatenate([a, b], axis=0), False)

            def enc_fuse(m, a, b, train=False):
                if hasattr(m, "encoder_fn"):        # MyFusion
                    f1, f2 = m.encoder_fn(a, b, False)
                    return m.fusion(f1, f2, False)
                f = m.encoder(jnp.concatenate([a, b], axis=0), False)
                n = a.shape[0]
                if isinstance(f, (tuple, list)):
                    return m.fusion(tuple(x[:n] for x in f),
                                    tuple(x[n:] for x in f))
                return m.fusion(f[:n], f[n:])

            sections = [("enc", enc_only), ("enc_fuse", enc_fuse),
                        ("full", None)]
            for key, method in sections:
                @functools.partial(jax.jit, static_argnames="n")
                def loop(a, b, n, method=method):
                    def body(i, carry):
                        a, s = carry
                        with L.fast_inference():
                            if method is None:
                                y = model.apply(vb, a, b, train=False)
                            else:
                                y = model.apply(vb, a, b, train=False,
                                                method=method)
                        ys = y if isinstance(y, (tuple, list)) else [y]
                        m = sum(t.astype(jnp.float32).mean() for t in ys)
                        bump = jnp.where(m > 1e30, 1, 0).astype(a.dtype)
                        return a + bump, s + m
                    return jax.lax.fori_loop(0, n, body,
                                             (a, jnp.float32(0.0)))

                t0 = time.perf_counter()
                float(loop(img1, img2, iters)[1])
                cs = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(loop(img1 + jnp.asarray(1e-3, img1.dtype), img2,
                           iters)[1])
                dt = (time.perf_counter() - t0) / iters
                rec[f"ms_{key}"] = round(dt * 1e3, 2)
                print(f"{name} {key:9s} {dt*1e3:9.2f} ms "
                      f"(compile+first {cs:.0f}s)", flush=True)
        except Exception as e:
            rec["error"] = str(e).splitlines()[0][:160]
            print(f"{name} FAILED: {rec['error']}", flush=True)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    sys.exit(main())
