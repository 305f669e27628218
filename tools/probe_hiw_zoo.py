"""TPU parity + timing for the multi-leg H-major zoo paths (round 4).

For each of the six models wired onto conv_hiw_chain_multi
(DenseFuse/VIFNet/PFNetv1/IFCNN/DIFNet/PMGI), runs the whole forward both
ways on device — C-major chain (MMIF_CHAIN_HIW_MULTI=0, the current
default) vs multi-leg H-major (=1) — checks the relative maxdiff at a
small config, then times both at full res (honest protocol, probe_hiw_e2e
style). One JSON line per model for tools/r4_autoflip_multi.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_hiw_zoo.py
env: B (16), H (1224), W (1024), ITERS (5), MODELS (csv filter)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

MODELS = ["densefuse", "vifnet", "pfnetv1", "ifcnn", "difnet", "pmgi"]


def main():
    import jax
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.models import create_model
    from multi_modal_image_fusion_tpu.ops import layers as L

    B = int(os.environ.get("B", "16"))
    H = int(os.environ.get("H", "1224"))
    W = int(os.environ.get("W", "1024"))
    iters = int(os.environ.get("ITERS", "5"))
    filt = os.environ.get("MODELS")
    names = filt.split(",") if filt else MODELS

    r = np.random.RandomState(0)
    for name in names:
        rec = {"probe": "hiw_zoo", "model": name}
        try:
            model = create_model(name)
            init1 = jnp.asarray(r.rand(1, 64, 64, 1), jnp.float32)
            variables = model.init(jax.random.PRNGKey(0), init1, init1,
                                   train=False)
            vb = jax.tree.map(lambda v: v.astype(jnp.bfloat16), variables)

            def fwd(vars_):
                @jax.jit
                def f(a, b):
                    with L.fast_inference():
                        return model.apply(vars_, a, b, train=False)
                return f

            # parity at a small f32 config (kernel-formulation noise only)
            a = jnp.asarray(r.rand(2, 256, 256, 1), jnp.float32)
            b = jnp.asarray(r.rand(2, 256, 256, 1), jnp.float32)
            os.environ["MMIF_CHAIN_HIW_MULTI"] = "0"
            y0 = np.asarray(fwd(variables)(a, b), np.float32)
            os.environ["MMIF_CHAIN_HIW_MULTI"] = "1"
            y1 = np.asarray(fwd(variables)(a, b), np.float32)
            rel = float(np.abs(y1 - y0).max() / (np.abs(y0).max() + 1e-8))
            rec["parity"] = rel
            rec["parity_ok"] = rel < 2e-3
            print(f"{name}: multi vs cmajor relative maxdiff {rel:.3e} "
                  f"{'OK' if rec['parity_ok'] else 'FAIL'}", flush=True)

            img1 = jnp.asarray(r.rand(B, H, W, 1), jnp.bfloat16)
            img2 = jnp.asarray(r.rand(B, H, W, 1), jnp.bfloat16)
            for key, env in (("off", "0"), ("on", "1")):
                os.environ["MMIF_CHAIN_HIW_MULTI"] = env
                f = fwd(vb)

                @functools.partial(jax.jit, static_argnames="n")
                def loop(a, b, n, f=f):
                    def body(i, carry):
                        a, s = carry
                        m = f(a, b).astype(jnp.float32).mean()
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
                rec[f"pairs_{key}"] = round(B / dt, 2)
                print(f"{name} {key:3s} {dt*1e3:8.2f} ms "
                      f"{B/dt:7.2f} pairs/s (compile+first {cs:.0f}s)",
                      flush=True)
        except Exception as e:
            rec["error"] = str(e).splitlines()[0][:160]
            print(f"{name} FAILED: {rec['error']}", flush=True)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
