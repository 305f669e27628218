"""TPU acceptance + timing for the multi-leg H-major zoo paths.

For each of the six models wired onto conv_hiw_chain_multi
(DenseFuse/VIFNet/PFNetv1/IFCNN/DIFNet/PMGI), gates the multi-leg path
through the round-5 unified acceptance (tools/acceptance.py: end-to-end
dSSIM/dQabf vs the f32-HIGHEST golden <= 1e-3, plus a loose f32 envelope
tripwire — raw f32 rel-maxdiff is MXU default-precision noise, see
tools/probe_precision.py), then times both paths at full res (honest
protocol, probe_hiw_e2e style). One JSON line per model for
tools/r5_autoflip_multi.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_hiw_zoo.py
env: B (16), H (1224), W (1024), ITERS (5), MODELS (csv filter)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

MODELS = ["densefuse", "vifnet", "pfnetv1", "ifcnn", "difnet", "pmgi",
          "nestfuse", "rfnnest", "unfusion", "myfusion", "res2fusion", "mafusion", "dbnet", "pfnetv2"]
# full-res timing batch per model (HBM-capacity-bound heavy tail runs
# smaller — mirrors docs/zoo_bench.jsonl batches)
MODEL_B = {"nestfuse": 4, "rfnnest": 4, "unfusion": 4, "myfusion": 8, "res2fusion": 2, "mafusion": 2, "dbnet": 8, "pfnetv2": 8}


def main():
    import jax
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.models import create_model
    from multi_modal_image_fusion_tpu.ops import layers as L

    H = int(os.environ.get("H", "1224"))
    W = int(os.environ.get("W", "1024"))
    iters = int(os.environ.get("ITERS", "5"))
    filt = os.environ.get("MODELS")
    names = filt.split(",") if filt else MODELS

    r = np.random.RandomState(0)
    for name in names:
        for attempt in range(3):
            rec = _run_model(name, r, H, W, iters)
            # the relay's remote-compile helper fails stochastically on
            # long compiles (tpu_compile_helper exit 1 -> HTTP 500);
            # queue-5 lost 3 of 6 heavy models to it — retry in-probe
            if not (rec.get("error") and "500" in rec["error"]):
                break
            print(f"{name}: remote-compile 500, retry "
                  f"{attempt + 1}/2", flush=True)
        print(json.dumps(rec), flush=True)


def _run_model(name, r, H, W, iters):
    import jax
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.models import create_model
    from multi_modal_image_fusion_tpu.ops import layers as L

    if True:  # keep the original body's indentation
        rec = {"probe": "hiw_zoo", "model": name}
        B = MODEL_B.get(name, int(os.environ.get("B", "16")))
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

            # round-5 unified acceptance: dSSIM/dQabf vs f32 golden
            from acceptance import flip_gate
            gate = flip_gate(name, {"MMIF_CHAIN_HIW_MULTI": "1"},
                             limit=int(os.environ.get("LIMIT", "3")),
                             model=model, variables=variables)
            rec["d_ssim"] = gate["d_ssim"]
            rec["d_qabf"] = gate["d_qabf"]
            rec["trip_rel_f32"] = gate["trip_rel_f32"]
            rec["floor_ssim"] = gate.get("floor_ssim")
            rec["floor_qabf"] = gate.get("floor_qabf")
            rec["floor_trip_f32"] = gate.get("floor_trip_f32")
            rec["parity_ok"] = gate["ok"]
            print(f"{name}: gate dSSIM {gate['d_ssim']:.2e} dQabf "
                  f"{gate['d_qabf']:.2e} trip {gate['trip_rel_f32']:.2e} "
                  f"(floors {gate.get('floor_ssim', 0):.2e}/"
                  f"{gate.get('floor_qabf', 0):.2e}/"
                  f"{gate.get('floor_trip_f32', 0):.2e}) "
                  f"{'OK' if gate['ok'] else 'FAIL'}", flush=True)

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
        return rec


if __name__ == "__main__":
    main()
