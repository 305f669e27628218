"""Sweep the int8 fold parameters (alpha, amax clip) on CPU fake-quant.

The r4 TPU acceptance left deepfuse hiw-q at dQabf 1.09e-3 with the
skip-dec1 mixed-precision default — 9% over the 1e-3 budget. Two static
PTQ levers remain before resorting to finer-grained scales: the smooth
fold exponent (MMIF_INT8_ALPHA, SmoothQuant-style balance of act/weight
precision) and calibration outlier clipping (MMIF_INT8_CLIP). Both are
trace-time statics — zero runtime cost. This probe ranks (alpha, clip)
on CPU with the exact quantizers via MMIF_INT8_FAKE (matches the int
kernel up to f32 conv rounding), for the full hiw-q set and skip-dec1.

Usage: PYTHONPATH=/root/repo python tools/probe_int8_fold.py [model]
env: LIMIT (pairs, default 3)
"""

import itertools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ALPHAS = [0.35, 0.45, 0.5, 0.55, 0.65]
CLIPS = [1.0, 0.97, 0.93, 0.88, 0.8]
SKIPS = ["enc0,dec2", "enc0,dec2,dec1"]


def main():
    os.environ["MMIF_INT8_FAKE"] = "1"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.data.dataset import FusionDataset
    from multi_modal_image_fusion_tpu.models import create_model
    from multi_modal_image_fusion_tpu.ops.layers import fast_inference
    from multi_modal_image_fusion_tpu.ops.metrics import calc_Qabf, \
        calc_ssim
    from multi_modal_image_fusion_tpu.ops.quant import (
        calibrate, quantized_inference)

    name = sys.argv[1] if len(sys.argv) > 1 else "deepfuse"
    assert name == "deepfuse", "SKIPS hardcode deepfuse hiw-q eligibility"
    limit = int(os.environ.get("LIMIT", "3"))

    sample_root = os.environ.get(
        "MMIF_SAMPLES", "/root/reference/data/samples/infrared")
    ds = FusionDataset(sample_root, set_name="test", set_type="test",
                       img_type="ir")
    pairs = []
    for i in range(min(limit, len(ds))):
        a, b = ds[i]
        pairs.append((jnp.asarray(a)[None, ..., None],
                      jnp.asarray(b)[None, ..., None]))

    model = create_model(name)
    variables = model.init(jax.random.PRNGKey(0), *pairs[0], train=False)
    amax = calibrate(model, variables, pairs)

    def scores(a, b, out):
        s = 0.5 * (calc_ssim(a, out, data_range=1.0)
                   + calc_ssim(b, out, data_range=1.0))
        qa = calc_Qabf(a * 255, b * 255, out * 255)
        return float(s), float(qa)

    bases = []
    for a, b in pairs:
        with fast_inference():
            base = model.apply(variables, a, b, train=False)
        bases.append(jnp.clip(base.astype(jnp.float32), 0, 1))

    best = {}
    for skip, alpha, clip in itertools.product(SKIPS, ALPHAS, CLIPS):
        os.environ["MMIF_INT8_SKIP"] = skip
        os.environ["MMIF_INT8_ALPHA"] = str(alpha)
        os.environ["MMIF_INT8_CLIP"] = str(clip)
        d_ssim = d_qabf = 0.0
        for (a, b), base in zip(pairs, bases):
            with fast_inference(), quantized_inference(amax):
                q = model.apply(variables, a, b, train=False)
            q = jnp.clip(q.astype(jnp.float32), 0, 1)
            s0, q0 = scores(a, b, base)
            s1, q1 = scores(a, b, q)
            d_ssim = max(d_ssim, abs(s1 - s0))
            d_qabf = max(d_qabf, abs(q1 - q0))
        rec = {"probe": "int8_fold", "model": name, "skip": skip,
               "alpha": alpha, "clip": clip,
               "d_ssim": round(d_ssim, 6), "d_qabf": round(d_qabf, 6),
               "worst": round(max(d_ssim, d_qabf), 6)}
        print(json.dumps(rec), flush=True)
        if skip not in best or rec["worst"] < best[skip]["worst"]:
            best[skip] = rec
    for skip, rec in best.items():
        print(f"BEST {skip}: alpha={rec['alpha']} clip={rec['clip']} "
              f"dSSIM={rec['d_ssim']} dQabf={rec['d_qabf']}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
