"""Post-training int8 quantization: calibration + quantized inference.

The reference has no quantization story; on TPU the MXU's int8 mode runs
~2x the bf16 matmul rate (docs/PERFORMANCE.md round-3 Mosaic probe), so
serving can trade <=1e-3 SSIM/Qabf (the BASELINE.json parity budget,
enforced by tools/int8_acceptance.py) for throughput once the conv
formulation is MXU-bound.

Scheme: symmetric max-abs. Weights per-output-channel (static, from the
checkpoint); activations per-INPUT-channel with CALIBRATED static amax
vectors — the channel scales are folded into the weights before weight
quantization (conv_int8.fold_input_scales), so the int8 dot needs no
extra runtime work and the combined dequant scale stays per-output-
channel. A dynamic per-batch max would force an extra full-tensor
reduction pass per layer AND make latency data-dependent. Calibration
runs a few batches through the f32/bf16 model with the `quant_stats`
collection mutable; every ConvLayer sows its per-channel input max-abs
(max-reduced across batches), keyed by the module path.

Usage:
    amax = calibrate(model, variables, [(img1, img2), ...])
    with quantized_inference(amax):
        y = model.apply(variables, img1, img2, train=False)   # on TPU

Inside the context, eligible ConvLayers (stride-1, ungrouped,
non-transpose, reflect-SAME) run ops/pallas/conv_int8.conv_tlane_dma_q:
int8 x int8 -> int32 on the MXU with an f32 dequant + bias + act
epilogue. Layers without a calibrated amax fall back to a dynamic max
(correct, slower). The model-level chain fast paths disable themselves
under the context (ops/layers.chain_ready) so every conv reaches the
NHWC dispatch point.
"""

import contextvars

import jax
import jax.numpy as jnp

__all__ = ["calibrate", "quantized_inference", "quant_ctx",
           "quant_skipped", "default_skip"]

_QUANT_CTX = contextvars.ContextVar("mmif_quant", default=None)
_QUANT_SKIP = contextvars.ContextVar("mmif_quant_skip", default=())

# Measured mixed-precision defaults: layers whose int8 error blows the
# 1e-3 SSIM/Qabf budget stay bf16 (the standard PTQ cure). Round-5
# finding (tools/probe_int8_fold.py): the round-4 dec1 skip was a
# CALIBRATION-COVERAGE artifact — with 2 calibration pairs the full
# hiw-q set measured dQabf 2.1e-3, with 3+ pairs it drops to 2.5e-4 and
# BEATS the skip-dec1 config (4.4e-4). Acceptance now calibrates on
# CALIB=8 pairs (tools/int8_acceptance.py); no skips needed. The r5
# autoflip (tools/r5_autoflip_int8.py) re-adds dec1 here if the TPU
# acceptance disagrees.
DEFAULT_INT8_SKIP = {}


def default_skip(model_name):
    """The measured skip tuple for a model (empty if none known)."""
    return DEFAULT_INT8_SKIP.get(str(model_name).lower(), ())


def quant_ctx():
    """The active calibration dict (module-path -> amax) or None."""
    return _QUANT_CTX.get()


def quant_skipped(path):
    """True if this layer is excluded from int8 — by the active
    quantized_inference(skip=...) set, or by MMIF_INT8_SKIP (comma-
    separated; env entries ADD to the context set).

    Matching is against the full '/'-joined flax path (the same key
    `calibrate` produces): an entry with no '/' is a leaf-name suffix
    convention ("dec1" matches any module whose path ends in dec1); an
    entry containing '/' must match the joined path exactly — so a skip
    for one model's layer cannot collide with another model's same-named
    leaf (ADVICE r4). Mixed precision is the standard cure when a
    quantized layer blows the accuracy budget
    (tools/int8_acceptance.py, tools/probe_int8_ablate.py)."""
    import os
    if not path:
        return False
    names = set(_QUANT_SKIP.get())
    env = os.environ.get("MMIF_INT8_SKIP")
    if env:
        names.update(env.split(","))
    joined = "/".join(path)
    for n in names:
        if ("/" in n and joined == n) or ("/" not in n and path[-1] == n):
            return True
    return False


class quantized_inference:
    """Context manager activating the int8 inference path.

    amax: {"enc0": 1.7, ...} module-path keys as produced by
    `calibrate` ("/"-joined flax paths). An empty dict is allowed —
    every layer then uses a dynamic per-batch max.
    skip: layer names to keep in bf16 (mixed precision; see
    `default_skip` for the measured per-model defaults).
    """

    def __init__(self, amax=None, skip=()):
        self.amax = dict(amax or {})
        self.skip = tuple(skip)

    def __enter__(self):
        self._tok = _QUANT_CTX.set(self.amax)
        self._tok_skip = _QUANT_SKIP.set(self.skip)
        return self

    def __exit__(self, *exc):
        _QUANT_CTX.reset(self._tok)
        _QUANT_SKIP.reset(self._tok_skip)
        return False


def calibrate(model, variables, batches):
    """Per-ConvLayer, per-input-channel max-abs over calibration batches.

    batches: iterable of (img1, img2) arrays (or single-image tuples for
    AE mode). Returns {"path/to/layer": (C_in,) float32 ndarray} — static
    host-side constants, so the inference fold (conv_int8.
    fold_input_scales) traces as a constant op."""
    import numpy as np

    amax = {}
    for batch in batches:
        _, upd = model.apply(variables, *batch, train=False,
                             mutable=["quant_stats"])
        flat = _flatten(upd.get("quant_stats", {}))
        for k, v in flat.items():
            v = np.asarray(v, np.float32)
            amax[k] = np.maximum(amax[k], v) if k in amax else v
    return amax


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            # sow leaf: drop the trailing value name ('in_amax')
            path = prefix if k == "in_amax" else prefix + (k,)
            val = v[0] if isinstance(v, tuple) else v
            out["/".join(path)] = jnp.asarray(val)
    return out
