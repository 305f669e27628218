"""int8 quantized inference (ops/quant.py + ops/pallas/conv_int8.py).

Interpret mode on CPU: calibration sows per-layer input max-abs through
the real apply path; the quantized forward must track the f32 forward
within the documented symmetric-max-abs error (<~1% of range), well
inside the 1e-3 SSIM acceptance budget checked on hardware by
tools/int8_acceptance.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_modal_image_fusion_tpu.models import create_model
from multi_modal_image_fusion_tpu.ops.quant import (calibrate,
                                                    quantized_inference)


def test_calibrate_collects_per_layer_amax():
    r = np.random.RandomState(0)
    model = create_model("deepfuse")
    img = jnp.asarray(r.rand(1, 32, 32, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img, train=False)
    amax = calibrate(model, variables,
                     [(img, img), (img * 0.5, img * 2.0)])
    # one entry per ConvLayer (2 enc + 3 dec), keyed by module path
    assert len(amax) == 5, sorted(amax)
    assert any(k.startswith("enc") for k in amax)
    # per-input-channel vectors: enc0 sees the 1-ch input, enc1 its
    # 16-ch features
    in_keys = [k for k in amax if k.startswith("enc0")]
    assert amax[in_keys[0]].shape == (1,)
    # the input layer's amax is the max over batches (img * 2.0)
    assert abs(float(amax[in_keys[0]][0])
               - float(jnp.max(img * 2.0))) < 1e-6
    deep = [k for k in amax if k not in in_keys]
    assert any(amax[k].shape[0] > 1 for k in deep)


@pytest.mark.slow
def test_int8_deepfuse_forward(monkeypatch):
    """Whole-model quantized forward (interpret kernels) tracks f32."""
    monkeypatch.setenv("MMIF_CHAIN_INTERPRET", "1")
    r = np.random.RandomState(1)
    model = create_model("deepfuse")
    img1 = jnp.asarray(r.rand(1, 40, 64, 1), jnp.float32)
    img2 = jnp.asarray(r.rand(1, 40, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img1, img2, train=False)
    want = np.asarray(model.apply(variables, img1, img2, train=False))

    amax = calibrate(model, variables, [(img1, img2)])
    with quantized_inference(amax):
        got = np.asarray(model.apply(variables, img1, img2, train=False))
    assert got.shape == want.shape
    scale = np.abs(want).max() + 1e-8
    rel = np.abs(got - want).max() / scale
    # per-layer quant error compounds ~1%/layer; the max-norm is also
    # sensitive to single quant-step flips from accumulation-order
    # changes (the measured HIW_G_TABLE picks reorder the banded dots:
    # 0.0497 -> 0.0597 when enc0 moved g8->g16), so the budget carries
    # headroom over the observed ~6%
    assert rel < 0.08, rel
    # uncalibrated context: dynamic per-batch max, same contract
    with quantized_inference({}):
        got2 = np.asarray(model.apply(variables, img1, img2, train=False))
    assert np.abs(got2 - want).max() / scale < 0.08  # same headroom


def test_int8_skip_keeps_layers_exact(monkeypatch):
    """Mixed precision: skipped layers bypass quantization entirely —
    skipping every layer makes the quantized forward EQUAL the f32 one;
    a partial skip still differs. MMIF_INT8_FAKE runs the exact
    quantizers with a float conv (CPU-runnable, ops/layers.py)."""
    monkeypatch.setenv("MMIF_INT8_FAKE", "1")
    r = np.random.RandomState(2)
    model = create_model("deepfuse")
    img1 = jnp.asarray(r.rand(1, 40, 64, 1), jnp.float32)
    img2 = jnp.asarray(r.rand(1, 40, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img1, img2, train=False)
    want = np.asarray(model.apply(variables, img1, img2, train=False))

    amax = calibrate(model, variables, [(img1, img2)])
    layers = ("enc0", "enc1", "dec0", "dec1", "dec2")
    with quantized_inference(amax, skip=layers):
        all_skip = np.asarray(model.apply(variables, img1, img2,
                                          train=False))
    np.testing.assert_array_equal(all_skip, want)

    with quantized_inference(amax, skip=("dec1",)):
        part = np.asarray(model.apply(variables, img1, img2, train=False))
    assert np.abs(part - want).max() > 0  # the others did quantize
    assert np.abs(part - want).max() / (np.abs(want).max() + 1e-8) < 0.05

    # env adds to the context set
    monkeypatch.setenv("MMIF_INT8_SKIP", ",".join(layers))
    with quantized_inference(amax, skip=("dec1",)):
        env_all = np.asarray(model.apply(variables, img1, img2,
                                         train=False))
    np.testing.assert_array_equal(env_all, want)


def test_int8_fake_matches_interpret_kernel(monkeypatch):
    """The fake-quant emulation tracks the real int8 kernel (interpret
    mode) closely: both run the same quantizers; the only difference is
    f32-conv rounding vs the exact int32 dot."""
    monkeypatch.setenv("MMIF_CHAIN_INTERPRET", "1")
    r = np.random.RandomState(3)
    model = create_model("deepfuse")
    img1 = jnp.asarray(r.rand(1, 40, 64, 1), jnp.float32)
    img2 = jnp.asarray(r.rand(1, 40, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img1, img2, train=False)
    amax = calibrate(model, variables, [(img1, img2)])
    with quantized_inference(amax):
        kern = np.asarray(model.apply(variables, img1, img2, train=False))
    monkeypatch.delenv("MMIF_CHAIN_INTERPRET")
    monkeypatch.setenv("MMIF_INT8_FAKE", "1")
    with quantized_inference(amax):
        fake = np.asarray(model.apply(variables, img1, img2, train=False))
    scale = np.abs(kern).max() + 1e-8
    diff = np.abs(fake - kern)
    # almost-everywhere agreement at f32 rounding level; isolated pixels
    # may flip one quant step downstream (a ~1e-7 conv-rounding delta
    # near a rounding boundary re-quantizes differently next layer), so
    # the max tolerates a couple of steps while the mean stays tiny
    assert diff.max() / scale < 2e-2, diff.max() / scale
    assert diff.mean() / scale < 1e-4, diff.mean() / scale
