"""int8 halo-in-weights chain conv parity (ops/pallas/hiw_int8.py).

Interpret mode on CPU: the kernel must reproduce the emulated int8
reference — quantize(x) @ quantize(w) in int32, dequant, bias, act —
EXACTLY (same integer math), and stay within the quantization error
budget of the f32 conv."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_modal_image_fusion_tpu.ops.pallas.conv_int8 import (
    choose_fold, fold_weights, quantize_weights)
from multi_modal_image_fusion_tpu.ops.pallas.hiw_int8 import (
    conv_hiw_chain_q, hiw_q_ok)
from tests.test_hiw import _from_hmajor, _ref_conv, _to_hmajor


def _emulated_int8(x, w, amax, bias=None, act=None):
    """Smooth-folded per-channel int8 activations, per-out-channel int8
    weights, int32 accumulate, f32 dequant — the kernel's exact
    integer math (conv_int8.choose_fold scheme)."""
    f = choose_fold(amax, w, "smooth")
    # multiply by the reciprocal, EXACTLY like the kernel's invf pass —
    # x/f differs from x*(1/f) by an ulp at round boundaries, which
    # flips whole int8 quanta
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / f)),
                  -127, 127).astype(jnp.float32)
    wq, sw = quantize_weights(fold_weights(w, f))
    p = w.shape[0] // 2
    xp = jnp.pad(xq, ((0, 0), (p, p), (p, p), (0, 0)), "reflect") \
        if p else xq
    y = jax.lax.conv_general_dilated(
        xp, wq.astype(jnp.float32), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y * sw
    if bias is not None:
        y = y + bias
    if act == "relu":
        y = jax.nn.relu(y)
    return y


@pytest.mark.parametrize("k,c_in,c_out,g,h,w", [
    (7, 16, 32, 4, 40, 96),     # enc1 class
    (7, 32, 32, 2, 41, 61),     # dec0 class, odd size
    (5, 32, 16, 4, 33, 61),     # dec1 class
])
def test_hiw_q_parity(k, c_in, c_out, g, h, w):
    assert hiw_q_ok(c_in, c_out, k, g)
    r = np.random.RandomState(0)
    x = jnp.asarray(r.rand(2, h, w, c_in) - 0.5, jnp.float32)
    wgt = jnp.asarray(r.rand(k, k, c_in, c_out) - 0.5, jnp.float32)
    bias = jnp.asarray(r.rand(c_out) - 0.5, jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=(0, 1, 2))
    want = _emulated_int8(x, wgt, amax, bias, "relu")
    got = conv_hiw_chain_q(_to_hmajor(x), wgt, k, h=h, w_valid=w,
                           c_in=c_in, amax=amax, bias=bias,
                           act="relu", g=g, interpret=True)
    got = _from_hmajor(got, h, w, c_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    # quantization error vs the f32 conv stays in budget
    f32 = _ref_conv(x, wgt, bias, "relu")
    rel = float(jnp.abs(got - f32).max() / (jnp.abs(f32).max() + 1e-8))
    assert rel < 0.02, rel


def test_hiw_q_fused_sum():
    """fuse_n + in-kernel quantization of the summed input."""
    r = np.random.RandomState(1)
    h, w = 32, 64
    x = jnp.asarray(r.rand(4, h, w, 32) - 0.5, jnp.float32)
    wgt = jnp.asarray(r.rand(7, 7, 32, 32) - 0.5, jnp.float32)
    amax = jnp.max(jnp.abs(x[:2] + x[2:]), axis=(0, 1, 2))
    want = _emulated_int8(x[:2] + x[2:], wgt, amax, act="relu")
    got = conv_hiw_chain_q(_to_hmajor(x), wgt, 7, h=h, w_valid=w,
                           c_in=32, amax=amax, act="relu", g=2,
                           fuse_n=2, interpret=True)
    got = _from_hmajor(got, h, w, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_deepfuse_hiw_int8_path(monkeypatch):
    """DeepFuse under quantized_inference runs the int8 H-major chain
    (fat layers int8, gray entry/exit bf16) and stays within the
    quantization budget of the f32 forward."""
    from multi_modal_image_fusion_tpu.models import create_model
    from multi_modal_image_fusion_tpu.ops import layers as L
    from multi_modal_image_fusion_tpu.ops.quant import (calibrate,
                                                        quantized_inference)

    monkeypatch.setenv("MMIF_CHAIN_INTERPRET", "1")
    r = np.random.RandomState(3)
    img1 = jnp.asarray(r.rand(2, 40, 96, 1), jnp.float32)
    img2 = jnp.asarray(r.rand(2, 40, 96, 1), jnp.float32)
    model = create_model("deepfuse")
    variables = model.init(jax.random.PRNGKey(0), img1, img2, train=False)
    want = model.apply(variables, img1, img2, train=False)
    amax = calibrate(model, variables, [(img1, img2)])
    assert "enc1" in amax and "dec0" in amax
    with L.fast_inference(), quantized_inference(amax):
        got = model.apply(variables, img1, img2, train=False)
    rel = float(jnp.abs(got - want).max() / (jnp.abs(want).max() + 1e-8))

    # the NHWC int8 dispatch stays reachable with the chain disabled
    monkeypatch.setenv("MMIF_HIW_INT8", "0")
    with L.fast_inference(), quantized_inference(amax):
        got2 = model.apply(variables, img1, img2, train=False)
    rel2 = float(jnp.abs(got2 - want).max() / (jnp.abs(want).max() + 1e-8))

    # random-weight quantization error compounds over the 3 int8 layers
    # (~5% here); the PRODUCT accuracy gate is tools/int8_acceptance.py
    # (SSIM/Qabf <= 1e-3 on reference imagery, where the shipped NHWC
    # path measured 1.7e-4 dSSIM). The unit contract: the hiw-q chain is
    # quantized (not bit-equal to f32) and matches the shipped NHWC int8
    # scheme's error budget on the same inputs (measured 4.68% vs 4.76%).
    assert 1e-6 < rel < max(1.3 * rel2, 1e-2), (rel, rel2)


# ---------------------------------------------------------------------------
# int8-RESIDENT hop (round 5): producer requantizes its epilogue onto the
# consumer's fold grid (out_scale) and emits an int8 chain tensor; the
# consumer reads it directly (no in-kernel quantize pass), summing fused
# siblings on the integer grid.
# ---------------------------------------------------------------------------

from multi_modal_image_fusion_tpu.ops.pallas.hiw_int8 import (
    hiw_fold_scale, hiw_q_res_in_ok, hiw_q_res_out_ok)


def test_hiw_q_resident_hop():
    """enc1->dec0 class hop: producer out_scale output is bit-exact vs
    the emulated integer math, and the full 2-leg resident chain stays
    within the int8 error budget of the f32 chain."""
    r = np.random.RandomState(2)
    h, w, n = 40, 96, 2
    k1, k2 = 7, 7
    x = jnp.asarray(r.rand(2 * n, h, w, 16) - 0.5, jnp.float32)
    w1 = jnp.asarray(r.rand(k1, k1, 16, 32) - 0.5, jnp.float32)
    b1 = jnp.asarray(r.rand(32) - 0.5, jnp.float32)
    w2 = jnp.asarray(r.rand(k2, k2, 32, 32) - 0.5, jnp.float32)
    b2 = jnp.asarray(r.rand(32) - 0.5, jnp.float32)

    # f32 golden: conv -> relu -> siamese sum -> conv -> relu
    y1 = _ref_conv(x, w1, b1, "relu")
    golden = _ref_conv(y1[:n] + y1[n:], w2, b2, "relu")

    amax1 = jnp.max(jnp.abs(x), axis=(0, 1, 2))
    amax2 = jnp.max(jnp.abs(y1[:n] + y1[n:]), axis=(0, 1, 2))
    f2 = hiw_fold_scale(amax2, w2)
    assert hiw_q_res_in_ok(32, k2) and hiw_q_res_out_ok(32, 4)

    # producer: bf16-strip in, int8-resident out
    q1 = conv_hiw_chain_q(_to_hmajor(x), w1, k1, h=h, w_valid=w,
                          c_in=16, amax=amax1, bias=b1, act="relu",
                          g=4, out_scale=f2, interpret=True)
    assert q1.dtype == jnp.int8

    # emulated integer math, same op order as the kernel epilogue
    f1 = choose_fold(amax1, w1, "smooth")
    xq = jnp.clip(jnp.round(x * (1.0 / f1)), -127, 127)
    w1q, sw1 = quantize_weights(fold_weights(w1, f1))
    p = w1.shape[0] // 2
    xp = jnp.pad(xq, ((0, 0), (p, p), (p, p), (0, 0)), "reflect")
    pr = jax.lax.conv_general_dilated(
        xp, w1q.astype(jnp.float32), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    want_q1 = jnp.clip(jnp.round(jax.nn.relu(
        pr * (sw1 / f2) + b1 / f2)), -127, 127).astype(jnp.int8)
    got_q1 = _from_hmajor(q1, h, w, 32)
    np.testing.assert_array_equal(np.asarray(got_q1), np.asarray(want_q1))

    # consumer: int8-resident in (fused siamese sum on the int grid)
    y = conv_hiw_chain_q(q1, w2, k2, h=h, w_valid=w, c_in=32,
                         amax=amax2, bias=b2, act="relu", g=2,
                         fuse_n=n, out_dtype=jnp.float32, interpret=True)
    got = _from_hmajor(y, h, w, 32)
    assert got.dtype == jnp.float32

    # exact vs the emulated consumer on the integer sum
    qs = jnp.clip(want_q1[:n].astype(jnp.int32)
                  + want_q1[n:].astype(jnp.int32), -127, 127)
    w2q, sw2 = quantize_weights(fold_weights(w2, f2))
    qsp = jnp.pad(qs.astype(jnp.float32),
                  ((0, 0), (p, p), (p, p), (0, 0)), "reflect")
    want = jax.nn.relu(jax.lax.conv_general_dilated(
        qsp, w2q.astype(jnp.float32), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) * sw2 + b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    # and the end-to-end quantization error budget vs f32
    rel = float(jnp.abs(got - golden).max()
                / (jnp.abs(golden).max() + 1e-8))
    assert rel < 0.05, rel


def test_deepfuse_resident_matches_nonresident(monkeypatch):
    """The DeepFuse hiw-q chain with int8-resident strips stays within a
    quantum-level delta of the non-resident hiw-q chain (per-branch vs
    post-sum rounding is the only difference at f32 chain dtype)."""
    from multi_modal_image_fusion_tpu.models import create_model
    from multi_modal_image_fusion_tpu.ops import layers as L
    from multi_modal_image_fusion_tpu.ops.quant import (calibrate,
                                                        quantized_inference)

    monkeypatch.setenv("MMIF_CHAIN_INTERPRET", "1")
    r = np.random.RandomState(5)
    img1 = jnp.asarray(r.rand(2, 40, 96, 1), jnp.float32)
    img2 = jnp.asarray(r.rand(2, 40, 96, 1), jnp.float32)
    model = create_model("deepfuse")
    variables = model.init(jax.random.PRNGKey(0), img1, img2, train=False)
    want = model.apply(variables, img1, img2, train=False)
    amax = calibrate(model, variables, [(img1, img2)])

    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("MMIF_HIW_INT8_RES", flag)
        with L.fast_inference(), quantized_inference(amax):
            outs[flag] = model.apply(variables, img1, img2, train=False)
    scale = float(jnp.abs(want).max()) + 1e-8
    rel_res = float(jnp.abs(outs["1"] - want).max()) / scale
    rel_non = float(jnp.abs(outs["0"] - want).max()) / scale
    # per-branch rounding (resident) vs post-sum rounding is a quantum-
    # level difference (sqrt(2) on dec0's input rounding noise); the
    # contract here is that the resident path's f32 error stays within
    # 1.5x the non-resident chain's on the same inputs. The PRODUCT
    # accuracy gate is tools/acceptance.py (dSSIM/dQabf <= 1e-3 on
    # reference imagery vs the f32 golden).
    assert 1e-6 < rel_res < max(1.5 * rel_non, 1e-2), (rel_res, rel_non)
    # the paths genuinely diverge (both kernels ran, not one path twice)
    assert float(jnp.abs(outs["1"] - outs["0"]).max()) > 0
