"""Halo-in-weights H-major chain conv parity (ops/pallas/hiw_kernel.py).

Interpret mode on CPU: the kernel must reproduce reflect-'SAME' XLA convs
(the reference ConvLayer semantics, core/block.py:26-99) exactly, with
the reflect halo mirrored in-kernel from garbage guard bands, through
chained layers, fused siamese-sum prologue, bias and activation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_modal_image_fusion_tpu.ops.pallas.conv_kernel import (
    CHAIN_GUARD, CHAIN_WG, chain_shape)
from multi_modal_image_fusion_tpu.ops.pallas.hiw_kernel import (
    conv_hiw_chain, hiw_enter, hiw_exit)


def _ref_conv(x, w, bias=None, act=None):
    p = w.shape[0] // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), "reflect")
    y = jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias
    if act == "relu":
        y = jax.nn.relu(y)
    return y


def _to_hmajor(x, garbage=7.75):
    """NHWC -> (B, HG*C, Wp) with GARBAGE guard bands, so the tests prove
    the in-kernel reflect mirrors (not pre-zeroed guards) feed the conv."""
    b, h, w, c = x.shape
    hg, wp = chain_shape(h, w)
    t = jnp.full((b, hg, c, wp), garbage, x.dtype)
    t = jax.lax.dynamic_update_slice(
        t, jnp.transpose(x, (0, 1, 3, 2)), (0, CHAIN_GUARD, 0, CHAIN_WG))
    return t.reshape(b, hg * c, wp)


def _from_hmajor(t, h, w, c):
    b, hgc, wp = t.shape
    t = t.reshape(b, hgc // c, c, wp)
    sl = t[:, CHAIN_GUARD:CHAIN_GUARD + h, :, CHAIN_WG:CHAIN_WG + w]
    return jnp.transpose(sl, (0, 1, 3, 2))


@pytest.mark.parametrize("k,c_in,c_out,h,w", [
    (7, 32, 32, 40, 130),    # dec0 shape class
    (5, 16, 32, 45, 61),     # odd h and w
    (7, 16, 32, 33, 96),     # h far from a rows multiple
    (5, 32, 16, 48, 128),
    (5, 16, 8, 24, 40),      # c_out < 8 needs g*c_out alignment
])
def test_hiw_conv_parity(k, c_in, c_out, h, w):
    r = np.random.RandomState(0)
    x = jnp.asarray(r.rand(2, h, w, c_in) - 0.5, jnp.float32)
    wgt = jnp.asarray(r.rand(k, k, c_in, c_out) - 0.5, jnp.float32)
    bias = jnp.asarray(r.rand(c_out) - 0.5, jnp.float32)
    want = _ref_conv(x, wgt, bias, "relu")
    t = _to_hmajor(x)
    got = conv_hiw_chain(t, wgt, k, h=h, w_valid=w, c_in=c_in, bias=bias,
                         act="relu", interpret=True)
    got = _from_hmajor(got, h, w, c_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_hiw_gray_entry_and_chain():
    """1-channel entry (misaligned `ext` DMA path) -> 16ch -> 1ch exit,
    chained through three layers with enter/exit round trip."""
    r = np.random.RandomState(1)
    h, w = 40, 96
    x = jnp.asarray(r.rand(2, h, w, 1), jnp.float32)
    w0 = jnp.asarray(r.rand(5, 5, 1, 16) - 0.5, jnp.float32)
    w1 = jnp.asarray(r.rand(7, 7, 16, 16) - 0.5, jnp.float32)
    w2 = jnp.asarray(r.rand(5, 5, 16, 1) - 0.5, jnp.float32)
    want = _ref_conv(_ref_conv(_ref_conv(x, w0, act="relu"), w1,
                               act="relu"), w2)
    t = hiw_enter(x)
    t = conv_hiw_chain(t, w0, 5, h=h, w_valid=w, c_in=1, act="relu",
                       interpret=True)
    t = conv_hiw_chain(t, w1, 7, h=h, w_valid=w, c_in=16, act="relu",
                       interpret=True)
    t = conv_hiw_chain(t, w2, 5, h=h, w_valid=w, c_in=16, interpret=True)
    got = hiw_exit(t, h, w)
    # f32 accumulation-order drift compounds over three layers
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_hiw_fused_siamese_sum():
    """fuse_n: conv(x1 + x2) folded into the input DMA."""
    r = np.random.RandomState(2)
    h, w = 32, 64
    x = jnp.asarray(r.rand(4, h, w, 16) - 0.5, jnp.float32)
    wgt = jnp.asarray(r.rand(7, 7, 16, 16) - 0.5, jnp.float32)
    want = _ref_conv(x[:2] + x[2:], wgt, act="relu")
    t = _to_hmajor(x)
    got = conv_hiw_chain(t, wgt, 7, h=h, w_valid=w, c_in=16, act="relu",
                         fuse_n=2, interpret=True)
    got = _from_hmajor(got, h, w, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_deepfuse_hiw_path_parity(monkeypatch):
    """Whole-model DeepFuse forward through the H-major chain
    (MMIF_CHAIN_HIW=1, interpret kernels) == the plain NHWC forward."""
    from multi_modal_image_fusion_tpu.models import create_model
    from multi_modal_image_fusion_tpu.ops import layers as L

    monkeypatch.setenv("MMIF_CHAIN_INTERPRET", "1")
    monkeypatch.setenv("MMIF_CHAIN_HIW", "1")
    r = np.random.RandomState(3)
    img1 = jnp.asarray(r.rand(2, 40, 96, 1), jnp.float32)
    img2 = jnp.asarray(r.rand(2, 40, 96, 1), jnp.float32)
    model = create_model("deepfuse")
    variables = model.init(jax.random.PRNGKey(0), img1, img2, train=False)
    want = model.apply(variables, img1, img2, train=False)
    with L.fast_inference():
        got = model.apply(variables, img1, img2, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
