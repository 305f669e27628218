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


# ---------------------------------------------------------------------------
# multi-leg (concat-consuming) kernel
# ---------------------------------------------------------------------------

from multi_modal_image_fusion_tpu.ops.pallas.hiw_kernel import (  # noqa: E402
    conv_hiw_chain_multi, hiw_identity_weights)


def test_hiw_multi_dense_concat():
    """conv(concat(x0, y1, y2)) as three legs == XLA on the concat
    (DenseBlock growth, reference core/block.py:137-151)."""
    r = np.random.RandomState(4)
    h, w = 40, 96
    x0 = jnp.asarray(r.rand(2, h, w, 16) - 0.5, jnp.float32)
    y1 = jnp.asarray(r.rand(2, h, w, 16) - 0.5, jnp.float32)
    y2 = jnp.asarray(r.rand(2, h, w, 8) - 0.5, jnp.float32)
    wgt = jnp.asarray(r.rand(3, 3, 40, 16) - 0.5, jnp.float32)
    bias = jnp.asarray(r.rand(16) - 0.5, jnp.float32)
    want = _ref_conv(jnp.concatenate([x0, y1, y2], -1), wgt, bias, "relu")
    got = conv_hiw_chain_multi(
        (_to_hmajor(x0), _to_hmajor(y1), _to_hmajor(y2)), wgt, 3, h=h,
        w_valid=w, c_ins=(16, 16, 8), b_offs=(0, 0, 0), n_out=2, bias=bias,
        act="relu", interpret=True)
    got = _from_hmajor(got, h, w, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_hiw_multi_cross_batch_concat():
    """concat fusion across siamese batch halves via b_offs
    (VIFNet/PFNetv1 decoder entry, reference core/model.py:189-206)."""
    r = np.random.RandomState(5)
    h, w = 33, 61
    x = jnp.asarray(r.rand(4, h, w, 16) - 0.5, jnp.float32)
    wgt = jnp.asarray(r.rand(3, 3, 32, 24) - 0.5, jnp.float32)
    want = _ref_conv(jnp.concatenate([x[:2], x[2:]], -1), wgt, act="relu")
    t = _to_hmajor(x)
    got = conv_hiw_chain_multi(
        (t, t), wgt, 3, h=h, w_valid=w, c_ins=(16, 16), b_offs=(0, 2),
        n_out=2, act="relu", interpret=True)
    got = _from_hmajor(got, h, w, 24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_hiw_multi_fused_sum_legs():
    """Dense legs + siamese-sum fusion in the DMA (DenseFuse dec0:
    conv(concat-parts of feat1 + feat2), reference model.py:165-186)."""
    r = np.random.RandomState(6)
    h, w = 32, 64
    x0 = jnp.asarray(r.rand(4, h, w, 16) - 0.5, jnp.float32)
    y1 = jnp.asarray(r.rand(4, h, w, 16) - 0.5, jnp.float32)
    wgt = jnp.asarray(r.rand(3, 3, 32, 16) - 0.5, jnp.float32)
    f1 = jnp.concatenate([x0[:2], y1[:2]], -1)
    f2 = jnp.concatenate([x0[2:], y1[2:]], -1)
    want = _ref_conv(f1 + f2, wgt, act="relu")
    got = conv_hiw_chain_multi(
        (_to_hmajor(x0), _to_hmajor(y1)), wgt, 3, h=h, w_valid=w,
        c_ins=(16, 16), b_offs=(0, 0), n_out=2, act="relu", fuse_n=2,
        interpret=True)
    got = _from_hmajor(got, h, w, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_hiw_multi_identity_leg_residual():
    """act(conv(z) + x) as [z, x] legs with an identity-kernel second leg
    (ResBlock adds without an XLA elementwise pass, model.py:531-552)."""
    r = np.random.RandomState(7)
    h, w = 40, 96
    z = jnp.asarray(r.rand(2, h, w, 16) - 0.5, jnp.float32)
    x = jnp.asarray(r.rand(2, h, w, 16) - 0.5, jnp.float32)
    wgt = jnp.asarray(r.rand(3, 3, 16, 16) - 0.5, jnp.float32)
    want = jax.nn.relu(_ref_conv(z, wgt) + x)
    wcat = jnp.concatenate([wgt, hiw_identity_weights(3, 16)], axis=2)
    got = conv_hiw_chain_multi(
        (_to_hmajor(z), _to_hmajor(x)), wcat, 3, h=h, w_valid=w,
        c_ins=(16, 16), b_offs=(0, 0), n_out=2, act="relu", interpret=True)
    got = _from_hmajor(got, h, w, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_hiw_multi_k1_transfer():
    """k=1 channel matmul over legs (PMGI transfer convs,
    model.py:555-624): no halos, no rolls."""
    r = np.random.RandomState(8)
    h, w = 24, 40
    a = jnp.asarray(r.rand(2, h, w, 16) - 0.5, jnp.float32)
    b = jnp.asarray(r.rand(2, h, w, 16) - 0.5, jnp.float32)
    wgt = jnp.asarray(r.rand(1, 1, 32, 16) - 0.5, jnp.float32)
    bias = jnp.asarray(r.rand(16) - 0.5, jnp.float32)
    want = _ref_conv(jnp.concatenate([a, b], -1), wgt, bias, "relu")
    got = conv_hiw_chain_multi(
        (_to_hmajor(a), _to_hmajor(b)), wgt, 1, h=h, w_valid=w,
        c_ins=(16, 16), b_offs=(0, 0), n_out=2, bias=bias, act="relu",
        interpret=True)
    got = _from_hmajor(got, h, w, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_hiw_multi_gray_legs():
    """1-channel legs with folded duplicate weights (PMGI entry
    concat((i1, i1, i2)) -> legs [i1, i2], model.py:614-624)."""
    r = np.random.RandomState(9)
    h, w = 40, 96
    i1 = jnp.asarray(r.rand(2, h, w, 1), jnp.float32)
    i2 = jnp.asarray(r.rand(2, h, w, 1), jnp.float32)
    wgt = jnp.asarray(r.rand(5, 5, 3, 16) - 0.5, jnp.float32)
    want = _ref_conv(jnp.concatenate([i1, i1, i2], -1), wgt, act="relu")
    wfold = jnp.concatenate(
        [wgt[:, :, 0:1] + wgt[:, :, 1:2], wgt[:, :, 2:3]], axis=2)
    got = conv_hiw_chain_multi(
        (hiw_enter(i1), hiw_enter(i2)), wfold, 5, h=h, w_valid=w,
        c_ins=(1, 1), b_offs=(0, 0), n_out=2, act="relu", interpret=True)
    got = _from_hmajor(got, h, w, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("name", [
    "densefuse", "vifnet", "pfnetv1", "ifcnn", "difnet", "pmgi",
    "nestfuse", "rfnnest", "unfusion", "myfusion", "res2fusion", "mafusion", "dbnet", "pfnetv2"])
def test_model_hiw_path_parity(name, monkeypatch):
    """Whole-model forwards through the multi-leg H-major chain
    (MMIF_CHAIN_HIW=1, interpret kernels) == the plain NHWC forwards."""
    from multi_modal_image_fusion_tpu.models import create_model
    from multi_modal_image_fusion_tpu.ops import layers as L

    monkeypatch.setenv("MMIF_CHAIN_INTERPRET", "1")
    monkeypatch.setenv("MMIF_CHAIN_HIW_MULTI", "1")
    r = np.random.RandomState(10)
    img1 = jnp.asarray(r.rand(2, 41, 61, 1), jnp.float32)
    img2 = jnp.asarray(r.rand(2, 41, 61, 1), jnp.float32)
    model = create_model(name)
    variables = model.init(jax.random.PRNGKey(0), img1, img2, train=False)
    want = model.apply(variables, img1, img2, train=False)
    with L.fast_inference():
        got = model.apply(variables, img1, img2, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
