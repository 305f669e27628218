"""H-major scale-transition / fusion ops (ops/pallas/hiw_scale.py) vs
their NHWC references. Pure XLA on CPU — fast tier."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_image_fusion_tpu.ops.pallas.conv_kernel import (
    CHAIN_GUARD, CHAIN_WG)
from multi_modal_image_fusion_tpu.ops.pallas.hiw_scale import (
    hiw_attention_fusion, hiw_max_pool, hiw_place, hiw_resize,
    hiw_upsample, hiw_valid)


def _to_hmajor(x):
    """NHWC -> H-major chain tensor (valid region placed, guards zero)."""
    return hiw_place(jnp.transpose(x, (0, 1, 3, 2)))


def _from_hmajor(xt, c, h, w):
    return jnp.transpose(hiw_valid(xt, c, h, w), (0, 1, 3, 2))


def test_hiw_place_valid_roundtrip():
    r = np.random.RandomState(0)
    x = jnp.asarray(r.rand(2, 21, 33, 24), jnp.float32)
    xt = _to_hmajor(x)
    assert xt.ndim == 3
    np.testing.assert_array_equal(np.asarray(_from_hmajor(xt, 24, 21, 33)),
                                  np.asarray(x))


@pytest.mark.parametrize("h,w", [(20, 32), (21, 33)])
def test_hiw_max_pool(h, w):
    r = np.random.RandomState(1)
    x = jnp.asarray(r.rand(2, h, w, 16), jnp.float32)
    want = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    got, (ph, pw) = hiw_max_pool(_to_hmajor(x), 16, h, w)
    assert (ph, pw) == (h // 2, w // 2)
    np.testing.assert_array_equal(
        np.asarray(_from_hmajor(got, 16, ph, pw)), np.asarray(want))


@pytest.mark.parametrize("mode", ["nearest", "bilinear"])
@pytest.mark.parametrize("to_hw", [(20, 30), (21, 33)])
def test_hiw_upsample(mode, to_hw):
    from multi_modal_image_fusion_tpu.ops.pallas.chain_ops import (
        chain_place, chain_upsample)
    r = np.random.RandomState(2)
    h, w = 10, 15
    x = jnp.asarray(r.rand(2, h, w, 8), jnp.float32)
    nchw = jnp.transpose(x, (0, 3, 1, 2))
    want_t, _ = chain_upsample(chain_place(nchw), h, w, to_hw, 2, mode)
    want = want_t[:, :, CHAIN_GUARD:CHAIN_GUARD + to_hw[0],
                  CHAIN_WG:CHAIN_WG + to_hw[1]]
    got = hiw_upsample(_to_hmajor(x), 8, h, w, to_hw, 2, mode)
    got_nchw = jnp.transpose(_from_hmajor(got, 8, *to_hw), (0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(got_nchw), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_hiw_resize_crop_and_pad():
    from multi_modal_image_fusion_tpu.ops.pallas.chain_ops import (
        chain_place, chain_resize)
    r = np.random.RandomState(3)
    h, w = 14, 19
    x = jnp.asarray(r.rand(1, h, w, 8), jnp.float32)
    for to_hw in [(12, 22), (17, 16)]:
        nchw = jnp.transpose(x, (0, 3, 1, 2))
        want_t, _ = chain_resize(chain_place(nchw), h, w, to_hw)
        want = want_t[:, :, CHAIN_GUARD:CHAIN_GUARD + to_hw[0],
                      CHAIN_WG:CHAIN_WG + to_hw[1]]
        got = hiw_resize(_to_hmajor(x), 8, h, w, to_hw)
        got_nchw = jnp.transpose(_from_hmajor(got, 8, *to_hw), (0, 3, 1, 2))
        np.testing.assert_array_equal(np.asarray(got_nchw),
                                      np.asarray(want))


@pytest.mark.parametrize("mode", ["sa", "ca", "sca", "wavg"])
def test_hiw_attention_fusion(mode):
    from multi_modal_image_fusion_tpu.ops.fusion import attention_fusion
    r = np.random.RandomState(4)
    n, h, w, c = 2, 18, 25, 16
    x1 = jnp.asarray(r.rand(n, h, w, c), jnp.float32)
    x2 = jnp.asarray(r.rand(n, h, w, c), jnp.float32)
    want = attention_fusion(x1, x2, mode)
    xt = _to_hmajor(jnp.concatenate([x1, x2], axis=0))
    got = hiw_attention_fusion(xt, n, c, h, w, mode=mode)
    np.testing.assert_allclose(
        np.asarray(_from_hmajor(got, c, h, w)), np.asarray(want),
        rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("h,w", [(20, 32), (21, 33)])
def test_hiw_stride_dw(h, w):
    """Strided dw (ksize == stride == 2, padding 0) as a weighted
    stride-pool == the grouped XLA conv (TransitionBlock down)."""
    from multi_modal_image_fusion_tpu.ops.pallas.hiw_scale import (
        hiw_stride_dw)
    r = np.random.RandomState(5)
    c = 16
    x = jnp.asarray(r.rand(2, h, w, c) - 0.5, jnp.float32)
    wd = jnp.asarray(r.rand(2, 2, c) - 0.5, jnp.float32)
    bias = jnp.asarray(r.rand(c) - 0.5, jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, wd[:, :, None, :], (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    want = jnp.clip(want + bias, 0.0, 6.0)
    got, (oh, ow) = hiw_stride_dw(_to_hmajor(x), c, h, w, wd, bias,
                                  "relu6", stride=2)
    assert (oh, ow) == (want.shape[1], want.shape[2])
    np.testing.assert_allclose(
        np.asarray(_from_hmajor(got, c, oh, ow)), np.asarray(want),
        rtol=1e-5, atol=1e-6)
