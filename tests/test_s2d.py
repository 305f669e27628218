"""Space-to-depth conv packing: numerical equivalence to the original
reflect-SAME conv (ops/s2d.py). The packed conv computes the SAME sums, so
agreement is f32-rounding tight."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_image_fusion_tpu.ops.s2d import (
    s2d_pack, s2d_pack_bias, s2d_pack_nchw, s2d_pack_weights, s2d_span,
    s2d_unpack, s2d_unpack_nchw)


def _conv_reflect_same(x, w):
    p = w.shape[0] // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_pack_unpack_roundtrip():
    r = np.random.RandomState(0)
    x = jnp.asarray(r.rand(2, 8, 12, 3), jnp.float32)
    for f in (2, 4):
        assert jnp.array_equal(s2d_unpack(s2d_pack(x, f), f), x)
    xc = jnp.transpose(x, (0, 3, 1, 2))
    for f in (2, 4):
        assert jnp.array_equal(s2d_unpack_nchw(s2d_pack_nchw(xc, f), f), xc)


def test_pack_layout_phase_major():
    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    p = s2d_pack(x, 2)
    for py in range(2):
        for px in range(2):
            for c in range(3):
                assert jnp.array_equal(p[..., (py * 2 + px) * 3 + c],
                                       x[:, py::2, px::2, c])


@pytest.mark.parametrize("k,f,kp", [(3, 2, 3), (5, 2, 3), (7, 2, 5),
                                    (5, 4, 3), (7, 4, 3)])
def test_span(k, f, kp):
    assert s2d_span(k, f) == kp


@pytest.mark.parametrize("k", [3, 5, 7])
@pytest.mark.parametrize("f", [2, 4])
@pytest.mark.parametrize("cin,cout", [(1, 16), (16, 32), (32, 32)])
def test_packed_conv_equals_reflect_same(k, f, cin, cout):
    """unpack(conv_valid(pack(reflect_pad(x)), packed_w)) == reflect-SAME
    conv. The outer reflect pad is f*(kp//2) >= k//2 wide so the packed
    VALID conv's receptive field is fully covered (extra taps hit zero
    weights)."""
    r = np.random.RandomState(k * 10 + f + cin)
    h, w = 16, 24
    x = jnp.asarray(r.rand(2, h, w, cin) - 0.5, jnp.float32)
    wgt = jnp.asarray(r.rand(k, k, cin, cout) - 0.5, jnp.float32)

    ref = _conv_reflect_same(x, wgt)

    kp = s2d_span(k, f)
    pt = kp // 2
    pad = f * pt
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                 mode="reflect")
    packed = s2d_pack(xp, f)
    wp = s2d_pack_weights(wgt, f)
    yp = jax.lax.conv_general_dilated(
        packed, wp, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = s2d_unpack(yp, f)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_packed_bias():
    b = jnp.asarray([1.0, 2.0, 3.0])
    bp = s2d_pack_bias(b, 2)
    assert bp.shape == (12,)
    assert jnp.array_equal(bp.reshape(4, 3), jnp.tile(b, (4, 1)))


def test_chained_packed_convs_match_chained_reflect_same():
    """Two chained reflect-SAME convs stay equivalent when BOTH run packed
    (the halo between packed layers is the packed reflect extension) —
    the property the s2d chain path relies on."""
    r = np.random.RandomState(7)
    x = jnp.asarray(r.rand(1, 12, 16, 4) - 0.5, jnp.float32)
    w1 = jnp.asarray(r.rand(5, 5, 4, 8) - 0.5, jnp.float32)
    w2 = jnp.asarray(r.rand(7, 7, 8, 4) - 0.5, jnp.float32)
    ref = _conv_reflect_same(_conv_reflect_same(x, w1), w2)

    f = 2

    def packed_reflect_same(xp_packed, wgt):
        # reflect halo applied IN PACKED COORDS: unpack -> reflect pad ->
        # repack is the semantics the kernel's per-phase mirrors implement
        k = wgt.shape[0]
        kp = s2d_span(k, f)
        pad = f * (kp // 2)
        xo = s2d_unpack(xp_packed, f)
        xo = jnp.pad(xo, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     mode="reflect")
        return jax.lax.conv_general_dilated(
            s2d_pack(xo, f), s2d_pack_weights(wgt, f), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y = s2d_unpack(packed_reflect_same(
        packed_reflect_same(s2d_pack(x, f), w1), w2), f)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
