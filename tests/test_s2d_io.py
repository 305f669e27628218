"""Packed s2d chain enter/exit strip kernels (ops/pallas/s2d_io.py) vs
the composed XLA path (chain_enter(s2d_pack(x)) / s2d_unpack(chain_exit)):
valid region identical (guards deliberately uninitialized), roundtrip is
the identity, and the bit-pun lane split/merge are exact inverses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_image_fusion_tpu.ops.pallas.conv_kernel import (
    CHAIN_GUARD, CHAIN_WG, chain_enter, chain_exit, chain_shape)
from multi_modal_image_fusion_tpu.ops.pallas.s2d_io import (
    _merge_lanes, _split_lanes, s2d_chain_enter, s2d_chain_exit, s2d_io_ok)
from multi_modal_image_fusion_tpu.ops.s2d import s2d_pack, s2d_unpack


def test_lane_split_merge_exact():
    r = np.random.RandomState(0)
    pairs = jnp.asarray(r.rand(16, 128) * 4 - 2, jnp.bfloat16)
    u = jax.lax.bitcast_convert_type(pairs.reshape(16, 64, 2), jnp.uint32)
    even, odd = _split_lanes(u)
    np.testing.assert_array_equal(np.asarray(even), np.asarray(pairs[:, 0::2]))
    np.testing.assert_array_equal(np.asarray(odd), np.asarray(pairs[:, 1::2]))
    np.testing.assert_array_equal(np.asarray(_merge_lanes(even, odd)),
                                  np.asarray(u))


# h=40 -> h2=20: one full chunk (16 rows) + the 4-row tail path;
# h=32 -> h2=16: aligned, no tail; h=264 -> h2=132: two chunks + tail
@pytest.mark.parametrize("h,w", [(40, 256), (32, 256), (264, 512)])
def test_s2d_enter_exit_parity(h, w):
    assert s2d_io_ok(h, w, jnp.bfloat16)
    r = np.random.RandomState(7)
    x = jnp.asarray(r.rand(3, h, w, 1) - 0.5, jnp.bfloat16)

    got = s2d_chain_enter(x, interpret=True)
    want = chain_enter(s2d_pack(x, 2))
    h2, w2 = h // 2, w // 2
    hg, wp = chain_shape(h2, w2)
    assert got.shape == (3, 4, hg, wp) == want.shape
    sl = (slice(None), slice(None), slice(CHAIN_GUARD, CHAIN_GUARD + h2),
          slice(CHAIN_WG, CHAIN_WG + w2))
    np.testing.assert_array_equal(np.asarray(got[sl]), np.asarray(want[sl]))

    back = s2d_chain_exit(got, h, w, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # exit also matches the composed path on the XLA-entered tensor
    back2 = s2d_chain_exit(want, h, w, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(back2),
        np.asarray(s2d_unpack(chain_exit(want, h2, w2), 2)))


def test_s2d_io_eligibility():
    assert s2d_io_ok(1224, 1024, jnp.bfloat16)      # headline shape
    assert not s2d_io_ok(1224, 1024, jnp.float32)   # 32-bit: no lane pun
    assert not s2d_io_ok(1226, 1024, jnp.bfloat16)  # h % 8
    assert not s2d_io_ok(1224, 640, jnp.bfloat16)   # w2 % 128


def test_deepfuse_s2d_io_path_bit_identical(monkeypatch):
    """MMIF_S2D_IO=1 swaps only the enter/exit glue of the packed chain
    (zoo.py DeepFuse) — the forward must be BIT-identical to the
    MMIF_S2D=1 XLA-glue path at an eligible shape (bf16, h%8, w%256)."""
    from multi_modal_image_fusion_tpu.models import create_model
    from multi_modal_image_fusion_tpu.ops.layers import fast_inference

    monkeypatch.setenv("MMIF_CHAIN_INTERPRET", "1")
    monkeypatch.setenv("MMIF_S2D", "1")
    r = np.random.RandomState(5)
    model = create_model("deepfuse")
    x1 = jnp.asarray(r.rand(2, 40, 256, 1), jnp.bfloat16)
    x2 = jnp.asarray(r.rand(2, 40, 256, 1), jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), x1.astype(jnp.float32),
                   x2.astype(jnp.float32), train=False)
    with fast_inference():
        want = model.apply(v, x1, x2, train=False)
        monkeypatch.setenv("MMIF_S2D_IO", "1")
        got = model.apply(v, x1, x2, train=False)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))
