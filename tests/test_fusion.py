"""Parity of the 8 fusion strategies vs the PyTorch reference
(fixtures from tools/gen_golden.py; reference core/fusion.py)."""

import numpy as np
import pytest

from multi_modal_image_fusion_tpu.ops import fusion as F

from conftest import nchw_to_nhwc, nhwc_to_nchw


def _load(golden):
    d = golden("fusion")
    t1 = nchw_to_nhwc(d["t1"])
    t2 = nchw_to_nhwc(d["t2"])
    return d, t1, t2


@pytest.mark.parametrize("mode", ["sum", "mean", "max"])
def test_element_fusion(golden, mode):
    d, t1, t2 = _load(golden)
    got = np.asarray(F.element_fusion(t1, t2, mode))
    np.testing.assert_allclose(nhwc_to_nchw(got), d[f"elem_{mode}"],
                               atol=1e-6)


def test_weighted_fusion(golden):
    d, t1, t2 = _load(golden)
    got = np.asarray(F.weighted_fusion(t1, t2, t1.mean(), t2.mean()))
    np.testing.assert_allclose(nhwc_to_nchw(got), d["weighted"], atol=1e-6)


@pytest.mark.parametrize("mode", ["sa", "ca", "sca", "wavg"])
def test_attention_fusion(golden, mode):
    d, t1, t2 = _load(golden)
    got = np.asarray(F.attention_fusion(t1, t2, mode))
    np.testing.assert_allclose(nhwc_to_nchw(got), d[f"attn_{mode}"],
                               atol=1e-5)


@pytest.mark.parametrize("mode", ["sum", "mean", "l1", "l2", "linf", "nl"])
def test_spatial_pooling(golden, mode):
    d, t1, _ = _load(golden)
    got = np.asarray(F.spatial_pooling(t1, mode))
    np.testing.assert_allclose(nhwc_to_nchw(got), d[f"spool_{mode}"],
                               atol=1e-5)


@pytest.mark.parametrize("mode", ["avg", "max", "nuclear", "nl"])
def test_channel_pooling(golden, mode):
    d, t1, _ = _load(golden)
    got = np.asarray(F.channel_pooling(t1, mode))
    atol = 1e-3 if mode == "nuclear" else 1e-5   # SVD backends differ
    np.testing.assert_allclose(nhwc_to_nchw(got), d[f"cpool_{mode}"],
                               atol=atol)


def test_attention_fusion_nonlocal(golden):
    d, t1, t2 = _load(golden)
    got = np.asarray(
        F.attention_fusion(t1, t2, "sca", spatial_mode="nl",
                           channel_mode="nl"))
    np.testing.assert_allclose(nhwc_to_nchw(got), d["attn_nl"], atol=1e-4)


def test_concat_fusion(golden):
    d, t1, t2 = _load(golden)
    got = np.asarray(F.concat_fusion((t1, t2)))
    assert got.shape[-1] == t1.shape[-1] * 2
    np.testing.assert_allclose(got[..., :t1.shape[-1]], t1)


def test_nl_spatial_blocked_matches_dense():
    """The streaming full-res path must equal the dense path exactly."""
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.ops.fusion import (_avg_pool8,
                                                         _nl_spatial_blocked)

    r = np.random.RandomState(0)
    t = jnp.asarray(r.rand(1, 64, 96, 8), jnp.float32)
    b, h, w, c = t.shape
    pooled = _avg_pool8(t)
    q = t.reshape(b, h * w, c)
    k = pooled.reshape(b, -1, c)

    e = np.einsum("bnc,bmc->bnm", np.asarray(q), np.asarray(k))
    e = (e - e.min()) / (e.max() - e.min())
    a = np.exp(e - e.max(-1, keepdims=True))
    a /= a.sum(-1, keepdims=True)
    want = np.einsum("bnm,bmc->bnc", a, np.asarray(k))

    got = np.asarray(_nl_spatial_blocked(q, k, block=1000))  # ragged blocks
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_attention_fusion_nl_bf16_close_to_f32():
    """bf16 features take the single-pass MXU dot (f32 accumulation); the
    result must track the exact-f32 path within bf16 rounding budget and come
    back in the input dtype so the downstream decoder stays bf16."""
    import jax.numpy as jnp

    r = np.random.RandomState(1)
    t1 = np.asarray(r.rand(1, 64, 96, 8), np.float32)
    t2 = np.asarray(r.rand(1, 64, 96, 8), np.float32)
    want = np.asarray(F.attention_fusion(jnp.asarray(t1), jnp.asarray(t2),
                                         "sca", spatial_mode="nl",
                                         channel_mode="nl"))
    got = F.attention_fusion(jnp.asarray(t1, jnp.bfloat16),
                             jnp.asarray(t2, jnp.bfloat16),
                             "sca", spatial_mode="nl", channel_mode="nl")
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=2e-2, rtol=2e-2)
