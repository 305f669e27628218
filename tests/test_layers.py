"""ConvLayer / resample parity vs the PyTorch reference with transplanted
weights (fixtures from tools/gen_golden.py; reference core/block.py:26-118,
941-991). Verifies reflect-'SAME' padding, strides, grouped convs, transpose
conv arithmetic, norms, activations, and the odd-size shape-repair paths."""

import jax
import numpy as np
import pytest

from multi_modal_image_fusion_tpu.ops.blocks import Downsample, Upsample
from multi_modal_image_fusion_tpu.ops.layers import ConvLayer

from conftest import nchw_to_nhwc, nhwc_to_nchw


def conv_w(w):
    """torch conv weight (O, I/g, kh, kw) -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def deconv_w(w):
    """torch conv-transpose weight (I, O, kh, kw) -> our HWIO param (the
    layer flips spatially at apply time)."""
    return np.transpose(w, (2, 3, 0, 1))


CASES = {
    "k3": dict(ksize=3),
    "k5": dict(ksize=5),
    "k7": dict(ksize=7),
    "k1_pad0": dict(ksize=1),
    "stride2": dict(ksize=3, stride=2),
    "dw": dict(ksize=3, groups=8),
    "lrelu": dict(act="lrelu"),
    "tanh": dict(act="tanh"),
    "noact": dict(act=None),
    "gn": dict(norm="group"),
    "bn": dict(norm="batch"),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_convlayer_parity(golden, name):
    d = golden("layers")
    x = nchw_to_nhwc(d["x"])
    kw = dict(CASES[name])

    layer = ConvLayer(16, **kw)
    params = {
        "kernel": conv_w(d[f"{name}__sd__layers.0.weight"]),
        "bias": d[f"{name}__sd__layers.0.bias"],
    }
    variables = {"params": params}
    if kw.get("norm") == "group":
        params["norm"] = {
            "scale": d[f"{name}__sd__layers.1.weight"],
            "bias": d[f"{name}__sd__layers.1.bias"],
        }
    elif kw.get("norm") == "batch":
        params["norm"] = {
            "scale": d[f"{name}__sd__layers.1.weight"],
            "bias": d[f"{name}__sd__layers.1.bias"],
        }
        variables["batch_stats"] = {
            "norm": {
                "mean": d[f"{name}__sd__layers.1.running_mean"],
                "var": d[f"{name}__sd__layers.1.running_var"],
            }
        }

    with jax.default_matmul_precision("float32"):
        y = layer.apply(variables, x, train=False)
    np.testing.assert_allclose(nhwc_to_nchw(np.asarray(y)),
                               d[f"{name}__out"], atol=2e-5, rtol=1e-4)


def test_transpose_conv_parity(golden):
    d = golden("layers")
    x = nchw_to_nhwc(d["x"])
    layer = ConvLayer(4, stride=2, transpose=True)
    variables = {
        "params": {
            "kernel": deconv_w(d["deconv__sd__layers.0.weight"]),
            "bias": d["deconv__sd__layers.0.bias"],
        }
    }
    with jax.default_matmul_precision("float32"):
        y = layer.apply(variables, x, train=False)
    assert y.shape[1:3] == (x.shape[1] * 2, x.shape[2] * 2)
    np.testing.assert_allclose(nhwc_to_nchw(np.asarray(y)),
                               d["deconv__out"], atol=2e-5, rtol=1e-4)


def test_transpose_conv_subpixel_equivalence():
    """The subpixel phase decomposition (layers.transpose_conv_s2) must
    match the lhs-dilated formulation exactly (fp noise), including odd
    spatial sizes (SEDRFuse decodes 306x256 and 612x512 at full res)."""
    import jax.numpy as jnp

    from multi_modal_image_fusion_tpu.ops.layers import transpose_conv_s2

    r = np.random.RandomState(0)
    for (h, w, ci, co) in [(13, 17, 8, 4), (9, 6, 5, 7)]:
        x = jnp.asarray(r.rand(2, h, w, ci), np.float32)
        k = jnp.asarray(r.rand(3, 3, ci, co) - 0.5, np.float32)
        want = jax.lax.conv_general_dilated(
            x, jnp.flip(k, axis=(0, 1)), (1, 1), ((1, 2), (1, 2)),
            lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = transpose_conv_s2(x, k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-6)


def test_downsample_shape_repair(golden):
    d = golden("layers")
    x = nchw_to_nhwc(d["x"])          # (2, 21, 27, 8)
    target = (2, 21, 27, 8)
    mod = Downsample(2, 2)
    y = mod.apply({}, x, target)
    np.testing.assert_allclose(nhwc_to_nchw(np.asarray(y)),
                               d["down_pad__out"], atol=1e-6)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_upsample_shape_repair(golden, mode):
    d = golden("layers")
    small = nchw_to_nhwc(d["small"])  # (2, 10, 13, 8)
    target = (2, 21, 27, 8)
    mod = Upsample(mode, 2)
    y = mod.apply({}, small, target)
    np.testing.assert_allclose(nhwc_to_nchw(np.asarray(y)),
                               d[f"up_{mode}__out"], atol=1e-5)
