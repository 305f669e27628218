"""Gradient parity of the differentiable Pallas conv (ops/pallas/conv_vjp)
against jax.lax.conv_general_dilated autodiff, in interpret mode on CPU.

Covers VERDICT round-2 item #5 (training path used zero Pallas): dx runs
the kernel on flipped weights, dw is the per-tap big-K einsum."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_image_fusion_tpu.ops.pallas.conv_vjp import conv_valid_fast


def _xla_conv(xp, w):
    return jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("k,cin,cout", [(3, 16, 16), (5, 8, 24), (7, 32, 1),
                                        (5, 1, 16)])
def test_grad_parity(k, cin, cout):
    r = np.random.RandomState(0)
    h, wd = 24, 40
    xp = jnp.asarray(r.rand(2, h + k - 1, wd + k - 1, cin) - 0.5,
                     jnp.float32)
    w = jnp.asarray(r.rand(k, k, cin, cout) - 0.5, jnp.float32)
    # scalar objective with a nonlinearity so dy isn't constant
    cot = jnp.asarray(r.rand(2, h, wd, cout), jnp.float32)

    def obj_fast(xp, w):
        return (jnp.tanh(conv_valid_fast(xp, w, k, True)) * cot).sum()

    def obj_ref(xp, w):
        return (jnp.tanh(_xla_conv(xp, w)) * cot).sum()

    y_f = conv_valid_fast(xp, w, k, True)
    y_r = _xla_conv(xp, w)
    assert float(jnp.abs(y_f - y_r).max()) < 1e-4

    gx_f, gw_f = jax.grad(obj_fast, argnums=(0, 1))(xp, w)
    gx_r, gw_r = jax.grad(obj_ref, argnums=(0, 1))(xp, w)
    scale_x = float(jnp.abs(gx_r).max()) + 1e-8
    scale_w = float(jnp.abs(gw_r).max()) + 1e-8
    assert float(jnp.abs(gx_f - gx_r).max()) / scale_x < 1e-3
    assert float(jnp.abs(gw_f - gw_r).max()) / scale_w < 1e-3


def test_loss_bundle_grad_parity():
    """End-to-end: gradient of the reference 3-loss bundle through a small
    two-conv model, kernel route vs XLA route (VERDICT #5's 1e-3 budget)."""
    from multi_modal_image_fusion_tpu.ops.losses import (GradLoss, PixelLoss,
                                                         SSIMLoss)

    r = np.random.RandomState(1)
    k = 5
    img1 = jnp.asarray(r.rand(2, 32, 32, 1), jnp.float32)
    img2 = jnp.asarray(r.rand(2, 32, 32, 1), jnp.float32)
    w1 = jnp.asarray(r.rand(k, k, 1, 16) - 0.5, jnp.float32) * 0.3
    w2 = jnp.asarray(r.rand(k, k, 16, 1) - 0.5, jnp.float32) * 0.3
    losses = [SSIMLoss("ssim", weight=1.0), PixelLoss("l1", weight=0.01),
              GradLoss("l1", weight=0.1)]

    def fwd(conv, params, x):
        w1, w2 = params
        p = (k - 1) // 2
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
        hmid = jax.nn.relu(conv(xp, w1))
        hp = jnp.pad(hmid, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
        return jnp.tanh(conv(hp, w2)) * 0.5 + 0.5

    def bundle(conv, params):
        imgf = fwd(conv, params, (img1 + img2) * 0.5)
        return sum(fn(img1, img2, imgf) for fn in losses)

    fast = lambda xp, w: conv_valid_fast(xp, w, k, True)
    g_f = jax.grad(lambda p: bundle(fast, p))((w1, w2))
    g_r = jax.grad(lambda p: bundle(_xla_conv, p))((w1, w2))
    for a, b in zip(g_f, g_r):
        scale = float(jnp.abs(b).max()) + 1e-8
        assert float(jnp.abs(a - b).max()) / scale < 1e-3


def test_fast_fits_gates_config4_spill_layer():
    """The fast-training route must refuse layers whose kernel launch
    register-spills in Mosaic (UNFusion's 1280-ch full-res scale-2 decode,
    BASELINE config #4) while keeping the patch-scale layers it was
    measured on."""
    from multi_modal_image_fusion_tpu.ops.pallas.conv_vjp import (
        conv_fast_fits)

    # the config-4 crash layer: c_in=1280, c_out=640, k3, f32, scale-2
    # width ~306 (1224/4) -> the t-scratch alone is 80 MB
    assert not conv_fast_fits(1280, 640, 306 + 2, 3, 4)
    # 64x64 patch training shapes (the measured fast_train regime) fit
    assert conv_fast_fits(64, 64, 66, 3, 4)
    assert conv_fast_fits(16, 32, 66, 3, 2)
    # dx orientation is covered too: a huge c_out with tiny c_in must
    # fail even though the forward orientation alone would pass rows=16
    assert not conv_fast_fits(16, 2048, 1226, 3, 4)
