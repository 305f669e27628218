"""Loss-stack parity vs the PyTorch reference (reference core/loss.py),
fixtures from tools/gen_golden.py."""

import numpy as np
import pytest

from multi_modal_image_fusion_tpu.ops import losses as L

from conftest import nchw_to_nhwc


def _load(golden):
    d = golden("losses")
    return d, nchw_to_nhwc(d["x1"]), nchw_to_nhwc(d["x2"]), nchw_to_nhwc(
        d["y"])


@pytest.mark.parametrize("mode", ["ssim", "w-ssim", "ms-ssim", "msw-ssim"])
def test_ssim_loss(golden, mode):
    d, x1, x2, y = _load(golden)
    got = float(L.SSIMLoss(mode, weight=1.0)(x1, x2, y))
    np.testing.assert_allclose(got, d[f"ssimloss_{mode}"], atol=2e-5)


@pytest.mark.parametrize("mode", ["l1", "l2"])
@pytest.mark.parametrize("m", ["avg", "max"])
def test_pixel_loss(golden, mode, m):
    d, x1, x2, y = _load(golden)
    got = float(L.PixelLoss(mode, weight=1.0)(x1, x2, y, mode=m))
    np.testing.assert_allclose(got, d[f"pixel_{mode}_{m}"], atol=1e-6)


@pytest.mark.parametrize("mode", ["l1", "l2"])
@pytest.mark.parametrize("m", ["avg", "max"])
def test_grad_loss(golden, mode, m):
    d, x1, x2, y = _load(golden)
    got = float(L.GradLoss(mode, weight=1.0)(x1, x2, y, mode=m))
    np.testing.assert_allclose(got, d[f"grad_{mode}_{m}"], atol=1e-5)


@pytest.mark.parametrize("mode", ["l1", "l2"])
def test_tv_norm_loss(golden, mode):
    d, x1, _, y = _load(golden)
    got = float(L.TVLoss(mode, weight=1.0)(y - x1))
    np.testing.assert_allclose(got, d[f"tv_{mode}"], atol=1e-6)
    got = float(L.NormLoss(mode, weight=1.0)(y - x1))
    np.testing.assert_allclose(got, d[f"norm_{mode}"], atol=1e-6)


def test_calc_ssim_dict(golden):
    d, x1, _, y = _load(golden)
    out = L.calc_ssim(x1, y, data_range=1.0)
    np.testing.assert_allclose(np.asarray(out["ssim"]), d["ssim_vec"],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["cs"]), d["cs_vec"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["sigma"]), d["sigma_vec"],
                               atol=1e-5)


def test_calc_ssim_padded_map(golden):
    d, x1, _, y = _load(golden)
    out = L.calc_ssim(x1, y, data_range=1.0, use_padding=True,
                      size_average=False)
    got = np.transpose(np.asarray(out["ssim"]), (0, 3, 1, 2))
    np.testing.assert_allclose(got, d["ssim_map"], atol=1e-5)


def test_calc_msssim(golden):
    d, x1, _, y = _load(golden)
    got = np.asarray(L.calc_msssim(x1, y, data_range=1.0))
    np.testing.assert_allclose(got, d["msssim_vec"], atol=1e-5)


def test_ssim_loss_is_differentiable():
    import jax
    import jax.numpy as jnp

    x1 = jnp.linspace(0, 1, 2 * 64 * 64).reshape(2, 64, 64, 1)
    x2 = x1[:, ::-1]
    loss_fn = lambda y: (L.SSIMLoss("ssim")(x1, x2, y) +
                         L.PixelLoss("l1")(x1, x2, y, "max") +
                         L.GradLoss("l1")(x1, x2, y, "max"))
    g = jax.grad(loss_fn)((x1 + x2) / 2)
    assert np.isfinite(np.asarray(g)).all()
