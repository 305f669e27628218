"""Pallas kernel parity tests (interpreter mode on CPU; the compiled path is
exercised on real TPU by the CLIs/bench)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_image_fusion_tpu.ops.pallas.ssim_kernel import \
    ssim_maps_pallas
from multi_modal_image_fusion_tpu.ops.ssim import (default_sigma,
                                                   gaussian_kernel,
                                                   ssim_maps)


@pytest.mark.parametrize("use_padding", [False, True])
@pytest.mark.parametrize("shape", [(1, 64, 64), (2, 300, 257)])
def test_fused_ssim_kernel_parity(use_padding, shape):
    n, h, w = shape
    r = np.random.RandomState(0)
    x1 = jnp.asarray(r.rand(n, h, w, 1), jnp.float32)
    x2 = jnp.asarray(r.rand(n, h, w, 1), jnp.float32)
    k1d = gaussian_kernel(11, default_sigma(11))
    want = ssim_maps(x1, x2, k1d, 1.0, use_padding)
    got = ssim_maps_pallas(x1, x2, 11, 1.0, use_padding, interpret=True)
    for a, b in zip(got, want):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_ssim_kernel_metric_sigma():
    """The metric-side SSIM always uses sigma=1.5 (reference
    metric.py:299)."""
    r = np.random.RandomState(1)
    x1 = jnp.asarray(r.rand(1, 128, 128, 1) * 255, jnp.float32)
    x2 = jnp.asarray(r.rand(1, 128, 128, 1) * 255, jnp.float32)
    k1d = gaussian_kernel(11, 1.5)
    want = ssim_maps(x1, x2, k1d, 255.0, False)
    got = ssim_maps_pallas(x1, x2, 11, 255.0, False, sigma=1.5,
                           interpret=True)
    np.testing.assert_allclose(float(got[0].mean()), float(want[0].mean()),
                               atol=1e-5)
