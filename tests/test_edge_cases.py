"""Edge-case parity: tiny images where the SSIM window shrinks to
min(win_size, h, w) — the loss derives sigma from the shrunken window
(0.15*(ws-1), reference loss.py:34) while the metric keeps sigma 1.5
(metric.py:299) — and MS-SSIM at the minimum 5-level size."""

import numpy as np
import pytest

from multi_modal_image_fusion_tpu.ops import losses as L
from multi_modal_image_fusion_tpu.ops import metrics as M

from conftest import nchw_to_nhwc


@pytest.mark.parametrize("key", ["8x8", "9x15", "16x300"])
def test_tiny_image_ssim(golden, key):
    d = golden("edge_cases")
    x1 = nchw_to_nhwc(d[f"x1_{key}"])
    x2 = nchw_to_nhwc(d[f"x2_{key}"])

    got = L.calc_ssim(x1, x2, data_range=1.0)["ssim"]
    np.testing.assert_allclose(np.asarray(got), d[f"loss_ssim_{key}"],
                               atol=1e-5)

    got_m = M.calc_ssim(x1 * 255, x2 * 255)
    np.testing.assert_allclose(float(got_m), d[f"metric_ssim_{key}"],
                               atol=1e-4)


def test_min_size_msssim(golden):
    d = golden("edge_cases")
    x1 = nchw_to_nhwc(d["x1_176x180"]) * 255
    x2 = nchw_to_nhwc(d["x2_176x180"]) * 255
    got = M.calc_msssim(x1, x2)
    np.testing.assert_allclose(float(got), d["metric_msssim_176x180"],
                               atol=1e-4)
