"""Parity of the 17 IQA metrics vs the PyTorch reference
(reference core/metric.py; fixtures from tools/gen_golden.py).

Tolerance notes: the BASELINE parity budget is 1e-3 on SSIM/Qabf; most
metrics here agree to ~1e-5. Histogram metrics are exact up to float
summation order.
"""

import numpy as np
import pytest

from multi_modal_image_fusion_tpu.ops import metrics as M

from conftest import nchw_to_nhwc


def _load(golden):
    d = golden("metrics")
    x1 = nchw_to_nhwc(d["x1"])
    x2 = nchw_to_nhwc(d["x2"])
    y = nchw_to_nhwc(d["y"])
    return d, x1, x2, y


def check(got, want, atol=1e-4, rtol=1e-4):
    np.testing.assert_allclose(np.asarray(got), want, atol=atol, rtol=rtol)


def test_statistics(golden):
    d, x1, x2, y = _load(golden)
    check(M.calc_mean(y), d["mean"])
    check(M.calc_std(y), d["std"], atol=1e-3)
    check(M.calc_ag(y), d["ag"], atol=1e-3)
    check(M.calc_sf(y), d["sf"], atol=1e-3)
    mse = M.calc_mse(x1, y)
    check(mse, d["mse"], atol=1e-6)
    check(M.calc_psnr(mse), d["psnr"], atol=1e-4)
    check(M.calc_psnr(mse, root=True), d["psnr_root"], atol=1e-4)
    check(M.calc_cc(x1, y), d["cc"], atol=1e-4)
    check(M.calc_scd(x1, x2, y), d["scd"], atol=1e-3)


def test_information(golden):
    d, x1, x2, y = _load(golden)
    x1q, yq = np.round(x1), np.round(y)
    check(M.calc_entropy(x1q), d["entropy"], atol=1e-4)
    check(M.calc_cross_ent(x1q, yq), d["cross_ent"], atol=1e-4)
    check(M.calc_joint_ent(x1q, yq), d["joint_ent"], atol=1e-4)
    check(M.calc_mul_info(x1q, yq), d["mi"], atol=1e-4)
    check(M.calc_mul_info(x1q, yq, normalized=True), d["mi_norm"], atol=1e-4)


def test_qabf_family(golden):
    d, x1, x2, y = _load(golden)
    check(M.calc_Qabf(x1, x2, y, L=1.5), d["qabf"], atol=1e-4)
    q, n, l = M.calc_Qabf(x1, x2, y, L=1.5, full=True)
    check(np.array([q, n, l]), d["qabf_full"], atol=1e-4)
    check(M.calc_Nabf(x1, x2, y, modified=True), d["nabf_mod"], atol=1e-4)
    check(M.calc_Nabf(x1, x2, y, modified=False), d["nabf_orig"], atol=1e-4)
    check(M.calc_Labf(x1, x2, y), d["labf"], atol=1e-4)
    # sanity: the three-way split sums to 1 (reference metric.py:254)
    np.testing.assert_allclose(float(q) + float(n) + float(l), 1.0,
                               atol=1e-5)


def test_ssim_metric(golden):
    d, x1, x2, y = _load(golden)
    check(M.calc_ssim(x1, y), d["ssim_255"], atol=1e-4)
    check(M.calc_ssim(x1 / 255.0, y / 255.0, data_range=1.0), d["ssim_1"],
          atol=1e-4)
    s, c = M.calc_ssim(x1, y, full=True)
    check(np.array([s, c]), d["ssim_cs"], atol=1e-4)
    check(M.calc_msssim(x1, y), d["msssim"], atol=1e-4)


def test_viff(golden):
    d, x1, x2, y = _load(golden)
    check(M.calc_viff(x1, x2, y, simple=True), d["viff_simple"], atol=1e-3,
          rtol=1e-3)
    check(M.calc_viff(x1, x2, y, simple=False), d["viff_weighted"],
          atol=1e-3, rtol=1e-3)


def test_eval_metrics_bundle_is_jittable(golden):
    import jax

    d, x1, x2, y = _load(golden)
    out = jax.jit(M.eval_metrics)(x1, x2, y)
    check(out["qabf"], d["qabf_full"][0], atol=1e-3)
    check(out["ssim"], (d["ssim_255"] + np.asarray(M.calc_ssim(x2, y))) / 2,
          atol=1e-3)
