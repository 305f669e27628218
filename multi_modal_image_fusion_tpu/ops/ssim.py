"""Gaussian-window SSIM core shared by losses and metrics.

The reference computes SSIM with a 2-D Gaussian window conv (loss.py:24-49,
metric.py:290-313). The 2-D window is the outer product of a 1-D kernel, so
on TPU we run it as two separable depthwise 1-D convs — identical math, half
the FLOPs and a much better VPU/MXU mapping. All functions take NHWC.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

eps = 1e-7


def gaussian_kernel(win_size, sigma):
    """1-D normalized Gaussian (reference loss.py:24-30)."""
    g = np.array([
        math.exp(-((x - win_size // 2) ** 2) / (2.0 * sigma ** 2))
        for x in range(win_size)
    ], dtype=np.float32)
    return g / g.sum()


def default_sigma(win_size):
    """reference loss.py:34: 1.5 for the canonical 11-tap window."""
    return 1.5 if win_size == 11 else 0.15 * (win_size - 1)


import functools


@functools.lru_cache(maxsize=256)
def _band_matrix(n_in, taps, reflect):
    """(n_in, n_out) f32 constant expressing a 1-D tap filter as a matmul:
    y[j] = sum_i x[i] * K[i, j]. reflect=True folds torch-style reflect
    padding into the matrix (n_out == n_in); reflect=False is VALID
    (n_out = n_in - ws + 1)."""
    ws = len(taps)
    p = ws // 2
    if reflect:
        n_out, off = n_in, -p
    else:
        n_out, off = n_in - ws + 1, 0
    K = np.zeros((n_in, n_out), np.float32)
    for j in range(n_out):
        for t in range(ws):
            i = j + off + t
            if i < 0:
                i = -i                       # reflect: index -i mirrors i
            elif i >= n_in:
                i = 2 * n_in - 2 - i
            K[i, j] += taps[t]
    return K


def separable_filter_mm(img, taps_h, taps_w, reflect=False):
    """Separable 1-D filtering of an NHWC C==1 image as two band-matrix
    matmuls on the MXU. XLA's C==1 depthwise-conv lowering runs at <1
    TFLOPS (lane-starved) — ~60x more matmul FLOPs still win ~30x
    wall-clock at eval resolutions, and the reflect boundary folds into
    the constant matrix. Gradient-friendly (used by training losses)."""
    x = img[..., 0]
    Kw = jnp.asarray(_band_matrix(x.shape[2], tuple(map(float, taps_w)),
                                  reflect))
    Kh = jnp.asarray(_band_matrix(x.shape[1], tuple(map(float, taps_h)),
                                  reflect))
    y = jnp.einsum("bhw,wj->bhj", x, Kw,
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("bhj,hi->bij", y, Kh,
                   precision=jax.lax.Precision.HIGHEST)
    return y[..., None]


def gaussian_filter(img, kernel1d, use_padding=False):
    """Separable depthwise Gaussian filter of an NHWC image. VALID conv
    (shrinks by win-1) unless use_padding (reflect, preserves shape) —
    matching reference _gaussian_fn (loss.py:42-49).

    C==1 images (the whole grayscale pipeline) route through band-matrix
    matmuls (separable_filter_mm); multi-channel falls back to depthwise
    convs."""
    k = jnp.asarray(kernel1d, img.dtype)
    ws = k.shape[0]
    c = img.shape[-1]
    if c == 1:
        taps = tuple(float(t) for t in np.asarray(kernel1d, np.float64))
        return separable_filter_mm(img, taps, taps, reflect=use_padding)
    if use_padding:
        p = ws // 2
        img = jnp.pad(img, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    kh = jnp.tile(k.reshape(ws, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k.reshape(1, ws, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    # f32 precision: SSIM terms are small differences of large filtered
    # moments; the default (bf16-truncated) conv precision costs ~5e-3 of
    # SSIM accuracy, violating the 1e-3 parity budget.
    y = jax.lax.conv_general_dilated(img, kh, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    y = jax.lax.conv_general_dilated(y, kw, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    return y


def ssim_maps(img1, img2, kernel1d, data_range, use_padding=False):
    """Per-pixel ssim / cs / sigma1_sq maps (reference loss.py:52-103).

    Returns (ssim, cs, sigma1_sq) full-resolution (minus window) maps.
    """
    mu1 = gaussian_filter(img1, kernel1d, use_padding)
    mu2 = gaussian_filter(img2, kernel1d, use_padding)

    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2

    sigma1_sq = jnp.clip(
        gaussian_filter(img1 * img1, kernel1d, use_padding) - mu1_sq, 0, None)
    sigma2_sq = jnp.clip(
        gaussian_filter(img2 * img2, kernel1d, use_padding) - mu2_sq, 0, None)
    sigma12 = gaussian_filter(img1 * img2, kernel1d, use_padding) - mu1_mu2

    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2

    m1 = 2.0 * mu1_mu2 + C1
    m2 = mu1_sq + mu2_sq + C1
    v1 = 2.0 * sigma12 + C2
    v2 = sigma1_sq + sigma2_sq + C2

    cs = v1 / v2
    ssim = (m1 * v1) / (m2 * v2)
    return ssim, cs, sigma1_sq


def infer_data_range(img1):
    """Data-dependent range inference (reference loss.py:60-63): 255 if the
    image looks 8-bit, [-1,1] if it looks tanh-normalized."""
    max_val = jnp.where(img1.max() > 128, 255.0, 1.0)
    min_val = jnp.where(img1.min() < -0.5, -1.0, 0.0)
    return max_val - min_val


def downsample_half(img):
    """Reflect-pad odd dims to even, then 2x2 avg pool (reference
    loss.py:147-153) — the MS-SSIM pyramid step."""
    h, w = img.shape[1:3]
    pad_h, pad_w = h % 2, w % 2
    if pad_h or pad_w:
        img = jnp.pad(img, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                      mode="reflect")
    s = jax.lax.reduce_window(img, 0.0, jax.lax.add, (1, 2, 2, 1),
                              (1, 2, 2, 1), "VALID")
    return s * 0.25


MSSSIM_WEIGHTS = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333],
                          dtype=np.float32)
