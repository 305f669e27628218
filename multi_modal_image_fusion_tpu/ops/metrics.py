"""The 17 full-reference image-quality metrics (reference core/metric.py),
re-built as device-resident jnp functions over NHWC arrays.

Key TPU shifts vs the reference:
- histograms (EN/CE/MI) run on device via scatter-add instead of
  torch.histc / np.histogram2d (metric.py:113, 141-143) — same binning:
  256 equal bins over [0, 256), floor assignment;
- the VIF masking chain (metric.py:436-452) becomes a static sequence of
  jnp.where selects (order preserved exactly);
- everything is jit-able, so `eval` batches whole image sets on device
  (the reference loops per image on host, eval.py:181-231).

Images are expected in 0..255 float range (like the reference's eval path,
which reads dumped uint8 files) unless a data_range says otherwise.
"""

from math import pi

import jax
import jax.numpy as jnp

from .losses import sobel_xy
from .ssim import MSSSIM_WEIGHTS, downsample_half, gaussian_filter, \
    gaussian_kernel, ssim_maps

__all__ = [
    "calc_mean", "calc_std", "calc_ag", "calc_sf", "calc_mse", "calc_psnr",
    "calc_cc", "calc_scd", "calc_entropy", "calc_cross_ent", "calc_mul_info",
    "calc_Qabf", "calc_Nabf", "calc_Labf", "calc_ssim", "calc_msssim",
    "calc_viff",
]


# 1. mean
def calc_mean(img):
    return img.mean()


# 2. standard deviation
def calc_std(img):
    im = img - img.mean()
    return jnp.sqrt((im * im).mean())


# 3. average gradient
def calc_ag(img):
    x_grad = img[..., :-1, 1:, :] - img[..., :-1, :-1, :]
    y_grad = img[..., 1:, :-1, :] - img[..., :-1, :-1, :]
    grad = jnp.sqrt((x_grad ** 2 + y_grad ** 2) * 0.5)
    return grad.mean()


# 4. spatial frequency
def calc_sf(img):
    y_grad = img[..., 1:, :, :] - img[..., :-1, :, :]
    x_grad = img[..., :, 1:, :] - img[..., :, :-1, :]
    r_freq = (y_grad ** 2).mean()
    c_freq = (x_grad ** 2).mean()
    return jnp.sqrt(r_freq + c_freq)


# 5. mean squared error (on /255-normalized images, metric.py:63-68)
def calc_mse(img1, img2):
    err = img1 / 255.0 - img2 / 255.0
    return (err * err).mean()


# 6. peak signal-to-noise ratio
def calc_psnr(mse, L=1.0, root=False):
    if root:
        return 20.0 * jnp.log10(L / jnp.sqrt(mse))
    return 10.0 * jnp.log10(L ** 2 / mse)


# 7. correlation coefficient
def calc_cc(img1, img2):
    im1 = img1 - img1.mean()
    im2 = img2 - img2.mean()
    corr12 = (im1 * im2).sum()
    corr11 = (im1 * im1).sum()
    corr22 = (im2 * im2).sum()
    return corr12 / jnp.sqrt(corr11 * corr22)


# 8. sum of correlations of differences
def calc_scd(img1, img2, imgf):
    return calc_cc(imgf - img1, img2) + calc_cc(imgf - img2, img1)


# 9-12. information metrics: MXU one-hot-matmul histograms (histogram.py —
# scatter-add is pathologically slow on TPU)
def calc_prob(img):
    """256-bin histogram over [0,256) -> probabilities
    (torch.histc semantics, metric.py:103-116)."""
    from .histogram import histogram256

    return histogram256(img) / img.size


def calc_joint_prob(img1, img2):
    """256x256 joint histogram (np.histogram2d semantics,
    metric.py:129-145)."""
    from .histogram import joint_histogram256

    return joint_histogram256(img1, img2).reshape(-1) / img1.size


def _plogp(p):
    return jnp.where(p > 0, -p * jnp.log2(jnp.where(p > 0, p, 1.0)), 0.0)


def calc_entropy(img):
    return _plogp(calc_prob(img)).sum()


def calc_joint_ent(img1, img2):
    return _plogp(calc_joint_prob(img1, img2)).sum()


def calc_cross_ent(img1, img2):
    p1 = calc_prob(img1)
    p2 = calc_prob(img2)
    valid = (p1 * p2) != 0
    safe1 = jnp.where(valid, p1, 1.0)
    safe2 = jnp.where(valid, p2, 1.0)
    return jnp.where(valid, p1 * jnp.log2(safe1 / safe2), 0.0).sum()


def calc_mul_info(img1, img2, normalized=False):
    en1 = calc_entropy(img1)
    en2 = calc_entropy(img2)
    en12 = calc_joint_ent(img1, img2)
    mi = en1 + en2 - en12
    if normalized:
        return 2.0 * mi / (en1 + en2)
    return mi


# 13-15. edge-transfer metrics (Qabf / Nabf / Labf)
def _sobel_mag_angle(img):
    gx, gy = sobel_xy(img)
    grad = jnp.sqrt(gx * gx + gy * gy)
    alpha = jnp.arctan2(gy, gx)
    return grad, alpha


def calc_Qxy(img1, img2, mode="qabf", full=False):
    g1, a1 = _sobel_mag_angle(img1)
    g2, a2 = _sobel_mag_angle(img2)

    gmax = jnp.maximum(g1, g2)
    G = jnp.where(gmax != 0, jnp.minimum(g1, g2) / jnp.where(gmax != 0, gmax,
                                                             1.0), 0.0)
    A = jnp.abs(jnp.abs(a1 - a2) - pi / 2) * 2 / pi

    if mode == "qabf":       # constants from the original paper
        Gg, kg, sg = 0.9994, 15, 0.5
        Ga, ka, sa = 0.9879, 22, 0.8
    elif mode == "nabf":     # constants from the matlab code
        Gg, kg, sg = 0.9999, 19, 0.5
        Ga, ka, sa = 0.9995, 22, 0.5
    else:
        raise ValueError(mode)

    Qg = Gg / (1 + jnp.exp(-kg * (G - sg)))
    Qa = Ga / (1 + jnp.exp(-ka * (A - sa)))

    if full:
        return Qg * Qa, g1, g2
    return Qg * Qa, g1


def calc_Qabf(img1, img2, imgf, L=1.5, full=False):
    Qaf, ga, gf = calc_Qxy(img1, imgf, full=True)
    Qbf, gb = calc_Qxy(img2, imgf)

    wa = ga ** L
    wb = gb ** L
    den = (wa + wb).sum()
    qabf = (Qaf * wa + Qbf * wb).sum() / den

    if full:
        gmax = jnp.maximum(ga, gb)
        AM = jnp.where(gf > gmax, 1.0, 0.0)
        RR = jnp.where(gf <= gmax, 1.0, 0.0)
        nabf = (AM * ((1.0 - Qaf) * wa + (1.0 - Qbf) * wb)).sum() / den
        labf = (RR * ((1.0 - Qaf) * wa + (1.0 - Qbf) * wb)).sum() / den
        return qabf, nabf, labf  # qabf + nabf + labf = 1
    return qabf


def calc_Nabf(img1, img2, imgf, L=1.5, modified=True):
    Qaf, ga, gf = calc_Qxy(img1, imgf, mode="qabf", full=True)
    Qbf, gb = calc_Qxy(img2, imgf, mode="qabf")
    wa = ga ** L
    wb = gb ** L
    AM = jnp.where(gf > jnp.maximum(ga, gb), 1.0, 0.0)
    if modified:
        return (AM * ((1.0 - Qaf) * wa +
                      (1.0 - Qbf) * wb)).sum() / (wa + wb).sum()
    return (AM * ((2.0 - Qaf - Qbf) * (wa + wb))).sum() / (wa + wb).sum()


def calc_Labf(img1, img2, imgf, L=1.5):
    Qaf, ga, gf = calc_Qxy(img1, imgf, mode="qabf", full=True)
    Qbf, gb = calc_Qxy(img2, imgf, mode="qabf")
    wa = ga ** L
    wb = gb ** L
    RR = jnp.where(gf <= jnp.maximum(ga, gb), 1.0, 0.0)
    return (RR * ((1.0 - Qaf) * wa + (1.0 - Qbf) * wb)).sum() / \
        (wa + wb).sum()


# 16-17. SSIM / MS-SSIM (metric contract: scalar, data_range 255,
# sigma fixed at 1.5 — metric.py:290-402; NB this duplicates the loss-side
# SSIM with a different return contract, as in the reference)
def _use_pallas_ssim(img, ws):
    import os

    import jax as _jax

    if os.environ.get("MMIF_NO_PALLAS"):
        return False
    return (_jax.default_backend() == "tpu" and img.shape[-1] == 1
            and img.shape[1] >= ws and img.shape[2] >= ws)


def calc_ssim(img1, img2, win_size=11, data_range=255.0, use_padding=False,
              size_average=True, full=False):
    h, w = img1.shape[1:3]
    ws = min(win_size, h, w)
    if _use_pallas_ssim(img1, ws):
        from .pallas.ssim_kernel import ssim_maps_pallas

        ssim, cs, _ = ssim_maps_pallas(img1, img2, ws, float(data_range),
                                       use_padding, sigma=1.5)
    else:
        kernel1d = gaussian_kernel(ws, 1.5)
        ssim, cs, _ = ssim_maps(img1, img2, kernel1d, data_range,
                                use_padding)
    if size_average:
        ssim = ssim.mean()
        cs = cs.mean()
    if full:
        return ssim, cs
    return ssim


def calc_msssim(img1, img2, win_size=11, data_range=255.0,
                use_padding=False):
    weights = jnp.asarray(MSSSIM_WEIGHTS)
    im1, im2 = img1, img2
    values = []
    levels = len(weights)
    for i in range(levels):
        ssim, cs = calc_ssim(im1, im2, win_size, data_range, use_padding,
                             full=True)
        if i < levels - 1:
            values.append(cs)
            im1 = downsample_half(im1)
            im2 = downsample_half(im2)
        else:
            values.append(ssim)
    values = jnp.clip(jnp.stack(values), 1e-7, None)
    return jnp.prod(values ** weights)


# 18. visual information fidelity (VIF / VIFF)
def calc_vif(img1, img2, use_padding=False):
    """4-scale VIF pyramid (reference metric.py:406-458). Returns lists of
    (VID, VIND, G) maps per scale. The masking chain order is preserved
    exactly as a static select sequence."""
    eps = 1e-10
    sn_sq = 0.005 * 255 * 255
    VID, VIND, G = [], [], []

    im1, im2 = img1, img2
    for scale in range(1, 5):
        win_size = 2 ** (4 - scale + 1) + 1
        kernel1d = gaussian_kernel(win_size, win_size / 5)

        if scale > 1:
            im1 = gaussian_filter(im1, kernel1d, use_padding)
            im2 = gaussian_filter(im2, kernel1d, use_padding)
            im1 = im1[:, ::2, ::2, :]
            im2 = im2[:, ::2, ::2, :]

        if _use_pallas_ssim(im1, win_size):
            from .pallas.moments_kernel import moments_pallas

            mu1, mu2, m11, m22, m12 = moments_pallas(
                im1, im2, win_size, win_size / 5, use_padding)
        else:
            mu1 = gaussian_filter(im1, kernel1d, use_padding)
            mu2 = gaussian_filter(im2, kernel1d, use_padding)
            m11 = gaussian_filter(im1 * im1, kernel1d, use_padding)
            m22 = gaussian_filter(im2 * im2, kernel1d, use_padding)
            m12 = gaussian_filter(im1 * im2, kernel1d, use_padding)

        sigma1_sq = m11 - mu1 * mu1
        sigma2_sq = m22 - mu2 * mu2
        sigma12 = m12 - mu1 * mu2

        sigma1_sq = jnp.clip(sigma1_sq, 0.0, None)
        sigma2_sq = jnp.clip(sigma2_sq, 0.0, None)

        g = sigma12 / (sigma1_sq + eps)
        sv_sq = sigma2_sq - g * sigma12

        m1 = sigma1_sq < eps
        g = jnp.where(m1, 0.0, g)
        sv_sq = jnp.where(m1, sigma2_sq, sv_sq)
        sigma1_sq = jnp.where(m1, 0.0, sigma1_sq)

        m2 = sigma2_sq < eps
        g = jnp.where(m2, 0.0, g)
        sv_sq = jnp.where(m2, 0.0, sv_sq)

        mg = g < 0
        sv_sq = jnp.where(mg, sigma2_sq, sv_sq)
        g = jnp.where(mg, 0.0, g)

        sv_sq = jnp.where(sv_sq < eps, eps, sv_sq)

        VID.append(jnp.log2(1 + g * g * sigma1_sq / (sv_sq + sn_sq)))
        VIND.append(jnp.log2(1 + sigma1_sq / sn_sq))
        G.append(g)

    return VID, VIND, G


def calc_viff(img1, img2, imgf, simple=True):
    N1, D1, G1 = calc_vif(img1, imgf)
    N2, D2, G2 = calc_vif(img2, imgf)

    if simple:
        num1 = sum(n.sum() for n in N1)
        num2 = sum(n.sum() for n in N2)
        den1 = sum(d.sum() for d in D1)
        den2 = sum(d.sum() for d in D2)
        return num1 / den1 + num2 / den2

    p = jnp.array([1.0, 0.0, 0.15, 1.0]) / 2.15
    viff = []
    for i in range(4):
        num = jnp.where(G1[i] < G2[i], N1[i], N2[i])
        den = jnp.where(G1[i] < G2[i], D1[i], D2[i])
        viff.append(num.sum() / den.sum())
    return (p * jnp.stack(viff)).sum()


def eval_metrics(img1, img2, imgf):
    """The full 16-value metric bundle used by the eval CLI (reference
    eval.py:29-75). jit-able; returns a dict of scalars."""
    mse = (calc_mse(img1, imgf) + calc_mse(img2, imgf)) * 0.5
    qabf, nabf, labf = calc_Qabf(img1, img2, imgf, L=1.5, full=True)
    return {
        "sd": calc_std(imgf),
        "ag": calc_ag(imgf),
        "sf": calc_sf(imgf),
        "mse": mse,
        "psnr": calc_psnr(mse),
        "cc": (calc_cc(img1, imgf) + calc_cc(img2, imgf)) * 0.5,
        "scd": calc_scd(img1, img2, imgf),
        "en": calc_entropy(imgf),
        "ce": calc_cross_ent(img1, imgf) + calc_cross_ent(img2, imgf),
        "mi": calc_mul_info(img1, imgf, normalized=True) +
              calc_mul_info(img2, imgf, normalized=True),
        "qabf": qabf,
        "nabf": nabf,
        "labf": labf,
        "ssim": (calc_ssim(img1, imgf) + calc_ssim(img2, imgf)) * 0.5,
        "msssim": (calc_msssim(img1, imgf) + calc_msssim(img2, imgf)) * 0.5,
        "viff": calc_viff(img1, img2, imgf, simple=False),
    }
