"""Fused Gaussian-window SSIM as a single Pallas TPU kernel.

The SSIM stack needs five Gaussian-filtered moment maps (mu1, mu2, E[x1^2],
E[x2^2], E[x1*x2]) plus elementwise algebra (reference core/loss.py:52-110 /
core/metric.py:316-364). The jnp path runs 10 separable convs + elementwise
over HBM; this kernel fuses the whole stack into one pass:

- grid over (batch, row strips); each program DMAs a (R + ws - 1)-row halo
  strip of both images HBM -> VMEM once,
- computes the five products in registers,
- applies the separable window: vertical taps via static row slices,
  horizontal taps via lane rolls (VPU),
- emits ssim / cs / sigma1_sq maps directly.

HBM traffic: 2 reads + 3 writes per pixel instead of ~15 map touches.
Inputs are pre-padded by the caller (reflect for use_padding=True); the
kernel computes a VALID result and the caller slices off the (ws-1) tail.

Forward-only (metric/eval path); the training loss keeps the jnp
implementation, which XLA fuses and differentiates.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ssim import default_sigma, gaussian_kernel


def _ssim_kernel(img1_ref, img2_ref, ssim_ref, cs_ref, sigma_ref, *,
                 taps, rows, c1, c2):
    ws = len(taps)

    a = img1_ref[0, 0]        # (rows + ws - 1, W)
    b = img2_ref[0, 0]

    def filt(x):
        # vertical: rows output rows from rows+ws-1 input rows
        acc = None
        for d, w in enumerate(taps):
            term = x[d:d + rows, :] * w
            acc = term if acc is None else acc + term
        # horizontal: lane roll; the last ws-1 columns are garbage and are
        # sliced off by the caller
        out = None
        width = acc.shape[-1]
        for d, w in enumerate(taps):
            # left-shift by d == non-negative roll by (W - d); wraparound
            # lands in the sliced-off tail columns
            shifted = acc if d == 0 else pltpu.roll(acc, width - d, 1)
            term = shifted * w
            out = term if out is None else out + term
        return out

    mu1 = filt(a)
    mu2 = filt(b)
    m11 = filt(a * a)
    m22 = filt(b * b)
    m12 = filt(a * b)

    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = jnp.maximum(m11 - mu1_sq, 0.0)
    sigma2_sq = jnp.maximum(m22 - mu2_sq, 0.0)
    sigma12 = m12 - mu1_mu2

    m1 = 2.0 * mu1_mu2 + c1
    m2 = mu1_sq + mu2_sq + c1
    v1 = 2.0 * sigma12 + c2
    v2 = sigma1_sq + sigma2_sq + c2

    cs_ref[0, 0] = v1 / v2
    ssim_ref[0, 0] = (m1 * v1) / (m2 * v2)
    sigma_ref[0, 0] = sigma1_sq


@functools.partial(jax.jit,
                   static_argnames=("win_size", "data_range", "use_padding",
                                    "sigma", "interpret"))
def ssim_maps_pallas(img1, img2, win_size=11, data_range=1.0,
                     use_padding=False, sigma=None, interpret=False):
    """Drop-in for ops.ssim.ssim_maps (returns ssim, cs, sigma1_sq maps)
    computed by the fused kernel. NHWC with C==1."""
    assert img1.shape[-1] == 1, "kernel operates on single-channel images"
    n, h, w, _ = img1.shape
    ws = win_size
    if sigma is None:
        sigma = default_sigma(ws)
    taps = tuple(float(t) for t in gaussian_kernel(ws, sigma))

    a = img1[..., 0].astype(jnp.float32)
    b = img2[..., 0].astype(jnp.float32)
    if use_padding:
        p = ws // 2
        cfg = ((0, 0), (p, p), (p, p))
        a = jnp.pad(a, cfg, mode="reflect")
        b = jnp.pad(b, cfg, mode="reflect")
        h_in, w_in = h + 2 * p, w + 2 * p
        oh, ow = h, w
    else:
        h_in, w_in = h, w
        oh, ow = h - ws + 1, w - ws + 1

    # pad W to the lane width and H to a strip multiple
    rows = 128   # strip height; 256 blows the 16MB scoped-VMEM budget
    halo = ws - 1
    w_pad = -w_in % 128
    grid_h = pl.cdiv(max(oh, 1), rows)
    h_pad = grid_h * rows + halo - h_in
    cfg = ((0, 0), (0, h_pad), (0, w_pad))
    a = jnp.pad(a, cfg)
    b = jnp.pad(b, cfg)
    W = a.shape[-1]

    K1, K2 = 0.01, 0.03
    c1 = (K1 * data_range) ** 2
    c2 = (K2 * data_range) ** 2

    kern = functools.partial(_ssim_kernel, taps=taps, rows=rows, c1=c1,
                             c2=c2)
    # Overlapping halo strips aren't expressible as pallas BlockSpecs
    # (index maps address non-overlapping blocks), so materialize the
    # overlapped strip view once — the duplicated halo is halo/rows ≈ 4%
    # of the input — and let each grid step own one exact block.
    strips_a = _strided_strips(a, rows, halo)      # (n, grid_h, rows+halo, W)
    strips_b = _strided_strips(b, rows, halo)

    ssim, cs, sig = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((n, grid_h, rows, W), jnp.float32),
            jax.ShapeDtypeStruct((n, grid_h, rows, W), jnp.float32),
            jax.ShapeDtypeStruct((n, grid_h, rows, W), jnp.float32),
        ),
        grid=(n, grid_h),
        in_specs=[
            pl.BlockSpec((1, 1, rows + halo, W),
                         lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows + halo, W),
                         lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, rows, W), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, W), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, W), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        # Mosaic's default 16M scoped-vmem accounting rejects W >= 1280
        # lanes (polarization resolution 1224x1024 -> 1280 padded) even
        # though physical VMEM headroom exists — same lift as
        # conv_kernel.conv_tlane_dma
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(strips_a, strips_b)

    def fix(x):
        x = x.reshape(n, grid_h * rows, W)[:, :oh, :ow]
        return x[..., None]

    return fix(ssim), fix(cs), fix(sig)


def _strided_strips(x, rows, halo):
    """(n, H, W) -> (n, n_strips, rows+halo, W) overlapping strip view
    (materialized; the extra copy is halo/rows ~ 4% of the input)."""
    n, h, w = x.shape
    n_strips = (h - halo) // rows
    idx = (np.arange(n_strips)[:, None] * rows +
           np.arange(rows + halo)[None, :])
    return x[:, idx, :]
