"""Fused windowed-moments Pallas kernel: one pass over an image pair
produces the five Gaussian-filtered moment maps

    mu1, mu2, E[x1^2], E[x2^2], E[x1*x2]

that both the SSIM stack and the VIF pyramid consume (reference
core/loss.py:78-89, core/metric.py:425-434). Same strip-mined structure as
ssim_kernel.py (separable taps: vertical = static row slices, horizontal =
lane rolls); the downstream algebra (SSIM formula / VIF masking chain) is
elementwise and left to XLA, which fuses it into the kernel's outputs.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _moments_kernel(img1_ref, img2_ref, mu1_ref, mu2_ref, m11_ref, m22_ref,
                    m12_ref, *, taps, rows):
    a = img1_ref[0, 0]
    b = img2_ref[0, 0]

    def filt(x):
        acc = None
        for d, w in enumerate(taps):
            term = x[d:d + rows, :] * w
            acc = term if acc is None else acc + term
        out = None
        width = acc.shape[-1]
        for d, w in enumerate(taps):
            shifted = acc if d == 0 else pltpu.roll(acc, width - d, 1)
            term = shifted * w
            out = term if out is None else out + term
        return out

    mu1_ref[0, 0] = filt(a)
    mu2_ref[0, 0] = filt(b)
    m11_ref[0, 0] = filt(a * a)
    m22_ref[0, 0] = filt(b * b)
    m12_ref[0, 0] = filt(a * b)


@functools.partial(jax.jit,
                   static_argnames=("win_size", "sigma", "use_padding",
                                    "interpret"))
def moments_pallas(img1, img2, win_size, sigma, use_padding=False,
                   interpret=False):
    """NHWC C==1 pair -> five VALID-filtered moment maps (or SAME via
    reflect pre-padding)."""
    from ..ssim import gaussian_kernel

    assert img1.shape[-1] == 1
    n, h, w, _ = img1.shape
    ws = win_size
    taps = tuple(float(t) for t in gaussian_kernel(ws, sigma))

    a = img1[..., 0].astype(jnp.float32)
    b = img2[..., 0].astype(jnp.float32)
    if use_padding:
        p = ws // 2
        cfg = ((0, 0), (p, p), (p, p))
        a = jnp.pad(a, cfg, mode="reflect")
        b = jnp.pad(b, cfg, mode="reflect")
        oh, ow = h, w
    else:
        oh, ow = h - ws + 1, w - ws + 1

    rows = 128
    halo = ws - 1
    h_in, w_in = a.shape[1:]
    w_pad = -w_in % 128
    grid_h = pl.cdiv(max(oh, 1), rows)
    h_pad = grid_h * rows + halo - h_in
    cfg = ((0, 0), (0, h_pad), (0, w_pad))
    a = jnp.pad(a, cfg)
    b = jnp.pad(b, cfg)
    W = a.shape[-1]

    idx = (np.arange(grid_h)[:, None] * rows +
           np.arange(rows + halo)[None, :])
    sa = a[:, idx, :]
    sb = b[:, idx, :]

    kern = functools.partial(_moments_kernel, taps=taps, rows=rows)
    spec_in = pl.BlockSpec((1, 1, rows + halo, W),
                           lambda bi, i: (bi, i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, 1, rows, W), lambda bi, i: (bi, i, 0, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((n, grid_h, rows, W), jnp.float32)
    outs = pl.pallas_call(
        kern,
        out_shape=(shape,) * 5,
        grid=(n, grid_h),
        in_specs=[spec_in, spec_in],
        out_specs=(spec_out,) * 5,
        interpret=interpret,
    )(sa, sb)

    def fix(x):
        return x.reshape(n, grid_h * rows, W)[:, :oh, :ow, None]

    return tuple(fix(o) for o in outs)
