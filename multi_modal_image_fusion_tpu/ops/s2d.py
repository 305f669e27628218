"""Space-to-depth conv packing: trade spatial extent for channel density.

The zoo's convs have 16-64 channels; the chain conv kernel
(ops/pallas/conv_kernel.py) is VPU-bound at those widths — its A-build
staging copies and partial-product roll-sums scale with the kernel height
k, while the MXU dot is ~10% of the critical path (docs/PERFORMANCE.md
round-3 breakdown). Packing f x f spatial phases into channels rewrites a
k x k conv on (C, H, W) as a kp x kp conv on (f^2 C, H/f, W/f) with

    kp = 2*ceil((k//2)/f) + 1        (k7,f2 -> 5; k5,f2 -> 3)

so per original pixel the A-build and partial-product traffic shrink by
kp/k (0.71x for k7, 0.60x for k5) while the dot FLOPs grow by
(kp*f/k)^2 (2.04x for k7) — a win exactly when the kernel is VPU-bound
and the MXU has headroom, which is the measured regime. The packed conv
is numerically the SAME conv (every original weight appears once in the
packed kernel, zero-padded to the kp x kp span), so reflect-SAME parity
holds to f32 rounding.

Phase convention is phase-major: packed channel (py*f + px)*C + c holds
original pixel phase (py, px) of channel c. For f == 2 a reflect halo in
packed coordinates needs NO cross-phase copies: phase 0 mirrors
exclusively (row -m <- row +m, torch ReflectionPad2d semantics) and
phase 1 mirrors inclusively (row -m <- row m-1) — see
conv_kernel._mirror's s2d patches.

The reference has no analogue (its convs run through cuDNN at any channel
count); this module exists purely for the TPU kernel's economics.
Reference conv contract being preserved: core/block.py:26-99
(reflect-SAME, stride 1).
"""

import math
import os

import jax.numpy as jnp

# Defaults for the packed-chain toggles, resolved when the env vars are
# unset (or "auto"): MMIF_S2D (packed DeepFuse chain), MMIF_S2D_IO
# (packed enter/exit strip kernels), MMIF_CHAIN_VMEM_BUDGET while a
# packed chain is active. tools/r3_autoflip.py rewrites these constants
# from the queued TPU measurements, so a default-env `python bench.py`
# runs the measured-fastest configuration.
S2D_DEFAULT = False
S2D_IO_DEFAULT = False
S2D_VMEM_BUDGET = 55 * 1024 * 1024


def s2d_enabled():
    """MMIF_S2D: '1'/'0' force; unset/'auto' -> S2D_DEFAULT."""
    v = os.environ.get("MMIF_S2D", "auto")
    if v in ("0", "1"):
        return v == "1"
    return S2D_DEFAULT


def s2d_io_enabled():
    """MMIF_S2D_IO: '1'/'0' force; unset/'auto' -> S2D_IO_DEFAULT."""
    v = os.environ.get("MMIF_S2D_IO", "auto")
    if v in ("0", "1"):
        return v == "1"
    return S2D_IO_DEFAULT


def s2d_span(k, f):
    """Packed kernel span: 2*ceil((k//2)/f) + 1 (odd by construction)."""
    return 2 * math.ceil((k // 2) / f) + 1


def s2d_flop_overhead(k, f):
    """Dot-FLOP multiplier of the packed conv vs the original."""
    return (s2d_span(k, f) * f / k) ** 2


def s2d_pack(x, f=2):
    """NHWC (B, H, W, C) -> (B, H/f, W/f, f*f*C), phase-major channels.

    packed[b, y, x, (py*f+px)*C + c] == x[b, y*f+py, x*f+px, c]."""
    b, h, w, c = x.shape
    assert h % f == 0 and w % f == 0, (h, w, f)
    x = x.reshape(b, h // f, f, w // f, f, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))       # (B, H/f, W/f, py, px, C)
    return x.reshape(b, h // f, w // f, f * f * c)


def s2d_unpack(y, f=2):
    """Inverse of s2d_pack."""
    b, hf, wf, cp = y.shape
    c = cp // (f * f)
    y = y.reshape(b, hf, wf, f, f, c)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))       # (B, H/f, py, W/f, px, C)
    return y.reshape(b, hf * f, wf * f, c)


def s2d_pack_nchw(x, f=2):
    """NCHW (B, C, H, W) -> (B, f*f*C, H/f, W/f), phase-major channels."""
    b, c, h, w = x.shape
    assert h % f == 0 and w % f == 0, (h, w, f)
    x = x.reshape(b, c, h // f, f, w // f, f)
    x = jnp.transpose(x, (0, 3, 5, 1, 2, 4))       # (B, py, px, C, H/f, W/f)
    return x.reshape(b, f * f * c, h // f, w // f)


def s2d_unpack_nchw(y, f=2):
    b, cp, hf, wf = y.shape
    c = cp // (f * f)
    y = y.reshape(b, f, f, c, hf, wf)
    y = jnp.transpose(y, (0, 3, 4, 1, 5, 2))       # (B, C, H/f, py, W/f, px)
    return y.reshape(b, c, hf * f, wf * f)


def s2d_pack_weights(w, f=2):
    """HWIO (k, k, C_in, C_out) -> (kp, kp, f^2*C_in, f^2*C_out).

    The packed tap (ty, tx) block [(psy*f+psx)*C_in, (phy*f+phx)*C_out]
    holds original weight w[dy, dx] where the original offset dy - k//2
    decomposes as f*(ty - kp//2) + psy - phy; absent combinations are
    zero. Every original weight lands exactly once per output phase, so
    the packed conv's MAC count is (kp*f/k)^2 x the original's but the
    SUM it computes is identical."""
    k = w.shape[0]
    ci, co = w.shape[2], w.shape[3]
    p = k // 2
    kp = s2d_span(k, f)
    pt = kp // 2
    zero = jnp.zeros((ci, co), w.dtype)

    # rows: packed input channel (psy*f+psx)*ci; cols: (phy*f+phx)*co
    def tap(ty, tx):
        rows = []
        for psy in range(f):
            for psx in range(f):
                cols = []
                for phy in range(f):
                    for phx in range(f):
                        dy = f * (ty - pt) + psy - phy + p
                        dx = f * (tx - pt) + psx - phx + p
                        if 0 <= dy < k and 0 <= dx < k:
                            cols.append(w[dy, dx])
                        else:
                            cols.append(zero)
                rows.append(jnp.concatenate(cols, axis=1))
        return jnp.concatenate(rows, axis=0)

    return jnp.stack([jnp.stack([tap(ty, tx) for tx in range(kp)])
                      for ty in range(kp)])


def s2d_pack_bias(b, f=2):
    """(C,) -> (f^2*C,): every phase gets the per-channel bias."""
    return jnp.tile(b, f * f)
