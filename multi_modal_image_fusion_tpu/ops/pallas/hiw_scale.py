"""Scale-transition + attention-fusion ops on H-MAJOR chain tensors.

Round-5 heavy-tail lever (VERDICT #4): the multi-scale nest models
(NestFuse, RFNNest, ...) ran the round-3 C-MAJOR guard-layout chain,
whose concat-consuming decoder convs decompose into summed per-part
kernel launches; the round-4/5 H-major multi-leg kernel
(hiw_kernel.conv_hiw_chain_multi) does all legs inside ONE strip loop —
the same reform that took DenseFuse 27.7 -> 196.9 pairs/s. These
helpers carry the H-major layout (B, HG*C, Wp), row = h*C + c, across
the scale boundaries the nest decoders need:

    hiw_valid / hiw_place    valid-region NHCW view <-> fresh guard buffer
    hiw_max_pool             maxpool down (reference block.py:941-951)
    hiw_upsample             nearest / bilinear(align_corners) up +
                             reflect pad-to-shape (block.py:965-991)
    hiw_resize               pad_to-only repair
    hiw_attention_fusion     per-scale sa/ca/sca/wavg fusion
                             (reference core/fusion.py:42-59)
    hiw_conv / hiw_mconv     deferred-ConvLayer single-leg / multi-leg
                             conv wrappers (shared by models/zoo.py and
                             the nest decoders in ops/blocks.py)

All scale/fusion ops are XLA on the valid NHCW view — one elementwise
pass each, between convs that dominate; fresh buffers keep guards zero
(the hiw conv kernels mirror halos in-kernel, hiw_kernel._mirror).
"""

import jax
import jax.numpy as jnp

from .conv_kernel import CHAIN_GUARD, CHAIN_WG, chain_shape

__all__ = ["hiw_valid", "hiw_place", "hiw_enter_c", "hiw_max_pool",
           "hiw_upsample", "hiw_resize", "hiw_attention_fusion",
           "hiw_conv", "hiw_mconv", "hiw_pick_rows"]


def hiw_enter_c(x):
    """NHWC (B, H, W, C) -> H-major chain tensor (one transpose pass;
    the C == 1 entry path is hiw_kernel.hiw_enter's strip kernel)."""
    return hiw_place(jnp.transpose(x, (0, 1, 3, 2)))


def hiw_to_nhwc(xt, c, h, w):
    """H-major chain tensor -> NHWC (valid region; one transpose pass).
    Inverse of hiw_enter_c."""
    return jnp.transpose(hiw_valid(xt, c, h, w), (0, 1, 3, 2))


def hiw_channels(xt, c, lo, n):
    """Channel slice [lo, lo+n) of an H-major chain tensor (view
    reshape; guard rows come along untouched)."""
    b, hgc, wp = xt.shape
    v = xt.reshape(b, hgc // c, c, wp)[:, :, lo:lo + n, :]
    return v.reshape(b, -1, wp)


def hiw_stride_dw(xt, c, h, w, wdw, bias=None, act=None, stride=2):
    """Depthwise conv with ksize == stride, padding 0 (the reference
    TransitionBlock's strided dw down, block.py TransitionBlock): a
    per-channel WEIGHTED stride x stride pool on the valid view — s^2
    slice-multiply-adds, pure XLA, no kernel. wdw: (s, s, C)."""
    from ..layers import get_act

    v = hiw_valid(xt, c, h, w).astype(jnp.float32)
    s = stride
    oh, ow = (h - s) // s + 1, (w - s) // s + 1
    out = None
    for di in range(s):
        for dj in range(s):
            piece = v[:, di:di + s * oh:s, :, dj:dj + s * ow:s] \
                * wdw[di, dj].astype(jnp.float32)[None, None, :, None]
            out = piece if out is None else out + piece
    if bias is not None:
        out = out + jnp.asarray(bias, jnp.float32)[None, None, :, None]
    return hiw_place(get_act(act)(out).astype(xt.dtype)), (oh, ow)


def hiw_group_weights(w, groups):
    """Shared per-group HWIO weights (k, k, cg_in, cg_out) -> full
    block-diagonal HWIO (k, k, groups*cg_in, groups*cg_out). Runs a
    grouped conv (shared weights across groups, e.g. PFNetv2's
    per-channel fuse net) as ONE dense banded strip kernel — the MXU
    eats the off-block zeros at full rate and the materialized weights
    stay tiny (PFNetv2: 3x3x128x128 bf16 = 294 KB)."""
    k1, k2, cgi, cgo = w.shape
    eye = jnp.eye(groups, dtype=w.dtype)
    return (eye[None, None, :, None, :, None]
            * w[:, :, None, :, None, :]).reshape(
                k1, k2, groups * cgi, groups * cgo)


def hiw_valid(xt, c, h, w):
    """(B, HG*C, Wp) H-major chain tensor -> valid NHCW view
    (B, h, C, w)."""
    b, hgc, wp = xt.shape
    v = xt.reshape(b, hgc // c, c, wp)
    return v[:, CHAIN_GUARD:CHAIN_GUARD + h, :,
             CHAIN_WG:CHAIN_WG + w]


def hiw_place(v):
    """(B, h, C, w) NHCW -> fresh H-major chain tensor (B, HG*C, Wp).
    Guards stay zero: the hiw conv kernels mirror halos in-kernel."""
    b, h, c, w = v.shape
    hg, wp = chain_shape(h, w)
    out = jnp.zeros((b, hg, c, wp), v.dtype)
    out = jax.lax.dynamic_update_slice(
        out, v, (0, CHAIN_GUARD, 0, CHAIN_WG))
    return out.reshape(b, hg * c, wp)


def _pad_to_nhcw(v, th, tw):
    """Reflect-pad/crop NHCW (B, h, C, w) to (th, tw) — torch
    ReflectionPad2d semantics incl. negative padding (crop), mirroring
    chain_ops._pad_to_nchw / blocks.pad_to (reference block.py:954-962)."""
    fh, fw = v.shape[1], v.shape[3]
    if (fh, fw) == (th, tw):
        return v
    pad_h, pad_w = th - fh, tw - fw
    ph1, pw1 = pad_h // 2, pad_w // 2
    ph2, pw2 = pad_h - ph1, pad_w - pw1

    def split(lo, hi, size):
        crop_lo = max(-lo, 0)
        crop_hi = max(-hi, 0)
        return crop_lo, size - crop_lo - crop_hi, max(lo, 0), max(hi, 0)

    ch_lo, ch_len, ph1p, ph2p = split(ph1, ph2, fh)
    cw_lo, cw_len, pw1p, pw2p = split(pw1, pw2, fw)
    v = v[:, ch_lo:ch_lo + ch_len, :, cw_lo:cw_lo + cw_len]
    if ph1p or ph2p or pw1p or pw2p:
        v = jnp.pad(v, ((0, 0), (ph1p, ph2p), (0, 0), (pw1p, pw2p)),
                    mode="reflect")
    return v


def hiw_max_pool(xt, c, h, w, window=2, to_hw=None):
    """Maxpool `window` (stride == window) over the valid region;
    optional pad-to-shape repair. Returns (new tensor, (h', w'))."""
    v = hiw_valid(xt, c, h, w)
    p = jax.lax.reduce_window(
        v, -jnp.inf if v.dtype != jnp.int8 else jnp.int8(-128),
        jax.lax.max, (1, window, 1, window), (1, window, 1, window),
        "VALID")
    if to_hw is not None:
        p = _pad_to_nhcw(p, *to_hw)
    return hiw_place(p), (p.shape[1], p.shape[3])


def _interp_nhcw(v, scale, mode):
    """torch nn.Upsample on the NHCW view: nearest (floor) or bilinear
    align_corners=True (mirrors chain_ops._interp_nchw, reference
    block.py:965-973)."""
    b, h, c, w = v.shape
    oh, ow = h * scale, w * scale
    if mode == "nearest":
        return jnp.repeat(jnp.repeat(v, scale, axis=1), scale, axis=3)
    if mode == "bilinear":
        def axis_weights(insize, outsize):
            if outsize == 1 or insize == 1:
                lo = jnp.zeros((outsize,), jnp.int32)
                return lo, lo, jnp.zeros((outsize,), v.dtype)
            src = jnp.arange(outsize, dtype=jnp.float32) * (
                (insize - 1) / (outsize - 1))
            lo = jnp.floor(src).astype(jnp.int32)
            lo = jnp.clip(lo, 0, insize - 2)
            t = (src - lo).astype(v.dtype)
            return lo, lo + 1, t

        hlo, hhi, ht = axis_weights(h, oh)
        wlo, whi, wt = axis_weights(w, ow)
        top = v[:, hlo][:, :, :, wlo] * (1 - wt) + \
            v[:, hlo][:, :, :, whi] * wt
        bot = v[:, hhi][:, :, :, wlo] * (1 - wt) + \
            v[:, hhi][:, :, :, whi] * wt
        return top * (1 - ht)[None, :, None, None] + \
            bot * ht[None, :, None, None]
    raise ValueError(f"unknown interpolate mode {mode!r}")


def hiw_upsample(xt, c, h, w, to_hw, scale=2, mode="nearest"):
    """Upsample the valid region by `scale` and repair to `to_hw`."""
    v = hiw_valid(xt, c, h, w)
    u = _interp_nhcw(v, scale, mode)
    return hiw_place(_pad_to_nhcw(u, *to_hw))


def hiw_resize(xt, c, h, w, to_hw):
    """Shape repair only (same scale)."""
    return hiw_place(_pad_to_nhcw(hiw_valid(xt, c, h, w), *to_hw))


def hiw_attention_fusion(xt, n, c, h, w, mode="sca", spatial_mode="l1",
                         channel_mode="avg"):
    """Per-scale attention fusion of an H-major 2n-batch tensor (images
    stacked [x1; x2]) -> fused n-batch tensor (reference
    core/fusion.py:42-59, the NestFuse/UNFusion per-scale fusion).

    Works on the valid NHCW view: the spatial map pools over the channel
    axis (2), the channel vector pools over the valid spatial axes
    (1, 3) — no guard pixels enter any statistic."""
    from ..fusion import element_fusion, spatial_pooling, weighted_fusion

    v = hiw_valid(xt, c, h, w)
    v1, v2 = v[:n], v[n:]

    def spat():
        s1 = spatial_pooling(v1, spatial_mode, caxis=2)
        s2 = spatial_pooling(v2, spatial_mode, caxis=2)
        return weighted_fusion(v1, v2, s1, s2)

    def chan():
        if channel_mode == "avg":
            c1 = v1.mean(axis=(1, 3), keepdims=True)
            c2 = v2.mean(axis=(1, 3), keepdims=True)
        elif channel_mode == "max":
            c1 = v1.max(axis=(1, 3), keepdims=True)
            c2 = v2.max(axis=(1, 3), keepdims=True)
        else:
            raise ValueError(
                f"channel_mode {channel_mode!r} is not hiw-safe")
        return weighted_fusion(v1, v2, c1, c2)

    if mode == "sa":
        fused = spat()
    elif mode == "ca":
        fused = chan()
    elif mode == "sca":
        fused = element_fusion(spat(), chan(), "mean")
    elif mode == "wavg":
        fs, fc = spat(), chan()
        fused = weighted_fusion(fs, fc, fs, fc)
    else:
        raise ValueError(f"unsupported fusion mode {mode!r}")
    return hiw_place(fused)


HIW_VMEM_BUDGET = 100 << 20


def hiw_pick_rows(c_ins, c_out, k, h, w, fuse_n=0):
    """Strip rows for a (multi-)leg hiw conv: 16 unless the nominal VMEM
    scratch exceeds the budget, then 8 (halves strips + stage; the wide
    UNFusion decoder legs need this at full/half res). Also picks g=2
    for very wide c_in*c_out products where the band-weight inflation
    (g+k-1)/k dominates VMEM (e.g. UNFusion's 1280->640 k3)."""
    from .hiw_kernel import (_hiw_g_ok, hiw_multi_scratch_bytes,
                             hiw_pick_g)
    # per-leg sublane alignment: the multi kernel handles c % 8 legs via
    # ext, but g must still 8-align the grouped output rows and (for the
    # single-leg kernel) g*c_in
    cmin = min(c_ins)
    g16 = hiw_pick_g(sum(c_ins), c_out, k, rows=16)
    g8 = hiw_pick_g(sum(c_ins), c_out, k, rows=8)
    for rows, gr in ((16, g16), (16, 2), (8, g8), (8, 2)):
        if _hiw_g_ok(gr, cmin, c_out, rows) and hiw_multi_scratch_bytes(
                c_ins, c_out, k, h, w, g=gr, rows=rows,
                fuse_n=fuse_n) <= HIW_VMEM_BUDGET:
            return rows, gr
    return 8, g8


def hiw_conv(t, params, c_in, h, w, fuse_n=0, interpret=False):
    """Single-leg H-major conv from a deferred ConvLayer
    (kernel, bias, k, act) tuple."""
    from .hiw_kernel import conv_hiw_chain
    wgt, bias, k, act = params
    rows, g = hiw_pick_rows((c_in,), wgt.shape[-1], k, h, w,
                            fuse_n=fuse_n)
    return conv_hiw_chain(t, wgt, k, h=h, w_valid=w, c_in=c_in,
                          bias=bias, act=act, fuse_n=fuse_n, g=g,
                          rows=rows, interpret=interpret)


def hiw_mconv(legs, params, h, w, n_out, fuse_n=0, interpret=False):
    """Multi-leg H-major conv: legs = [(tensor, c_in, b_off), ...] in
    the reference's channel-concat order."""
    from .hiw_kernel import conv_hiw_chain_multi
    wgt, bias, k, act = params
    c_ins = tuple(c for _, c, _ in legs)
    rows, g = hiw_pick_rows(c_ins, wgt.shape[-1], k, h, w, fuse_n=fuse_n)
    return conv_hiw_chain_multi(
        tuple(t for t, _, _ in legs), wgt, k, h=h, w_valid=w,
        c_ins=c_ins,
        b_offs=tuple(b for _, _, b in legs), n_out=n_out, bias=bias,
        act=act, fuse_n=fuse_n, g=g, rows=rows, interpret=interpret)
