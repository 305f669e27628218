"""Network block library (TPU re-design of reference core/block.py).

Every block is a flax module over NHWC arrays. String-configured norms/acts
are resolved at trace time; all control flow is static, so each block lowers
to a single fused XLA computation. `train` is threaded to batch-norm-bearing
blocks.

Block -> reference mapping (file:line in /root/reference/core/block.py):
  ResBlock 121-134, DenseBlock 137-151, SepConvBlock 154-227,
  MixConvBlock 229-283, Res2ConvBlock 286-352, Attention 355-434,
  FFN 437-457, Scale 460-469, (Channel)LayerNorm 472-500,
  MetaFormerBlock 503-540 (+ConvFormer/MixFormer/Res2Former/Transformer
  543-617), TransitionBlock 620-664, DCBlock 667-705, ConvBlock 708-722,
  ECB 725-728, DCB 731-734, RFN 737-759, NestEncoder 762-797,
  Decoder 800-814, LSDecoder 817-833, NestDecoder 836-867, FSDecoder 870-938,
  Downsample 941-962, Upsample 965-991.
"""

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .fusion import concat_fusion
from .layers import (ChannelLayerNorm, ConvLayer, apply_norm, avg_pool,
                     get_act, interpolate, make_norm, max_pool, pad2d)

__all__ = [
    "ConvLayer", "ResBlock", "DenseBlock", "SepConvBlock", "MixConvBlock",
    "Res2ConvBlock", "Attention", "ConvFormerBlock", "MixFormerBlock",
    "Res2FormerBlock", "TransformerBlock", "TransitionBlock", "DCBlock",
    "ConvBlock", "ECB", "DCB", "RFN", "NestEncoder", "Decoder", "LSDecoder",
    "NestDecoder", "FSDecoder", "Downsample", "Upsample",
]


class ResBlock(nn.Module):
    """Two convs + identity add (SEDRFuse, DIFNet)."""

    out_ch: int
    norm1: Optional[str] = None
    norm2: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False, chain_hw=None,
                 chain_defer_in_ch=None):
        if chain_defer_in_ch is not None:
            # H-major chain mode: hand back both convs' folded
            # (kernel, bias, k, act); the caller runs conv1 single-leg and
            # conv2 as [y, x] legs with an identity-kernel residual leg
            # (hiw_kernel.conv_hiw_chain_multi)
            p1 = ConvLayer(self.out_ch, norm=self.norm1)(
                None, chain_hw=chain_hw,
                chain_defer_in_ch=chain_defer_in_ch)
            p2 = ConvLayer(self.out_ch, norm=self.norm2, act=None)(
                None, chain_hw=chain_hw, chain_defer_in_ch=self.out_ch)
            return p1, p2
        y = ConvLayer(self.out_ch, norm=self.norm1)(x, train,
                                                    chain_hw=chain_hw)
        y = ConvLayer(self.out_ch, norm=self.norm2, act=None)(
            y, train, chain_hw=chain_hw)
        return y + x


class DenseBlock(nn.Module):
    """DenseNet-style growth: out channels = in + num_convs*out_ch
    (PFNet, DenseFuse, VIFNet, DBNet)."""

    out_ch: int
    num_convs: int = 3

    @nn.compact
    def __call__(self, x, train=False, chain_hw=None,
                 chain_defer_in_chs=None):
        if chain_defer_in_chs is not None:
            # H-major chain mode: folded (kernel, bias, k, act) per conv;
            # the caller grows a leg list instead of concatenating
            # (hiw_kernel.conv_hiw_chain_multi)
            return [ConvLayer(self.out_ch, name=f"conv{i}")(
                None, chain_hw=chain_hw,
                chain_defer_in_ch=chain_defer_in_chs[i])
                for i in range(self.num_convs)]
        # chain mode: x is a guard-layout (B, C, HG, Wp) tensor, channel
        # concat moves to axis 1 (ops/pallas/conv_kernel chain layout)
        for i in range(self.num_convs):
            y = ConvLayer(self.out_ch, name=f"conv{i}")(x, train,
                                                        chain_hw=chain_hw)
            x = concat_fusion((x, y), axis=1 if chain_hw else -1)
        return x


class SepConvBlock(nn.Module):
    """pw-expand -> dw -> pw inverted bottleneck with optional residual
    shortcut and attention gate."""

    out_ch: int
    scale: int = 4
    ksize: int = 3
    use_bias: bool = False
    norm: Optional[str] = None
    act: Optional[str] = "relu6"
    residual: bool = True
    attention: bool = False

    @nn.compact
    def __call__(self, x, train=False, chain_hw=None, hiw_c_in=None):
        kw = dict(use_bias=self.use_bias, norm=self.norm)
        if hiw_c_in is not None:
            # H-major route (round 5, ops/pallas/hiw_scale.py): the dw
            # runs as a diagonal banded dot; everything is stride-1 so
            # the whole block stays in the chain layout.
            import os

            from .pallas.hiw_scale import hiw_conv
            interp = bool(os.environ.get("MMIF_CHAIN_INTERPRET"))
            c, (h, w) = hiw_c_in, chain_hw
            hid_ch = c * self.scale

            def dfr(name, ks, out, c_in, groups=1, act=None):
                return ConvLayer(out, ksize=ks, groups=groups, act=act,
                                 name=name, **kw)(
                    None, train, chain_hw=chain_hw,
                    chain_defer_in_ch=c_in)

            if self.residual:
                res = (hiw_conv(x, dfr("shortcut", 1, self.out_ch, c),
                                c, h, w, interpret=interp)
                       if c != self.out_ch else x)
            if self.attention:
                attn = hiw_conv(x, dfr("pwconv", 1, hid_ch, c,
                                       act=self.act), c, h, w,
                                interpret=interp)
            out = hiw_conv(x, dfr("pwconv1", 1, hid_ch, c, act=self.act),
                           c, h, w, interpret=interp)
            out = hiw_conv(out, dfr("dwconv", self.ksize, hid_ch, hid_ch,
                                    groups=hid_ch), hid_ch, h, w,
                           interpret=interp)
            if self.attention:
                out = out * attn
            out = hiw_conv(out, dfr("pwconv2", 1, self.out_ch, hid_ch),
                           hid_ch, h, w, interpret=interp)
            if self.residual:
                out = out + res
            return get_act(self.act)(out)
        in_ch = x.shape[-1]
        hid_ch = in_ch * self.scale

        if self.residual:
            if in_ch != self.out_ch:
                res = ConvLayer(self.out_ch, ksize=1, act=None,
                                name="shortcut", **kw)(x, train)
            else:
                res = x
        if self.attention:
            attn = ConvLayer(hid_ch, ksize=1, act=self.act, name="pwconv",
                             **kw)(x, train)

        out = ConvLayer(hid_ch, ksize=1, act=self.act, name="pwconv1",
                        **kw)(x, train)
        out = ConvLayer(hid_ch, ksize=self.ksize, groups=hid_ch, act=None,
                        name="dwconv", **kw)(out, train)
        if self.attention:
            out = out * attn
        out = ConvLayer(self.out_ch, ksize=1, act=None, name="pwconv2",
                        **kw)(out, train)
        if self.residual:
            out = out + res
        return get_act(self.act)(out)


class MixConvBlock(nn.Module):
    """MixConv: expanded channels chunked into `scale` groups, each dw-conved
    with kernel size 1,3,5,7,..."""

    out_ch: int
    scale: int = 4
    use_bias: bool = False
    norm: Optional[str] = None
    act: Optional[str] = "relu6"
    residual: bool = True
    attention: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        in_ch = x.shape[-1]
        hid_ch = in_ch * self.scale
        width = in_ch
        kw = dict(use_bias=self.use_bias, norm=self.norm)

        if self.residual:
            if in_ch != self.out_ch:
                res = ConvLayer(self.out_ch, ksize=1, act=None,
                                name="shortcut", **kw)(x, train)
            else:
                res = x
        if self.attention:
            attn = ConvLayer(hid_ch, ksize=1, act=self.act, name="pwconv",
                             **kw)(x, train)

        h = ConvLayer(hid_ch, ksize=1, act=self.act, name="pwconv1",
                      **kw)(x, train)
        # dead parameter set kept for parity: the reference's
        # Mix/Res2ConvBlock inherit SepConvBlock's `dwconv` module, which is
        # constructed but never used in their forward (block.py:229-352);
        # its output is discarded here and DCE'd by XLA.
        _ = ConvLayer(hid_ch, ksize=3, groups=hid_ch, act=None,
                      name="dwconv", **kw)(h, train)
        xs = jnp.split(h, self.scale, axis=-1)
        ys = [
            ConvLayer(width, ksize=2 * i + 1, groups=width, act=None,
                      name=f"dwconv{i}", **kw)(xs[i], train)
            for i in range(self.scale)
        ]
        out = concat_fusion(ys) if self.scale > 1 else ys[0]

        if self.attention:
            out = out * attn
        out = ConvLayer(self.out_ch, ksize=1, act=None, name="pwconv2",
                        **kw)(out, train)
        if self.residual:
            out = out + res
        return get_act(self.act)(out)


class Res2ConvBlock(nn.Module):
    """Res2Net-style hierarchical chunks: group i adds group i-1's conv
    output before its own dw conv (groups 0 and 1 do not chain —
    reference block.py:338 quirk preserved)."""

    out_ch: int
    scale: int = 4
    use_bias: bool = False
    norm: Optional[str] = None
    act: Optional[str] = "relu6"
    residual: bool = True
    attention: bool = False

    @nn.compact
    def __call__(self, x, train=False, chain_hw=None, hiw_c_in=None):
        kw = dict(use_bias=self.use_bias, norm=self.norm)
        if hiw_c_in is not None:
            # H-major route (round 5): x is one chain tensor OR a leg
            # list [(tensor, c, b_off), ...] (Res2Fusion's dense
            # concats are never materialized — the k1 entry convs
            # consume the legs directly); the hierarchical dw chain
            # runs as diagonal banded dots; pwconv2 consumes the
            # per-group outputs as legs.
            import os

            from .pallas.hiw_scale import hiw_channels, hiw_conv, \
                hiw_mconv
            interp = bool(os.environ.get("MMIF_CHAIN_INTERPRET"))
            c, (hh, ww) = hiw_c_in, chain_hw
            hid_ch = c * self.scale
            width = c
            legs = x if isinstance(x, (tuple, list)) else None

            def dfr(name, ks, out, c_in, groups=1, act=None):
                return ConvLayer(out, ksize=ks, groups=groups, act=act,
                                 name=name, **kw)(
                    None, train, chain_hw=chain_hw,
                    chain_defer_in_ch=c_in)

            def k1(params, inp, c_in):
                if isinstance(inp, (tuple, list)):
                    n_out = inp[0][0].shape[0]
                    return hiw_mconv(list(inp), params, hh, ww,
                                     n_out=n_out, interpret=interp)
                return hiw_conv(inp, params, c_in, hh, ww,
                                interpret=interp)

            if self.residual:
                assert legs is None or c != self.out_ch, \
                    "identity residual over legs is not hiw-wired"
                res = (k1(dfr("shortcut", 1, self.out_ch, c), x, c)
                       if c != self.out_ch else x)
            if self.attention:
                attn = k1(dfr("pwconv", 1, hid_ch, c, act=self.act), x, c)

            hexp = k1(dfr("pwconv1", 1, hid_ch, c, act=self.act), x, c)
            # dead parameter set kept for parity (see the eager path)
            _ = dfr("dwconv", 3, hid_ch, hid_ch, groups=hid_ch)
            outs = []
            y = None
            for i in range(self.scale):
                xi = hiw_channels(hexp, hid_ch, i * width, width)
                y = xi if i <= 1 else y + xi
                y = hiw_conv(y, dfr(f"dwconv{i}", 3 if i > 0 else 1,
                                    width, width, groups=width),
                             width, hh, ww, interpret=interp)
                outs.append(y)

            if self.attention:
                # attn gates the CONCAT of outs; gate each leg by its
                # channel slice of attn
                outs = [o * hiw_channels(attn, hid_ch, i * width, width)
                        for i, o in enumerate(outs)]
            out = k1(dfr("pwconv2", 1, self.out_ch, hid_ch),
                     [(o, width, 0) for o in outs], hid_ch)
            if self.residual:
                out = out + res
            return get_act(self.act)(out)
        in_ch = x.shape[-1]
        hid_ch = in_ch * self.scale
        width = in_ch

        if self.residual:
            if in_ch != self.out_ch:
                res = ConvLayer(self.out_ch, ksize=1, act=None,
                                name="shortcut", **kw)(x, train)
            else:
                res = x
        if self.attention:
            attn = ConvLayer(hid_ch, ksize=1, act=self.act, name="pwconv",
                             **kw)(x, train)

        h = ConvLayer(hid_ch, ksize=1, act=self.act, name="pwconv1",
                      **kw)(x, train)
        # dead parameter set kept for parity: the reference's
        # Mix/Res2ConvBlock inherit SepConvBlock's `dwconv` module, which is
        # constructed but never used in their forward (block.py:229-352);
        # its output is discarded here and DCE'd by XLA.
        _ = ConvLayer(hid_ch, ksize=3, groups=hid_ch, act=None,
                      name="dwconv", **kw)(h, train)
        xs = jnp.split(h, self.scale, axis=-1)
        outs = []
        y = None
        for i in range(self.scale):
            y = xs[i] if i <= 1 else y + xs[i]
            y = ConvLayer(width, ksize=3 if i > 0 else 1, groups=width,
                          act=None, name=f"dwconv{i}", **kw)(y, train)
            outs.append(y)
        out = concat_fusion(outs) if self.scale > 1 else outs[0]

        if self.attention:
            out = out * attn
        out = ConvLayer(self.out_ch, ksize=1, act=None, name="pwconv2",
                        **kw)(out, train)
        if self.residual:
            out = out + res
        return get_act(self.act)(out)


class Attention(nn.Module):
    """PVT-style spatial-reduction multi-head self-attention over H*W tokens.

    K/V are computed from a spatially `sr_ratio`-downsampled map (strided dw
    conv or avg pool), so the attention matmul is (HW) x (HW/sr^2) — both
    matmuls land on the MXU via einsum.
    """

    out_ch: int
    num_heads: Optional[int] = None
    qkv_bias: bool = False
    proj_bias: bool = False
    norm: Optional[str] = None
    act: Optional[str] = None
    sr_ratio: Optional[int] = None
    down_mode: str = "stride"

    @nn.compact
    def __call__(self, x, train=False):
        b, h, w, in_ch = x.shape
        num_heads = self.num_heads if self.num_heads else in_ch // 16
        head_dim = in_ch // num_heads
        att_dim = num_heads * head_dim
        scale = head_dim ** -0.5
        sr = self.sr_ratio if self.sr_ratio else 16 // (in_ch // 16)

        q = ConvLayer(att_dim, ksize=1, use_bias=self.qkv_bias,
                      norm=self.norm, act=self.act, name="q")(x, train)

        if self.down_mode == "stride":
            # the reference constructs self.pool unconditionally in
            # 'stride' mode but only calls it when sr > 1
            # (block.py:403-413, 422) — materialize its params either way
            # for count/checkpoint parity; at sr == 1 run it in eval mode
            # so a BatchNorm inside never updates its running stats from
            # the discarded compute (which XLA then DCEs)
            x_pool = ConvLayer(in_ch, ksize=sr, stride=sr, padding=0,
                               groups=in_ch, use_bias=False,
                               norm=self.norm, act=self.act,
                               name="pool")(x, train if sr > 1 else False)
            if sr == 1:
                x_pool = x
        elif self.down_mode == "avgpool":
            x_pool = avg_pool(x, sr, sr) if sr > 1 else x
        else:
            raise ValueError(self.down_mode)

        k = ConvLayer(att_dim, ksize=1, use_bias=self.qkv_bias,
                      norm=self.norm, act=self.act, name="k")(x_pool, train)
        v = ConvLayer(att_dim, ksize=1, use_bias=self.qkv_bias,
                      norm=self.norm, act=self.act, name="v")(x_pool, train)

        # NHWC channel vector c = head*head_dim + d (same layout as the
        # reference's NCHW flatten+reshape, block.py:419-426)
        q = q.reshape(b, h * w, num_heads, head_dim)
        k = k.reshape(b, -1, num_heads, head_dim)
        v = v.reshape(b, -1, num_heads, head_dim)

        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, h, w, att_dim)
        return ConvLayer(self.out_ch, ksize=1, use_bias=self.proj_bias,
                         norm=self.norm, act=self.act, name="proj")(out,
                                                                    train)


class FFN(nn.Module):
    """Conv-FFN: pw-expand -> dw3 -> pw-project (reference block.py:437-457).
    Unlike SepConvBlock, the dw conv keeps its activation."""

    scale: int = 4
    use_bias: bool = False
    norm: Optional[str] = None
    act: Optional[str] = "relu6"

    @nn.compact
    def __call__(self, x, train=False):
        num_ch = x.shape[-1]
        hid_ch = num_ch * self.scale
        kw = dict(use_bias=self.use_bias, norm=self.norm)
        y = ConvLayer(hid_ch, ksize=1, act=self.act, name="pw1", **kw)(x,
                                                                       train)
        y = ConvLayer(hid_ch, ksize=3, groups=hid_ch, act=self.act,
                      name="dw", **kw)(y, train)
        return ConvLayer(num_ch, ksize=1, act=None, name="pw2", **kw)(y,
                                                                      train)


class Scale(nn.Module):
    """Learnable per-channel scale (reference block.py:460-469)."""

    num_ch: int
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param(
            "scale",
            lambda key, shape: jnp.full(shape, self.init_value, jnp.float32),
            (self.num_ch,))
        return s * x


class MetaFormerBlock(nn.Module):
    """norm -> token mixer -> (layer/res scale) -> norm -> FFN skeleton.

    `mixer` selects the token mixer: 'sep' | 'mix' | 'res2' | 'attn' | None
    (identity). The four concrete Former blocks below fix the mixer and use
    batch norm + ReLU6, as the reference's subclasses do.
    """

    out_ch: int
    mixer: Optional[str] = None
    norm_layer: Optional[str] = "layer"
    act_layer: Optional[str] = None
    layer_scale: Optional[float] = None
    res_scale: Optional[float] = None

    def _make_mixer(self):
        if self.mixer is None:
            return None
        if self.mixer == "sep":
            return SepConvBlock(self.out_ch, residual=True, attention=False,
                                name="token_mixer")
        if self.mixer == "mix":
            return MixConvBlock(self.out_ch, residual=True, attention=False,
                                name="token_mixer")
        if self.mixer == "res2":
            return Res2ConvBlock(self.out_ch, residual=True, attention=False,
                                 name="token_mixer")
        if self.mixer == "attn":
            return Attention(self.out_ch, name="token_mixer")
        raise ValueError(f"unknown mixer {self.mixer!r}")

    @nn.compact
    def __call__(self, x, train=False):
        act = get_act(self.act_layer)
        in_ch = x.shape[-1]

        def scaled(name, value, ch, y):
            if value:
                return Scale(ch, value, name=name)(y)
            return y

        norm1 = make_norm(self.norm_layer, in_ch, name="norm1")
        mixer = self._make_mixer()
        h = apply_norm(norm1, x, train) if norm1 is not None else x
        h = mixer(h, train) if mixer is not None else h
        out = act(scaled("layer_scale1", self.layer_scale, self.out_ch, h) +
                  scaled("res_scale1", self.res_scale, self.out_ch, x))

        norm2 = make_norm(self.norm_layer, self.out_ch, name="norm2")
        h2 = apply_norm(norm2, out, train) if norm2 is not None else out
        h2 = FFN(name="ffn")(h2, train)
        out = act(scaled("layer_scale2", self.layer_scale, self.out_ch, h2) +
                  scaled("res_scale2", self.res_scale, self.out_ch, out))
        return out


class ConvFormerBlock(MetaFormerBlock):
    mixer: Optional[str] = "sep"
    norm_layer: Optional[str] = "batch"
    act_layer: Optional[str] = "relu6"


class MixFormerBlock(MetaFormerBlock):
    mixer: Optional[str] = "mix"
    norm_layer: Optional[str] = "batch"
    act_layer: Optional[str] = "relu6"


class Res2FormerBlock(MetaFormerBlock):
    mixer: Optional[str] = "res2"
    norm_layer: Optional[str] = "batch"
    act_layer: Optional[str] = "relu6"


class TransformerBlock(MetaFormerBlock):
    mixer: Optional[str] = "attn"
    norm_layer: Optional[str] = "batch"
    act_layer: Optional[str] = "relu6"


class TransitionBlock(nn.Module):
    """Downsampling transition: maxpool+pw or strided-dw+pw."""

    out_ch: int
    stride: int = 2
    use_bias: bool = False
    norm: Optional[str] = None
    act: Optional[str] = "relu6"
    down_mode: str = "stride"

    @nn.compact
    def __call__(self, x, train=False, chain_hw=None, hiw_c_in=None):
        kw = dict(use_bias=self.use_bias, norm=self.norm, act=self.act)
        if hiw_c_in is not None:
            # H-major route (round 5): the strided dw down runs as a
            # per-channel weighted stride-pool on the valid view
            # (hiw_scale.hiw_stride_dw — no kernel); returns
            # (tensor, (h', w')) at the downsampled geometry.
            import os

            from .pallas.hiw_scale import (hiw_conv, hiw_max_pool,
                                           hiw_stride_dw)
            interp = bool(os.environ.get("MMIF_CHAIN_INTERPRET"))
            c, (h, w) = hiw_c_in, chain_hw
            if self.down_mode == "maxpool":
                if self.stride > 1:
                    x, (h, w) = hiw_max_pool(x, c, h, w, self.stride)
            elif self.down_mode == "stride":
                wd, bd, ks, act = ConvLayer(
                    c, ksize=self.stride, stride=self.stride, padding=0,
                    groups=c, name="dw", **kw)(
                    None, train, chain_hw=(h, w), chain_defer_in_ch=c)
                if self.stride == 1:
                    x = hiw_conv(x, (wd, bd, ks, act), c, h, w,
                                 interpret=interp)
                else:
                    x, (h, w) = hiw_stride_dw(x, c, h, w, wd, bd, act,
                                              stride=self.stride)
            else:
                raise ValueError(self.down_mode)
            x = hiw_conv(x, ConvLayer(self.out_ch, ksize=1, name="pw",
                                      **kw)(None, train, chain_hw=(h, w),
                                            chain_defer_in_ch=c),
                         c, h, w, interpret=interp)
            return x, (h, w)
        in_ch = x.shape[-1]
        if self.down_mode == "maxpool":
            if self.stride > 1:
                x = max_pool(x, self.stride, self.stride)
            return ConvLayer(self.out_ch, ksize=1, name="pw", **kw)(x, train)
        elif self.down_mode == "stride":
            x = ConvLayer(in_ch, ksize=self.stride, stride=self.stride,
                          padding=0, groups=in_ch, name="dw", **kw)(x, train)
            return ConvLayer(self.out_ch, ksize=1, name="pw", **kw)(x, train)
        raise ValueError(self.down_mode)


class DCBlock(nn.Module):
    """pw -> dw -> pw decoder bottleneck (hid = in//2)."""

    out_ch: int
    use_bias: bool = False
    norm: Optional[str] = None
    act: Optional[str] = "relu6"
    residual: bool = False

    @nn.compact
    def __call__(self, x, train=False, chain_hw=None,
                 chain_defer_in_chs=None):
        kw = dict(use_bias=self.use_bias, norm=self.norm)
        if chain_defer_in_chs is not None:
            # H-major defer (ops/pallas/hiw_scale.py): pw -> dw -> pw as
            # hiw steps — the dw runs as a diagonal banded dot. The final
            # act (applied after the residual in eager mode) folds into
            # pw2's epilogue; the residual variant is not hiw-routed.
            assert not self.residual
            in_ch = sum(chain_defer_in_chs)
            hid_ch = in_ch // 2
            p1 = ConvLayer(hid_ch, ksize=1, act=self.act, name="pw1",
                           **kw)(None, train, chain_hw=chain_hw,
                                 chain_defer_in_ch=in_ch)
            pdw = ConvLayer(hid_ch, ksize=3, groups=hid_ch, act=self.act,
                            name="dw", **kw)(None, train,
                                             chain_hw=chain_hw,
                                             chain_defer_in_ch=hid_ch)
            wk, bk, kk, _ = ConvLayer(
                self.out_ch, ksize=1, act=None, name="pw2",
                **kw)(None, train, chain_hw=chain_hw,
                      chain_defer_in_ch=hid_ch)
            return [(p1, in_ch), (pdw, hid_ch),
                    ((wk, bk, kk, self.act), hid_ch)]
        in_ch = x.shape[-1]
        hid_ch = in_ch // 2
        y = ConvLayer(hid_ch, ksize=1, act=self.act, name="pw1", **kw)(x,
                                                                       train)
        y = ConvLayer(hid_ch, ksize=3, groups=hid_ch, act=self.act,
                      name="dw", **kw)(y, train)
        y = ConvLayer(self.out_ch, ksize=1, act=None, name="pw2", **kw)(y,
                                                                        train)
        if self.residual:
            if in_ch != self.out_ch:
                res = ConvLayer(self.out_ch, ksize=1, act=None,
                                name="shortcut", **kw)(x, train)
            else:
                res = x
            y = y + res
        return get_act(self.act)(y)


class ConvBlock(nn.Module):
    """3x3 -> 1x1 two-conv block, hid = in//2 (NestFuse, RFNNest,
    MAFusion). chain_hw: run on a guard-layout NCHW chain tensor."""

    out_ch: int
    ksize1: int = 3
    ksize2: int = 1

    @nn.compact
    def __call__(self, x, train=False, chain_hw=None,
                 chain_defer_in_chs=None):
        # x may be a tuple of chain tensors (decomposed concat: ConvLayer
        # computes conv(concat(x)) as a sum of per-part convs)
        if chain_defer_in_chs is not None:
            # H-major defer mode (ops/pallas/hiw_scale.py): hand back the
            # step list [(folded params, c_in), ...]; the caller runs the
            # first step as a multi-leg hiw kernel over the parts and the
            # rest single-leg. Param shapes match the eager path exactly
            # (in_ch = sum).
            hid_ch = sum(chain_defer_in_chs) // 2
            p1 = ConvLayer(hid_ch, ksize=self.ksize1, name="conv1")(
                None, train, chain_hw=chain_hw,
                chain_defer_in_ch=sum(chain_defer_in_chs))
            p2 = ConvLayer(self.out_ch, ksize=self.ksize2, name="conv2")(
                None, train, chain_hw=chain_hw,
                chain_defer_in_ch=hid_ch)
            return [(p1, sum(chain_defer_in_chs)), (p2, hid_ch)]
        if isinstance(x, (tuple, list)):
            hid_ch = sum(t.shape[1] for t in x) // 2
        else:
            hid_ch = (x.shape[1] if chain_hw is not None
                      else x.shape[-1]) // 2
        y = ConvLayer(hid_ch, ksize=self.ksize1, name="conv1")(
            x, train, chain_hw=chain_hw)
        return ConvLayer(self.out_ch, ksize=self.ksize2, name="conv2")(
            y, train, chain_hw=chain_hw)


class ECB(ConvBlock):
    """1x1 -> 3x3 (UNFusion encoder block)."""
    ksize1: int = 1
    ksize2: int = 3


class DCB(ConvBlock):
    """3x3 -> 3x3 (UNFusion decoder block)."""
    ksize1: int = 3
    ksize2: int = 3


class RFN(nn.Module):
    """Residual fusion network (RFN-Nest): learned two-input fusion.
    chain_hw: run on guard-layout chain tensors (concat on axis 1)."""

    num_ch: int

    @nn.compact
    def __call__(self, x1, x2=None, train=False, chain_hw=None,
                 hiw_n=None):
        if hiw_n is not None:
            # H-major multi-leg path (ops/pallas/hiw_scale.py): x1 is the
            # full 2n-batch H-major tensor [feats1; feats2]; the 2c-in
            # convs (res, fuse1) run both halves as b_off legs of one
            # strip kernel. Param names/shapes match the eager path.
            import os

            from .pallas.hiw_scale import hiw_conv, hiw_mconv
            interp = bool(os.environ.get("MMIF_CHAIN_INTERPRET"))
            c, n, f = self.num_ch, hiw_n, x1
            h, w = chain_hw

            def dfr(name, ksize, c_in):
                return ConvLayer(c, ksize=ksize, name=name)(
                    None, train, chain_hw=chain_hw,
                    chain_defer_in_ch=c_in)

            f_res = hiw_mconv([(f, c, 0), (f, c, n)],
                              dfr("res", 3, 2 * c), h, w, n_out=n,
                              interpret=interp)
            f1 = hiw_conv(f[:n], dfr("conv1", 3, c), c, h, w,
                          interpret=interp)
            f2 = hiw_conv(f[n:], dfr("conv2", 3, c), c, h, w,
                          interpret=interp)
            y = hiw_mconv([(f1, c, 0), (f2, c, 0)], dfr("fuse1", 1, 2 * c),
                          h, w, n_out=n, interpret=interp)
            y = hiw_conv(y, dfr("fuse2", 3, c), c, h, w, interpret=interp)
            y = hiw_conv(y, dfr("fuse3", 3, c), c, h, w, interpret=interp)
            return y + f_res
        chain = chain_hw is not None
        # chain tensors pass as part-tuples: ConvLayer computes
        # conv(concat(...)) as summed per-part convs, skipping the concat
        f_res = ConvLayer(self.num_ch, name="res")(
            (x1, x2) if chain else concat_fusion((x1, x2)),
            train, chain_hw=chain_hw)
        f1 = ConvLayer(self.num_ch, name="conv1")(x1, train,
                                                  chain_hw=chain_hw)
        f2 = ConvLayer(self.num_ch, name="conv2")(x2, train,
                                                  chain_hw=chain_hw)
        y = (f1, f2) if chain else concat_fusion((f1, f2))
        y = ConvLayer(self.num_ch, ksize=1, name="fuse1")(y, train,
                                                          chain_hw=chain_hw)
        y = ConvLayer(self.num_ch, name="fuse2")(y, train,
                                                 chain_hw=chain_hw)
        y = ConvLayer(self.num_ch, name="fuse3")(y, train,
                                                 chain_hw=chain_hw)
        return y + f_res


class NestEncoder(nn.Module):
    """UNFusion's dense multi-scale encoder grid (EB2_1..EB4_3) with
    cross-scale downsampled concats."""

    block: Callable            # module factory f(out_ch, name=...)
    in_ch: Sequence[int]
    out_ch: Sequence[int]
    down_mode: str = "stride"

    @nn.compact
    def __call__(self, feats, train=False):
        blk = self.block
        in_ch, out_ch = self.in_ch, self.out_ch

        def down(ch, name, x):
            if self.down_mode == "maxpool":
                return max_pool(x, 2, 2)
            return ConvLayer(ch, stride=2, name=name)(x, train)

        x2_1 = blk(out_ch[1], name="EB2_1")(concat_fusion(feats[1]), train)
        x3_1 = blk(in_ch[2] * 2, name="EB3_1")(concat_fusion(feats[2]), train)
        x4_1 = blk(in_ch[3] * 2, name="EB4_1")(concat_fusion(feats[3]), train)

        x3_2 = blk(out_ch[2], name="EB3_2")(
            concat_fusion((feats[2][0], x3_1, down(out_ch[1], "down1",
                                                   x2_1))), train)
        x4_2 = blk(in_ch[3] * 4 + in_ch[2], name="EB4_2")(
            concat_fusion((feats[3][0], x4_1, down(in_ch[2] * 2, "down2",
                                                   x3_1))), train)

        x4_3 = blk(out_ch[3], name="EB4_3")(
            concat_fusion((feats[3][0], x4_1, x4_2,
                           down(out_ch[2], "down3", x3_2))), train)

        return feats[0], x2_1, x3_2, x4_3


class Downsample(nn.Module):
    """Max-pool downsample + reflect-pad-to-shape repair for odd sizes."""

    kernel_size: int = 2
    stride: int = 2

    @nn.compact
    def __call__(self, feat, shape):
        out = max_pool(feat, self.kernel_size, self.stride)
        return pad_to(out, shape)


class Upsample(nn.Module):
    """Nearest / bilinear(align_corners=True) upsample + reflect-pad-to-shape
    repair — the shape-safe resample pair that makes odd-sized full-res
    inference work (reference block.py:941-991)."""

    mode: str = "bilinear"
    scale_factor: int = 2

    @nn.compact
    def __call__(self, feat, shape=None):
        out = interpolate(feat, self.scale_factor, self.mode)
        if shape is None:
            return out
        return pad_to(out, shape)


def pad_to(feat, shape):
    """Reflect-pad (or crop) NHWC `feat` to target H,W from `shape` (an
    NHWC shape tuple or (h, w)). Negative "padding" crops, matching torch
    ReflectionPad2d semantics that DBNet's x8-upsample path relies on at
    odd sizes (reference block.py:954-962 with e.g. 6*8=48 -> 45)."""
    if len(shape) >= 3:
        th, tw = shape[-3], shape[-2]
    else:
        th, tw = shape
    fh, fw = feat.shape[-3], feat.shape[-2]
    if (fh, fw) == (th, tw):
        return feat
    pad_h = th - fh
    pad_w = tw - fw
    ph1, pw1 = pad_h // 2, pad_w // 2
    ph2, pw2 = pad_h - ph1, pad_w - pw1

    # crop first (negative pads), then reflect-pad the rest
    def split(lo, hi, size):
        crop_lo = max(-lo, 0)
        crop_hi = max(-hi, 0)
        return crop_lo, size - crop_lo - crop_hi, max(lo, 0), max(hi, 0)

    ch_lo, ch_len, ph1p, ph2p = split(ph1, ph2, fh)
    cw_lo, cw_len, pw1p, pw2p = split(pw1, pw2, fw)
    feat = feat[:, ch_lo:ch_lo + ch_len, cw_lo:cw_lo + cw_len, :]
    if ph1p or ph2p or pw1p or pw2p:
        feat = pad2d(feat, (pw1p, pw2p, ph1p, ph2p), "reflect")
    return feat


class Decoder(nn.Module):
    """Plain up-path decoder."""

    block: Callable
    num_ch: Sequence[int]
    up_mode: str = "bilinear"

    @nn.compact
    def __call__(self, feats, train=False):
        up = Upsample(self.up_mode, 2, name="up")
        y3 = self.block(self.num_ch[2], name="DB3")(
            up(feats[3], feats[2].shape), train)
        y2 = self.block(self.num_ch[1], name="DB2")(
            up(y3, feats[1].shape), train)
        y1 = self.block(self.num_ch[0], name="DB1")(
            up(y2, feats[0].shape), train)
        return y1


class LSDecoder(nn.Module):
    """U-Net long-skip decoder."""

    block: Callable
    num_ch: Sequence[int]
    up_mode: str = "bilinear"

    @nn.compact
    def __call__(self, feats, train=False):
        up = Upsample(self.up_mode, 2, name="up")
        y3 = self.block(self.num_ch[2], name="DB3")(
            concat_fusion((feats[2], up(feats[3], feats[2].shape))), train)
        y2 = self.block(self.num_ch[1], name="DB2")(
            concat_fusion((feats[1], up(y3, feats[1].shape))), train)
        y1 = self.block(self.num_ch[0], name="DB1")(
            concat_fusion((feats[0], up(y2, feats[0].shape))), train)
        return y1


class NestDecoder(nn.Module):
    """U-Net++ nested decoder. chain_hws: per-scale valid (h, w) — feats
    are guard-layout chain tensors and the ups/concats stay
    NCHW-resident (ops/pallas/chain_ops)."""

    block: Callable
    num_ch: Sequence[int]
    up_mode: str = "bilinear"

    @nn.compact
    def __call__(self, feats, train=False, chain_hws=None, hiw=False):
        blk = self.block
        if hiw:
            # H-major multi-leg path (round 5, ops/pallas/hiw_scale.py):
            # every DB block's concat-consuming first conv runs ALL its
            # parts in one strip kernel (conv_hiw_chain_multi) instead of
            # summed per-part launches. feats: per-scale H-major tensors
            # of self.num_ch channels; chain_hws: per-scale valid (h, w).
            import os

            from .pallas.hiw_scale import hiw_conv, hiw_mconv, \
                hiw_upsample
            interp = bool(os.environ.get("MMIF_CHAIN_INTERPRET"))
            hws = chain_hws
            ch = self.num_ch
            n = feats[0].shape[0]

            def up(xt, c, i_from, i_to):
                return hiw_upsample(xt, c, *hws[i_from], hws[i_to], 2,
                                    self.up_mode)

            def run(name, out_ch, legs, i):
                cs = tuple(c for _, c in legs)
                steps = blk(out_ch, name=name)(
                    None, train, chain_hw=hws[i],
                    chain_defer_in_chs=cs)
                y = hiw_mconv([(t, c, 0) for t, c in legs], steps[0][0],
                              *hws[i], n_out=n, interpret=interp)
                for p, c_in in steps[1:]:
                    y = hiw_conv(y, p, c_in, *hws[i], interpret=interp)
                return y

            f = list(zip(feats, ch))
            x1_1 = run("DB1_1", ch[0],
                       [f[0], (up(f[1][0], ch[1], 1, 0), ch[1])], 0)
            x2_1 = run("DB2_1", ch[1],
                       [f[1], (up(f[2][0], ch[2], 2, 1), ch[2])], 1)
            x3_1 = run("DB3_1", ch[2],
                       [f[2], (up(f[3][0], ch[3], 3, 2), ch[3])], 2)
            x1_2 = run("DB1_2", ch[0],
                       [f[0], (x1_1, ch[0]),
                        (up(x2_1, ch[1], 1, 0), ch[1])], 0)
            x2_2 = run("DB2_2", ch[1],
                       [f[1], (x2_1, ch[1]),
                        (up(x3_1, ch[2], 2, 1), ch[2])], 1)
            x1_3 = run("DB1_3", ch[0],
                       [f[0], (x1_1, ch[0]), (x1_2, ch[0]),
                        (up(x2_2, ch[1], 1, 0), ch[1])], 0)
            return x1_3
        if chain_hws is not None:
            from .pallas.chain_ops import chain_upsample
            hws = chain_hws

            def up(xt, i_from, i_to):
                return chain_upsample(xt, *hws[i_from], hws[i_to], 2,
                                      self.up_mode)[0]

            def run(name, ch, ts, i):
                # pass the parts (no concat): ConvLayer decomposes
                # conv(concat(ts)) into summed per-part convs
                return blk(ch, name=name)(ts, train, chain_hw=hws[i])

            x1_1 = run("DB1_1", self.num_ch[0],
                       (feats[0], up(feats[1], 1, 0)), 0)
            x2_1 = run("DB2_1", self.num_ch[1],
                       (feats[1], up(feats[2], 2, 1)), 1)
            x3_1 = run("DB3_1", self.num_ch[2],
                       (feats[2], up(feats[3], 3, 2)), 2)
            x1_2 = run("DB1_2", self.num_ch[0],
                       (feats[0], x1_1, up(x2_1, 1, 0)), 0)
            x2_2 = run("DB2_2", self.num_ch[1],
                       (feats[1], x2_1, up(x3_1, 2, 1)), 1)
            x1_3 = run("DB1_3", self.num_ch[0],
                       (feats[0], x1_1, x1_2, up(x2_2, 1, 0)), 0)
            return x1_3
        up = Upsample(self.up_mode, 2, name="up")
        x1_1 = blk(self.num_ch[0], name="DB1_1")(
            concat_fusion((feats[0], up(feats[1], feats[0].shape))), train)
        x2_1 = blk(self.num_ch[1], name="DB2_1")(
            concat_fusion((feats[1], up(feats[2], feats[1].shape))), train)
        x3_1 = blk(self.num_ch[2], name="DB3_1")(
            concat_fusion((feats[2], up(feats[3], feats[2].shape))), train)

        x1_2 = blk(self.num_ch[0], name="DB1_2")(
            concat_fusion((feats[0], x1_1, up(x2_1, x1_1.shape))), train)
        x2_2 = blk(self.num_ch[1], name="DB2_2")(
            concat_fusion((feats[1], x2_1, up(x3_1, x2_1.shape))), train)

        x1_3 = blk(self.num_ch[0], name="DB1_3")(
            concat_fusion((feats[0], x1_1, x1_2, up(x2_2, x1_2.shape))),
            train)
        return x1_3


class FSDecoder(nn.Module):
    """U-Net3+ full-scale decoder."""

    block: Callable
    num_ch: Sequence[int]
    up_mode: str = "bilinear"

    @nn.compact
    def __call__(self, feats, train=False, chain_hws=None, hiw=False):
        blk = self.block
        if hiw:
            # H-major multi-leg path (round 5, ops/pallas/hiw_scale.py):
            # every DB block's 4-part concat conv runs in one strip
            # kernel; cross-scale moves via hiw_max_pool/hiw_upsample.
            import os

            from .pallas.hiw_scale import (hiw_conv, hiw_max_pool,
                                           hiw_mconv, hiw_upsample)
            interp = bool(os.environ.get("MMIF_CHAIN_INTERPRET"))
            hws = chain_hws
            ch = self.num_ch
            n = feats[0].shape[0]

            def down(xt, c, i_from, i_to, window):
                return hiw_max_pool(xt, c, *hws[i_from], window,
                                    to_hw=hws[i_to])[0]

            def up(xt, c, i_from, i_to, scale):
                return hiw_upsample(xt, c, *hws[i_from], hws[i_to],
                                    scale, self.up_mode)

            def run(name, out_ch, legs, i):
                cs = tuple(c for _, c in legs)
                steps = blk(out_ch, name=name)(
                    None, train, chain_hw=hws[i],
                    chain_defer_in_chs=cs)
                y = hiw_mconv([(t, c, 0) for t, c in legs], steps[0][0],
                              *hws[i], n_out=n, interpret=interp)
                for p, c_in in steps[1:]:
                    y = hiw_conv(y, p, c_in, *hws[i], interpret=interp)
                return y

            f = list(zip(feats, ch))
            y3 = run("DB3", ch[2],
                     [(down(f[0][0], ch[0], 0, 2, 4), ch[0]),
                      (down(f[1][0], ch[1], 1, 2, 2), ch[1]),
                      f[2], (up(f[3][0], ch[3], 3, 2, 2), ch[3])], 2)
            y2 = run("DB2", ch[1],
                     [(down(f[0][0], ch[0], 0, 1, 2), ch[0]),
                      f[1], (up(y3, ch[2], 2, 1, 2), ch[2]),
                      (up(f[3][0], ch[3], 3, 1, 4), ch[3])], 1)
            y1 = run("DB1", ch[0],
                     [f[0], (up(y2, ch[1], 1, 0, 2), ch[1]),
                      (up(y3, ch[2], 2, 0, 4), ch[2]),
                      (up(f[3][0], ch[3], 3, 0, 8), ch[3])], 0)
            return y1
        if chain_hws is not None:
            from .pallas.chain_ops import chain_max_pool, chain_upsample
            hws = chain_hws

            def down(xt, i_from, i_to, window):
                return chain_max_pool(xt, *hws[i_from], window,
                                      to_hw=hws[i_to])[0]

            def up(xt, i_from, i_to, scale):
                return chain_upsample(xt, *hws[i_from], hws[i_to], scale,
                                      self.up_mode)[0]

            def run(name, ch, ts, i):
                # pass the parts (no concat): the scale-0 DB concats reach
                # 2.7 GB/image at full res; ConvLayer decomposes
                # conv(concat(ts)) into summed per-part convs instead
                return blk(ch, name=name)(ts, train, chain_hw=hws[i])

            y3 = run("DB3", self.num_ch[2],
                     (down(feats[0], 0, 2, 4), down(feats[1], 1, 2, 2),
                      feats[2], up(feats[3], 3, 2, 2)), 2)
            y2 = run("DB2", self.num_ch[1],
                     (down(feats[0], 0, 1, 2), feats[1], up(y3, 2, 1, 2),
                      up(feats[3], 3, 1, 4)), 1)
            y1 = run("DB1", self.num_ch[0],
                     (feats[0], up(y2, 1, 0, 2), up(y3, 2, 0, 4),
                      up(feats[3], 3, 0, 8)), 0)
            return y1
        down1 = Downsample(2, 2, name="down1")
        down2 = Downsample(4, 4, name="down2")
        up1 = Upsample(self.up_mode, 2, name="up1")
        up2 = Upsample(self.up_mode, 4, name="up2")
        up3 = Upsample(self.up_mode, 8, name="up3")

        x1_3 = down2(feats[0], feats[2].shape)
        x2_3 = down1(feats[1], feats[2].shape)
        x4_3 = up1(feats[3], feats[2].shape)
        y3 = blk(self.num_ch[2], name="DB3")(
            concat_fusion((x1_3, x2_3, feats[2], x4_3)), train)

        x1_2 = down1(feats[0], feats[1].shape)
        x3_2 = up1(y3, feats[1].shape)
        x4_2 = up2(feats[3], feats[1].shape)
        y2 = blk(self.num_ch[1], name="DB2")(
            concat_fusion((x1_2, feats[1], x3_2, x4_2)), train)

        x2_1 = up1(y2, feats[0].shape)
        x3_1 = up2(y3, feats[0].shape)
        x4_1 = up3(feats[3], feats[0].shape)
        y1 = blk(self.num_ch[0], name="DB1")(
            concat_fusion((feats[0], x2_1, x3_1, x4_1)), train)
        return y1
