"""The 16-model fusion zoo (TPU re-design of reference core/model.py).

Every model is a flax module over NHWC single-channel images with the
reference's siamese encoder -> fuse -> decoder shape:

    model.apply(vars, img1, img2, train=...)  -> fused image
    model.apply(vars, img1, train=...)        -> autoencoder reconstruction
                                                 (two-stage training mode,
                                                 model.py:43-51)

Weight sharing between the two encoder passes is automatic (the same flax
submodule applied twice), mirroring the reference's shared `self.encode`.
Fusion-strategy strings are static config, resolved at trace time.

Model -> reference mapping (file:line in /root/reference/core/model.py):
  PFNetv1 69-111, PFNetv2 114-141, DeepFuse 147-162, DenseFuse 165-186,
  VIFNet 189-206, DBNet 209-244, SEDRFuse 247-316, NestFuse 319-363,
  RFNNest 366-384, UNFusion 387-439, Res2Fusion 442-472, MAFusion 475-508,
  IFCNN 514-528, DIFNet 531-552, PMGI 555-624, MyFusion 630-842.
"""

import functools
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import (DCB, DCBlock, ECB, RFN, Attention, ConvBlock,
                          ConvFormerBlock, ConvLayer, Decoder, DenseBlock,
                          Downsample, FSDecoder, LSDecoder, MetaFormerBlock,
                          MixConvBlock, MixFormerBlock, NestDecoder,
                          NestEncoder, Res2ConvBlock, Res2FormerBlock,
                          ResBlock, SepConvBlock, TransformerBlock,
                          TransitionBlock, Upsample)
from ..ops.fusion import (attention_fusion, concat_fusion, element_fusion,
                          spatial_pooling, weighted_fusion)
from ..ops.layers import max_pool

__all__ = [
    "PFNetv1", "PFNetv2", "DeepFuse", "DenseFuse", "VIFNet", "DBNet",
    "SEDRFuse", "NestFuse", "RFNNest", "UNFusion", "Res2Fusion", "MAFusion",
    "IFCNN", "DIFNet", "PMGI", "MyFusion", "MODEL_ZOO", "create_model",
]


class _FusionModel(nn.Module):
    """Siamese encoder -> fusion -> decoder base (model.py:27-63)."""

    def encoder(self, img, train):
        raise NotImplementedError

    def fusion(self, feat1, feat2):
        raise NotImplementedError

    def decoder(self, feat, train):
        raise NotImplementedError

    def __call__(self, img1, img2=None, train=False):
        if img2 is None:
            return self.decoder(self.encoder(img1, train), train)
        if not train:
            # siamese fold: the two shared-weight encoder passes run as ONE
            # pass on a batch-concatenated input — same math, half the conv
            # dispatches (the reference calls encode twice, model.py:43-63).
            # Only in eval mode: train-mode batch-norm stats would change
            # from being computed over the concatenated batch.
            n = img1.shape[0]
            feats = self.encoder(jnp.concatenate([img1, img2], axis=0),
                                 train)
            feat1 = jax.tree.map(lambda f: f[:n], feats)
            feat2 = jax.tree.map(lambda f: f[n:], feats)
        else:
            feat1 = self.encoder(img1, train)
            feat2 = self.encoder(img2, train)
        fused = self.fusion(feat1, feat2)
        return self.decoder(fused, train)


# ---------------------------------------------------------------------------
# H-major halo-in-weights chain helpers (round 4, ops/pallas/hiw_kernel.py)
# ---------------------------------------------------------------------------
# Concat-free zoo paths: a ConvLayer is deferred into its folded
# (kernel, bias, k, act) tuple (chain_defer_in_ch) and run through the
# H-major kernels; channel concats become leg lists, residual adds become
# identity-kernel legs. The hot op this reforms is every model's ConvLayer
# (reference core/block.py:26-118).


def _hiw_interp():
    import os
    return bool(os.environ.get("MMIF_CHAIN_INTERPRET"))


def _hiw_conv(t, params, c_in, h, w, fuse_n=0):
    """Single-leg H-major conv from a deferred ConvLayer param tuple."""
    from ..ops.pallas.hiw_kernel import conv_hiw_chain
    wgt, bias, k, act = params
    return conv_hiw_chain(t, wgt, k, h=h, w_valid=w, c_in=c_in, bias=bias,
                          act=act, fuse_n=fuse_n, interpret=_hiw_interp())


def _hiw_mconv(legs, params, h, w, n_out, fuse_n=0):
    """Multi-leg H-major conv: legs = [(tensor, c_in, b_off), ...] in the
    reference's channel-concat order."""
    from ..ops.pallas.hiw_kernel import conv_hiw_chain_multi
    wgt, bias, k, act = params
    return conv_hiw_chain_multi(
        tuple(t for t, _, _ in legs), wgt, k, h=h, w_valid=w,
        c_ins=tuple(c for _, c, _ in legs),
        b_offs=tuple(b for _, _, b in legs), n_out=n_out, bias=bias,
        act=act, fuse_n=fuse_n, interpret=_hiw_interp())


def _hiw_resblock(rb_params, t, c, h, w, n_out):
    """ResBlock (conv -> conv -> + identity, block.py:121-134) with the
    residual add riding the second conv as an identity-kernel leg."""
    from ..ops.pallas.hiw_kernel import hiw_identity_weights
    p1, (w2, b2, k2, a2) = rb_params
    y = _hiw_conv(t, p1, c, h, w)
    wcat = jnp.concatenate([w2, hiw_identity_weights(k2, c, w2.dtype)],
                           axis=2)
    return _hiw_mconv([(y, c, 0), (t, c, 0)], (wcat, b2, k2, a2), h, w,
                      n_out=n_out)


def _hiw_dense_legs(gray, conv_in, dense, h, w, n_out):
    """conv_in(1->16) + DenseBlock growth as a 4-leg list
    (block.py:137-151): [x0, y1, y2, y3], never concatenated."""
    x0 = _hiw_conv(gray, conv_in(None, chain_hw=(h, w),
                                 chain_defer_in_ch=1), 1, h, w)
    legs = [(x0, 16, 0)]
    for p in dense(None, chain_hw=(h, w),
                   chain_defer_in_chs=(16, 32, 48)):
        legs.append((_hiw_mconv(legs, p, h, w, n_out=n_out), 16, 0))
    return legs


# ---------------------------------------------------------------------------
# 1. polarization / intensity fusion
# ---------------------------------------------------------------------------


class PFNetv1(nn.Module):
    """PFNet: unshared dual dense encoders + concat fusion."""

    @nn.compact
    def __call__(self, img1, img2, train=False):
        from ..ops.layers import chain_ready

        # guard-layout fast path (all convs are reflect-SAME k3, fusion is
        # channel concat): the two unshared encoders each run in the chain
        chain = not train and chain_ready()
        if chain:
            from ..ops.pallas.hiw_kernel import hiw_multi_enabled
            if hiw_multi_enabled("pfnetv1"):
                # H-major chain: each unshared encoder yields 4 dense
                # legs; the 128-ch concat fusion is the 8-leg decode0
                # (reference model.py:69-111)
                from ..ops.pallas.hiw_kernel import hiw_enter, hiw_exit

                n, h, w = img1.shape[0], img1.shape[1], img1.shape[2]
                legs = []
                for img, tag in ((img1, "1"), (img2, "2")):
                    legs += _hiw_dense_legs(
                        hiw_enter(img), ConvLayer(16, name=f"conv_in_{tag}"),
                        DenseBlock(16, name=f"dense_{tag}"), h, w, n)
                feat, cin = None, 128
                for i, (ch, act) in enumerate([(128, "relu"), (64, "relu"),
                                               (32, "relu"), (16, "relu"),
                                               (1, None)]):
                    p = ConvLayer(ch, act=act, name=f"decode{i}")(
                        None, chain_hw=(h, w), chain_defer_in_ch=cin)
                    feat = (_hiw_mconv(legs, p, h, w, n_out=n) if i == 0
                            else _hiw_conv(feat, p, cin, h, w))
                    cin = ch
                return hiw_exit(feat, h, w)
            from ..ops.pallas.conv_kernel import chain_enter, chain_exit

            h, w = img1.shape[1], img1.shape[2]
            img1, img2 = chain_enter(img1), chain_enter(img2)
            kw = dict(chain_hw=(h, w))
        else:
            kw = {}

        def encode(img, tag):
            x = ConvLayer(16, name=f"conv_in_{tag}")(img, train, **kw)
            return DenseBlock(16, name=f"dense_{tag}")(x, train, **kw)

        feat = concat_fusion((encode(img1, "1"), encode(img2, "2")),
                             axis=1 if chain else -1)
        for i, (ch, act) in enumerate([(128, "relu"), (64, "relu"),
                                       (32, "relu"), (16, "relu"),
                                       (1, None)]):
            feat = ConvLayer(ch, act=act, name=f"decode{i}")(feat, train,
                                                             **kw)
        return chain_exit(feat, h, w) if chain else feat


class PFNetv2(_FusionModel):
    """Self-learned per-channel fusion subnet.

    The reference fuses channel-by-channel in a Python loop
    (model.py:134-141); here the channel dim folds into the batch so the
    shared 2->2->2->1 fuse net runs once — identical math, one conv kernel
    launch instead of 64."""

    def setup(self):
        self.conv_in = ConvLayer(16, name="conv_in")
        self.dense = DenseBlock(16, name="dense")
        self.fuse_layers = [
            ConvLayer(2, name="fuse0"),
            ConvLayer(2, name="fuse1"),
            ConvLayer(1, act=None, name="fuse2"),
        ]
        self.decode_layers = [
            ConvLayer(64, name="decode0"),
            ConvLayer(32, name="decode1"),
            ConvLayer(16, name="decode2"),
            ConvLayer(1, act=None, name="decode3"),
        ]

    def encoder(self, img, train):
        return self.dense(self.conv_in(img, train), train)

    def fusion(self, feat1, feat2, train=False):
        b, h, w, c = feat1.shape
        # (B,H,W,C) x2 -> (B*C, H, W, 2): channel pairs as batch entries
        z = jnp.stack([feat1, feat2], axis=-1)          # (B,H,W,C,2)
        z = jnp.moveaxis(z, 3, 1).reshape(b * c, h, w, 2)
        for layer in self.fuse_layers:
            z = layer(z, train)
        z = z.reshape(b, c, h, w)
        fused = jnp.moveaxis(z, 1, -1)
        return fused + feat1 + feat2

    def decoder(self, feat, train):
        for layer in self.decode_layers:
            feat = layer(feat, train)
        return feat

    def __call__(self, img1, img2=None, train=False):
        from ..ops.layers import chain_ready

        if img2 is not None and not train and chain_ready():
            from ..ops.pallas.hiw_kernel import hiw_multi_enabled
            if hiw_multi_enabled("pfnetv2"):
                return self._hiw_forward(img1, img2)
            from ..ops.pallas.conv_kernel import chain_enter, chain_exit

            # chain fast path: the channels-into-batch fuse-net fold is a
            # pure leading-axis reshape in the guard layout
            n, h, w = img1.shape[0], img1.shape[1], img1.shape[2]
            t = chain_enter(jnp.concatenate([img1, img2], axis=0))
            t = self.conv_in(t, train=False, chain_hw=(h, w))
            t = self.dense(t, train=False, chain_hw=(h, w))
            f1, f2 = t[:n], t[n:]
            c, hg, wp = f1.shape[1], f1.shape[2], f1.shape[3]
            z = jnp.stack([f1, f2], axis=2).reshape(n * c, 2, hg, wp)
            for layer in self.fuse_layers:
                z = layer(z, train=False, chain_hw=(h, w))
            t = z.reshape(n, c, hg, wp) + f1 + f2
            for layer in self.decode_layers:
                t = layer(t, train=False, chain_hw=(h, w))
            return chain_exit(t, h, w)
        if img2 is None:
            return self.decoder(self.encoder(img1, train), train)
        feat1 = self.encoder(img1, train)
        feat2 = self.encoder(img2, train)
        return self.decoder(self.fusion(feat1, feat2, train), train)

    def _hiw_forward(self, img1, img2):
        """H-major path (round 5): dense encoder as multi-leg banded
        dots (pfnetv1 pattern), and the per-channel 2->2->2->1 fuse net
        as ONE block-diagonal banded conv per layer — the shared
        (3,3,2,2) params tile across the 64 channel groups at trace
        time (hiw_scale.hiw_group_weights), replacing the
        channels-into-batch fold (reference model.py:134-141)."""
        from ..ops.pallas.hiw_kernel import (conv_hiw_chain, hiw_enter,
                                             hiw_exit)
        from ..ops.pallas.hiw_scale import hiw_conv, hiw_group_weights

        interp = _hiw_interp()
        n, h, w = img1.shape[0], img1.shape[1], img1.shape[2]
        legs = _hiw_dense_legs(
            hiw_enter(jnp.concatenate([img1, img2], axis=0)),
            self.conv_in, self.dense, h, w, n_out=2 * n)
        wp = legs[0][0].shape[2]
        hg = legs[0][0].shape[1] // 16
        # (2n, HG, 64, Wp) feature; channel-interleaved (c, {f1,f2})
        # 128-ch fuse input is one stack + reshape
        v = jnp.concatenate(
            [t.reshape(2 * n, hg, 16, wp) for t, _, _ in legs], axis=2)
        f1, f2 = v[:n], v[n:]
        z = jnp.stack([f1, f2], axis=3).reshape(n, hg * 128, wp)
        groups, c_in = 64, 128
        for layer in self.fuse_layers:
            wgt, bias, k, act = layer(None, chain_hw=(h, w),
                                      chain_defer_in_ch=2)
            wfull = hiw_group_weights(wgt, groups)
            bfull = (jnp.tile(jnp.asarray(bias), groups)
                     if bias is not None else None)
            z = conv_hiw_chain(z, wfull.astype(z.dtype), k, h=h,
                               w_valid=w, c_in=c_in, bias=bfull, act=act,
                               interpret=interp)
            c_in = groups * layer.out_ch
        t = z + (f1 + f2).reshape(n, hg * 64, wp)
        c_in = 64
        for layer in self.decode_layers:
            t = hiw_conv(t, layer(None, chain_hw=(h, w),
                                  chain_defer_in_ch=c_in),
                         c_in, h, w, interpret=interp)
            c_in = layer.out_ch
        return hiw_exit(t, h, w)


# ---------------------------------------------------------------------------
# 2. infrared / visible fusion
# ---------------------------------------------------------------------------


class DeepFuse(_FusionModel):
    """2-conv (k5,k7) encoder, elementwise-sum fusion, 3-conv decoder."""

    fusion_mode: str = "sum"

    def setup(self):
        self.enc = [
            ConvLayer(16, ksize=5, name="enc0"),
            ConvLayer(32, ksize=7, name="enc1"),
        ]
        self.dec = [
            ConvLayer(32, ksize=7, name="dec0"),
            ConvLayer(16, ksize=5, name="dec1"),
            ConvLayer(1, ksize=5, act=None, name="dec2"),
        ]

    def __call__(self, img1, img2=None, train=False):
        from ..ops.layers import chain_ready

        # NCHW-resident fast path (TPU inference): the whole forward runs
        # in the conv kernel's guard layout — one entry/exit transpose on
        # the 1-channel boundary instead of a pad + two transposes per
        # layer (docs/PERFORMANCE.md round 2). Elementwise fusion modes
        # work directly on chain tensors.
        # int8 chains: the H-major path quantizes in-kernel (ops/pallas/
        # hiw_int8.py), so it may run UNDER quantized_inference —
        # MMIF_HIW_INT8=0 reverts to the NHWC int8 dispatch
        from ..ops.quant import quant_ctx
        qc = quant_ctx()
        import os
        hiw_q = (qc is not None
                 and os.environ.get("MMIF_HIW_INT8", "1") != "0")
        if (img2 is not None and not train
                and chain_ready(allow_quant=hiw_q)
                and self.fusion_mode in ("sum", "mean", "max")):
            from ..ops.pallas.conv_kernel import (chain_enter, chain_exit,
                                                  conv_tlane_chain_pair)

            n, h, w = img1.shape[0], img1.shape[1], img1.shape[2]
            # Fused two-conv strip kernels (round-3 rewrite: in-kernel
            # halos + ssai epilogues): enc0+enc1 share strips with the
            # 16-ch intermediate VMEM-resident, and dec1+dec2 eliminate
            # the c_out=1 tail conv's input re-read. Measured end-to-end:
            # 85.4 vs 100.8 pairs/s at b16 full res — the per-strip cost
            # of two convs' VPU work on the larger mid tiles loses more
            # than the saved HBM round trip, mirroring the rows=32
            # regression. OPT-IN via MMIF_CHAIN_PAIR=1; default unfused.
            use_pair = bool(os.environ.get("MMIF_CHAIN_PAIR"))
            interp = bool(os.environ.get("MMIF_CHAIN_INTERPRET"))

            # Halo-in-weights H-major chain (round 4, ops/pallas/
            # hiw_kernel.py): deletes the C-major kernel's kh A-build —
            # the measured VPU bottleneck — by folding the kh taps into a
            # block-banded weight LHS; the dot's RHS becomes a contiguous
            # sublane window of the strip. MMIF_CHAIN_HIW=auto/0/1.
            from ..ops.pallas.hiw_kernel import hiw_enabled
            if (hiw_enabled() or qc is not None) and not use_pair:
                from ..ops.pallas.hiw_kernel import (conv_hiw_chain,
                                                     hiw_enter, hiw_exit)

                t = hiw_enter(jnp.concatenate([img1, img2], axis=0))
                chain_dtype = t.dtype

                def _leg_amax(layer, c_in, k):
                    """Calibrated amax if this leg runs int8 (the thin
                    entry/exit layers — c_in=1 / c_out=1 — stay bf16)."""
                    if qc is None:
                        return None
                    from ..ops.pallas.hiw_int8 import hiw_q_ok
                    from ..ops.quant import quant_skipped
                    # full '/'-joined path — the key `calibrate`
                    # produces — so the lookup stays correct if this
                    # chain is reused from a nested module (ADVICE r4)
                    amax = qc.get("/".join(layer.path))
                    if (amax is not None and layer.out_ch > 1
                            and not quant_skipped(tuple(layer.path))
                            and hiw_q_ok(c_in, layer.out_ch, k)):
                        import numpy as _np
                        amax = _np.asarray(amax, _np.float32)
                        if amax.shape == (c_in,) and amax.max() > 0:
                            return amax
                    return None

                def hconv(t, layer, c_in, fuse_n=0, out_scale=None):
                    wgt, bias, k, act = layer(None, chain_hw=(h, w),
                                              chain_defer_in_ch=c_in)
                    amax = _leg_amax(layer, c_in, k)
                    if amax is not None:
                        from ..ops.pallas.hiw_int8 import conv_hiw_chain_q
                        return conv_hiw_chain_q(
                            t, wgt, k, h=h, w_valid=w, c_in=c_in,
                            amax=jnp.asarray(amax), bias=bias,
                            act=act, fuse_n=fuse_n, out_scale=out_scale,
                            out_dtype=chain_dtype, interpret=interp)
                    return conv_hiw_chain(
                        t, wgt.astype(t.dtype), k, h=h, w_valid=w,
                        c_in=c_in, bias=bias, act=act, fuse_n=fuse_n,
                        interpret=interp)

                def _res_scale(prod, prod_cin, cons, cons_cin):
                    """int8-RESIDENT hop prod -> cons (round 5): when
                    both legs run int8 and the hop meets the (32,128)
                    int8 tile alignment contract, prod requantizes its
                    epilogue onto cons's fold grid (out_scale) and
                    emits an int8 chain tensor — half the DMA bytes on
                    the hop — and cons skips its per-strip quantize
                    pass. Returns cons's fold vector or None."""
                    if qc is None:
                        return None
                    from ..ops.pallas.hiw_int8 import (hiw_fold_scale,
                                                       hiw_q_res_ok,
                                                       hiw_res_enabled)
                    from ..ops.pallas.hiw_kernel import hiw_pick_g
                    if not hiw_res_enabled():
                        return None
                    a_p = _leg_amax(prod, prod_cin, prod.ksize)
                    a_c = _leg_amax(cons, cons_cin, cons.ksize)
                    gp = hiw_pick_g(prod_cin, prod.out_ch, prod.ksize)
                    gc = hiw_pick_g(cons_cin, cons.out_ch, cons.ksize)
                    if (a_p is not None and a_c is not None
                            and prod.act in (None, "relu")
                            and hiw_q_res_ok(prod.out_ch, cons.ksize,
                                             gp, gc)):
                        wc = cons(None, chain_hw=(h, w),
                                  chain_defer_in_ch=cons_cin)[0]
                        return hiw_fold_scale(jnp.asarray(a_c), wc)
                    return None

                # resident hops: enc1->dec0 (the fattest strip; only on
                # the 'sum' path, where the siamese add rides the int8
                # grid in-kernel) and dec0->dec1 (both branches)
                enc1_scale = (_res_scale(self.enc[1], 16, self.dec[0], 32)
                              if self.fusion_mode == "sum" else None)
                dec0_scale = _res_scale(self.dec[0], 32, self.dec[1], 32)

                t = hconv(t, self.enc[0], 1)
                t = hconv(t, self.enc[1], 16, out_scale=enc1_scale)
                if self.fusion_mode == "sum":
                    t = hconv(t, self.dec[0], 32, fuse_n=n,
                              out_scale=dec0_scale)
                else:
                    # elementwise fusion works directly on H-major tensors
                    t = element_fusion(t[:n], t[n:], self.fusion_mode)
                    t = hconv(t, self.dec[0], 32, out_scale=dec0_scale)
                t = hconv(t, self.dec[1], 32)
                t = hconv(t, self.dec[2], 16)
                return hiw_exit(t, h, w)

            # Space-to-depth packed chain (MMIF_S2D=1, ops/s2d.py): the
            # k5/k7 convs run as k3/k5 convs on f^2=4x the channels —
            # kp/k less VPU staging/roll traffic per original pixel on
            # the VPU-bound kernel, at (kp*f/k)^2 more MXU dot FLOPs
            # (the MXU has ~3x headroom). Same math, f32-rounding equal.
            from ..ops.s2d import s2d_enabled, s2d_io_enabled
            use_s2d = (s2d_enabled()
                       and not use_pair and h % 2 == 0 and w % 2 == 0)
            if use_s2d:
                from ..ops.pallas.s2d_io import (s2d_chain_enter,
                                                 s2d_chain_exit, s2d_io_ok)
                from ..ops.s2d import s2d_pack, s2d_unpack

                # packed enter/exit strip kernels (pack + guard placement
                # in one bandwidth-bound pass each; row phases ride the
                # DMA, lane phases via the u32 bit-pun — ops/pallas/
                # s2d_io.py). Opt-in until TPU-measured.
                use_io = (s2d_io_enabled()
                          and s2d_io_ok(h, w, img1.dtype))
                pair = jnp.concatenate([img1, img2], axis=0)
                if use_io:
                    t = s2d_chain_enter(pair, interpret=interp)
                else:
                    t = chain_enter(s2d_pack(pair, 2))
                hw = (h // 2, w // 2)
                for layer in self.enc:
                    t = layer(t, train=False, chain_hw=hw, chain_s2d=2)
                if self.fusion_mode == "sum":
                    t = self.dec[0](t, train=False, chain_hw=hw,
                                    chain_fuse_n=n, chain_s2d=2)
                else:
                    t = element_fusion(t[:n], t[n:], self.fusion_mode)
                    t = self.dec[0](t, train=False, chain_hw=hw,
                                    chain_s2d=2)
                for layer in self.dec[1:]:
                    t = layer(t, train=False, chain_hw=hw, chain_s2d=2)
                if use_io:
                    return s2d_chain_exit(t, h, w, interpret=interp)
                return s2d_unpack(chain_exit(t, *hw), 2)

            t = chain_enter(jnp.concatenate([img1, img2], axis=0))

            def pair(t, la, in_a, lb, in_b):
                wa, ba, ka, aa = la(None, chain_hw=(h, w),
                                    chain_defer_in_ch=in_a)
                wb, bb, kb, ab = lb(None, chain_hw=(h, w),
                                    chain_defer_in_ch=in_b)
                return conv_tlane_chain_pair(
                    t, wa.astype(t.dtype), wb.astype(t.dtype), ka, kb,
                    h=h, w_valid=w, bias_a=ba, act_a=aa, bias_b=bb,
                    act_b=ab, interpret=interp)

            if use_pair:
                t = pair(t, self.enc[0], 1, self.enc[1], 16)
            else:
                for layer in self.enc:
                    t = layer(t, train=False, chain_hw=(h, w))
            if self.fusion_mode == "sum":
                # elementwise-sum fusion folds into dec0's input DMA
                # (kills the 11.5 ms XLA slice+add round trip,
                # docs/PERFORMANCE.md round-3 profile)
                t = self.dec[0](t, train=False, chain_hw=(h, w),
                                chain_fuse_n=n)
            else:
                t = element_fusion(t[:n], t[n:], self.fusion_mode)
                t = self.dec[0](t, train=False, chain_hw=(h, w))
            if use_pair:
                t = pair(t, self.dec[1], 32, self.dec[2], 16)
            else:
                for layer in self.dec[1:]:
                    t = layer(t, train=False, chain_hw=(h, w))
            return chain_exit(t, h, w)
        return super().__call__(img1, img2, train)

    def encoder(self, img, train):
        for layer in self.enc:
            img = layer(img, train)
        return img

    def fusion(self, feat1, feat2):
        return element_fusion(feat1, feat2, self.fusion_mode)

    def decoder(self, feat, train):
        for layer in self.dec:
            feat = layer(feat, train)
        return feat


class DenseFuse(_FusionModel):
    """Dense encoder (64ch), sum or l1-spatial-attention fusion."""

    fusion_mode: str = "sum"     # 'sum' | 'l1'

    def setup(self):
        self.conv_in = ConvLayer(16, name="conv_in")
        self.dense = DenseBlock(16, name="dense")
        self.dec = [
            ConvLayer(64, name="dec0"),
            ConvLayer(32, name="dec1"),
            ConvLayer(16, name="dec2"),
            ConvLayer(1, act=None, name="dec3"),
        ]

    def encoder(self, img, train):
        return self.dense(self.conv_in(img, train), train)

    def fusion(self, feat1, feat2):
        if self.fusion_mode == "sum":
            return element_fusion(feat1, feat2, "sum")
        elif self.fusion_mode == "l1":
            return attention_fusion(feat1, feat2, "sa", spatial_mode="l1")
        raise ValueError("only supported ['sum', 'l1'] mode")

    def decoder(self, feat, train):
        for layer in self.dec:
            feat = layer(feat, train)
        return feat

    def __call__(self, img1, img2=None, train=False):
        from ..ops.layers import chain_ready

        if (img2 is not None and not train and chain_ready()
                and self.fusion_mode in ("sum", "l1")):
            from ..ops.pallas.hiw_kernel import hiw_multi_enabled
            if (hiw_multi_enabled("densefuse")
                    and self.fusion_mode == "sum"):
                return self._hiw_forward(img1, img2)
            from ..ops.pallas.conv_kernel import chain_enter, chain_exit

            n, h, w = img1.shape[0], img1.shape[1], img1.shape[2]
            t = chain_enter(jnp.concatenate([img1, img2], axis=0))
            t = self.conv_in(t, train=False, chain_hw=(h, w))
            t = self.dense(t, train=False, chain_hw=(h, w))
            if self.fusion_mode == "sum":
                t = element_fusion(t[:n], t[n:], "sum")
            else:
                # l1 spatial attention is per-pixel over channels (axis 1
                # in the chain layout) — no cross-pixel mixing, chain-safe
                t = attention_fusion(t[:n], t[n:], "sa", spatial_mode="l1",
                                     caxis=1)
            for layer in self.dec:
                t = layer(t, train=False, chain_hw=(h, w))
            return chain_exit(t, h, w)
        return super().__call__(img1, img2, train)

    def _hiw_forward(self, img1, img2):
        """H-major halo-in-weights chain: dense growth as leg lists, the
        siamese 'sum' fusion folded into dec0's input DMA (reference
        topology model.py:165-186)."""
        from ..ops.pallas.hiw_kernel import hiw_enter, hiw_exit

        n, h, w = img1.shape[0], img1.shape[1], img1.shape[2]
        t = hiw_enter(jnp.concatenate([img1, img2], axis=0))
        legs = _hiw_dense_legs(t, self.conv_in, self.dense, h, w, 2 * n)

        def dfr(layer, c):
            return layer(None, chain_hw=(h, w), chain_defer_in_ch=c)

        t = _hiw_mconv(legs, dfr(self.dec[0], 64), h, w, n_out=n, fuse_n=n)
        for layer, c in zip(self.dec[1:], (64, 32, 16)):
            t = _hiw_conv(t, dfr(layer, c), c, h, w)
        return hiw_exit(t, h, w)


class VIFNet(_FusionModel):
    """DenseFuse encoder, concat fusion, 5-conv decoder from 128ch."""

    def setup(self):
        self.conv_in = ConvLayer(16, name="conv_in")
        self.dense = DenseBlock(16, name="dense")
        self.dec = [
            ConvLayer(128, name="dec0"),
            ConvLayer(64, name="dec1"),
            ConvLayer(32, name="dec2"),
            ConvLayer(16, name="dec3"),
            ConvLayer(1, act=None, name="dec4"),
        ]

    def encoder(self, img, train):
        return self.dense(self.conv_in(img, train), train)

    def fusion(self, feat1, feat2):
        return concat_fusion((feat1, feat2))

    def decoder(self, feat, train):
        for layer in self.dec:
            feat = layer(feat, train)
        return feat

    def __call__(self, img1, img2=None, train=False):
        from ..ops.layers import chain_ready

        if img2 is not None and not train and chain_ready():
            from ..ops.pallas.hiw_kernel import hiw_multi_enabled
            if hiw_multi_enabled("vifnet"):
                return self._hiw_forward(img1, img2)
            from ..ops.pallas.conv_kernel import chain_enter, chain_exit

            n, h, w = img1.shape[0], img1.shape[1], img1.shape[2]
            t = chain_enter(jnp.concatenate([img1, img2], axis=0))
            t = self.conv_in(t, train=False, chain_hw=(h, w))
            t = self.dense(t, train=False, chain_hw=(h, w))
            t = concat_fusion((t[:n], t[n:]), axis=1)
            for layer in self.dec:
                t = layer(t, train=False, chain_hw=(h, w))
            return chain_exit(t, h, w)
        return super().__call__(img1, img2, train)

    def _hiw_forward(self, img1, img2):
        """H-major chain: dense legs; the 128-ch concat fusion becomes
        the same 4 legs read at both batch halves (b_offs 0 and n) by
        dec0 (reference model.py:189-206)."""
        from ..ops.pallas.hiw_kernel import hiw_enter, hiw_exit

        n, h, w = img1.shape[0], img1.shape[1], img1.shape[2]
        t = hiw_enter(jnp.concatenate([img1, img2], axis=0))
        legs = _hiw_dense_legs(t, self.conv_in, self.dense, h, w, 2 * n)
        legs = ([(t_, c, 0) for t_, c, _ in legs]
                + [(t_, c, n) for t_, c, _ in legs])

        def dfr(layer, c):
            return layer(None, chain_hw=(h, w), chain_defer_in_ch=c)

        t = _hiw_mconv(legs, dfr(self.dec[0], 128), h, w, n_out=n)
        for layer, c in zip(self.dec[1:], (128, 64, 32, 16)):
            t = _hiw_conv(t, dfr(layer, c), c, h, w)
        return hiw_exit(t, h, w)


class DBNet(_FusionModel):
    """Dual-branch: detail (dense) + semantic (3x stride-2, x8 bilinear up)."""

    fusion_mode: str = "sum"     # 'sum' | 'avg'

    def setup(self):
        self.conv_in = ConvLayer(32, name="conv_in")
        self.detail = [
            ConvLayer(16, name="detail0"),
            DenseBlock(16, name="detail1"),
        ]
        self.semantic = [
            ConvLayer(64, stride=2, name="semantic0"),
            ConvLayer(128, stride=2, name="semantic1"),
            ConvLayer(64, stride=2, name="semantic2"),
        ]
        self.up = Upsample("bilinear", 8, name="up")
        self.dec = [
            ConvLayer(64, name="dec0"),
            ConvLayer(32, name="dec1"),
            ConvLayer(16, name="dec2"),
            ConvLayer(1, act=None, name="dec3"),
        ]

    def encoder(self, img, train):
        feat = self.conv_in(img, train)
        d = feat
        for layer in self.detail:
            d = layer(d, train)
        s = feat
        for layer in self.semantic:
            s = layer(s, train)
        s = self.up(s, feat.shape)
        return concat_fusion((d, s))

    def fusion(self, feat1, feat2):
        if self.fusion_mode == "sum":
            return element_fusion(feat1, feat2, "sum")
        elif self.fusion_mode == "avg":
            return attention_fusion(feat1, feat2, "ca", channel_mode="avg")
        raise ValueError("only supported ['sum', 'avg'] mode")

    def decoder(self, feat, train):
        for layer in self.dec:
            feat = layer(feat, train)
        return feat

    def __call__(self, img1, img2=None, train=False):
        from ..ops.layers import chain_ready

        # Hybrid fast path: encoder stays NHWC (the semantic branch's
        # stride-2 convs are not chain-eligible; its stride-1 convs use
        # the standalone kernel), then fusion + the 4-conv decoder run
        # NCHW-resident.
        if (img2 is not None and not train and chain_ready()
                and self.fusion_mode in ("sum", "avg")):
            from ..ops.pallas.hiw_kernel import hiw_multi_enabled
            if hiw_multi_enabled("dbnet"):
                return self._hiw_forward(img1, img2)
            from ..ops.pallas.conv_kernel import chain_enter, chain_exit

            n, h, w = img1.shape[0], img1.shape[1], img1.shape[2]
            feat = self.encoder(jnp.concatenate([img1, img2], axis=0),
                                False)
            t = chain_enter(feat)
            if self.fusion_mode == "sum":
                fused = element_fusion(t[:n], t[n:], "sum")
            else:
                fused = attention_fusion(t[:n], t[n:], "ca",
                                         channel_mode="avg", caxis=1,
                                         valid_hw=(h, w))
            for layer in self.dec:
                fused = layer(fused, train=False, chain_hw=(h, w))
            return chain_exit(fused, h, w)
        return super().__call__(img1, img2, train)

    def _hiw_forward(self, img1, img2):
        """H-major decode (round 5): NHWC dual-branch encoder, then
        fusion + the 128->64->32->16->1 decoder as H-major strip
        kernels (reference model.py forward for DBNet)."""
        from ..ops.pallas.hiw_kernel import hiw_exit
        from ..ops.pallas.hiw_scale import (hiw_attention_fusion,
                                            hiw_conv, hiw_enter_c)

        interp = _hiw_interp()
        n, h, w = img1.shape[0], img1.shape[1], img1.shape[2]
        feat = self.encoder(jnp.concatenate([img1, img2], axis=0), False)
        c_in = feat.shape[-1]
        t = hiw_enter_c(feat)
        if self.fusion_mode == "sum":
            t = element_fusion(t[:n], t[n:], "sum")
        else:
            t = hiw_attention_fusion(t, n, c_in, h, w, mode="ca",
                                     channel_mode="avg")
        for layer in self.dec:
            t = hiw_conv(t, layer(None, chain_hw=(h, w),
                                  chain_defer_in_ch=c_in),
                         c_in, h, w, interpret=interp)
            c_in = layer.out_ch
        return hiw_exit(t, h, w)


class SEDRFuse(nn.Module):
    """Symmetric encoder-decoder with residual block; cross encode/decode
    skips; max fusion of shallow feats + softmax-attention fusion of the
    deep residual feat (model.py:247-316)."""

    norm: Optional[str] = "group"

    def setup(self):
        self.enc0 = ConvLayer(64, norm=self.norm, name="enc0")
        self.enc1 = ConvLayer(128, stride=2, norm=self.norm, name="enc1")
        self.enc2 = ConvLayer(256, stride=2, norm=self.norm, name="enc2")
        self.res = ResBlock(256, norm1=self.norm, norm2=self.norm,
                            name="res")
        self.dec0 = ConvLayer(128, stride=2, norm=self.norm, transpose=True,
                              name="dec0")
        self.dec1 = ConvLayer(64, stride=2, norm=self.norm, transpose=True,
                              name="dec1")
        self.dec2 = ConvLayer(1, name="dec2")

    def encoder(self, img, train):
        f_conv1 = self.enc0(img, train)
        f_conv2 = self.enc1(f_conv1, train)
        f_conv3 = self.enc2(f_conv2, train)
        f_res = self.res(f_conv3, train)
        return f_conv1, f_conv2, f_res

    def fusion(self, feat1, feat2):
        tmp1 = jnp.abs(feat1)
        tmp2 = jnp.abs(feat2)
        att1 = jax.nn.softmax(tmp1, axis=-1) * tmp1
        att2 = jax.nn.softmax(tmp2, axis=-1) * tmp2
        s1 = spatial_pooling(att1, mode="sum")
        s2 = spatial_pooling(att2, mode="sum")
        return weighted_fusion(feat1, feat2, s1, s2)

    def decoder(self, f_conv1, f_conv2, f_res, train):
        f1 = jax.nn.relu(f_conv2 + self.dec0(f_res, train))
        f2 = jax.nn.relu(f_conv1 + self.dec1(f1, train))
        return self.dec2(f2, train)

    def __call__(self, img1, img2=None, train=False):
        if img2 is None:
            f_conv1, f_conv2, f_res = self.encoder(img1, train)
            return self.decoder(f_conv1, f_conv2, f_res, train)
        f1_conv1, f1_conv2, f1_res = self.encoder(img1, train)
        f2_conv1, f2_conv2, f2_res = self.encoder(img2, train)
        f_conv1 = element_fusion(f1_conv1, f2_conv1, mode="max")
        f_conv2 = element_fusion(f1_conv2, f2_conv2, mode="max")
        f_res = self.fusion(f1_res, f2_res)
        return self.decoder(f_conv1, f_conv2, f_res, train)


class NestFuse(_FusionModel):
    """4-scale ConvBlock encoder + U-Net++ decoder, per-scale sca attention
    fusion."""

    down_mode: str = "maxpool"
    up_mode: str = "nearest"
    fusion_mode: str = "sca"
    num_ch: Sequence[int] = (64, 112, 160, 208)
    # H-major whole-model path available (_hiw_forward); MAFusion's
    # FSDecoder has no hiw route yet and opts out
    _hiw_ok: bool = True

    def setup(self):
        ch = self.num_ch
        self.conv_in = ConvLayer(16, ksize=1, name="conv_in")
        self.CB1_0 = ConvBlock(ch[0], name="CB1_0")
        self.CB2_0 = ConvBlock(ch[1], name="CB2_0")
        self.CB3_0 = ConvBlock(ch[2], name="CB3_0")
        self.CB4_0 = ConvBlock(ch[3], name="CB4_0")
        if self.down_mode == "stride":
            self.down1 = ConvLayer(ch[0], stride=2, name="down1")
            self.down2 = ConvLayer(ch[1], stride=2, name="down2")
            self.down3 = ConvLayer(ch[2], stride=2, name="down3")
        self.decode = NestDecoder(ConvBlock, ch, self.up_mode, name="decode")
        self.conv_out = ConvLayer(1, ksize=1, name="conv_out")

    def _down(self, which, x, train):
        if self.down_mode == "maxpool":
            return max_pool(x, 2, 2)
        return getattr(self, f"down{which}")(x, train)

    def encoder(self, img, train):
        x1_0 = self.CB1_0(self.conv_in(img, train), train)
        x2_0 = self.CB2_0(self._down(1, x1_0, train), train)
        x3_0 = self.CB3_0(self._down(2, x2_0, train), train)
        x4_0 = self.CB4_0(self._down(3, x3_0, train), train)
        return x1_0, x2_0, x3_0, x4_0

    def fusion(self, feats1, feats2):
        return tuple(
            attention_fusion(f1, f2, self.fusion_mode)
            for f1, f2 in zip(feats1, feats2))

    def decoder(self, feats, train):
        return self.conv_out(self.decode(feats, train), train)

    def __call__(self, img1, img2=None, train=False):
        from ..ops.layers import chain_ready

        # NCHW-resident multi-scale fast path (round 3): the whole 4-scale
        # encoder/fusion/U-Net++(or 3+) decoder runs in the conv kernel's
        # guard layout; scale boundaries (maxpool down, nearest/bilinear
        # up + shape repair, channel concats) stay NCHW via
        # ops/pallas/chain_ops, so no per-layer pad/transpose anywhere.
        if (img2 is not None and not train and chain_ready()
                and self.down_mode == "maxpool"
                and self.fusion_mode in ("sa", "ca", "sca", "wavg")):
            from ..ops.pallas.hiw_kernel import hiw_multi_enabled
            if self._hiw_ok and hiw_multi_enabled(
                    type(self).__name__.lower()):
                return self._hiw_forward(img1, img2)
            from ..ops.pallas.chain_ops import chain_max_pool
            from ..ops.pallas.conv_kernel import chain_enter, chain_exit

            n, h, w = img1.shape[0], img1.shape[1], img1.shape[2]
            t = chain_enter(jnp.concatenate([img1, img2], axis=0))
            hws = [(h, w)]
            for _ in range(3):
                ph, pw = hws[-1]
                hws.append((ph // 2, pw // 2))
            x = self.conv_in(t, train=False, chain_hw=hws[0])
            x1 = self.CB1_0(x, train=False, chain_hw=hws[0])
            d1, _ = chain_max_pool(x1, *hws[0])
            x2 = self.CB2_0(d1, train=False, chain_hw=hws[1])
            d2, _ = chain_max_pool(x2, *hws[1])
            x3 = self.CB3_0(d2, train=False, chain_hw=hws[2])
            d3, _ = chain_max_pool(x3, *hws[2])
            x4 = self.CB4_0(d3, train=False, chain_hw=hws[3])
            fused = self._chain_fuse((x1, x2, x3, x4), n, hws)
            y = self.decode(fused, train=False, chain_hws=hws)
            out = self.conv_out(y, train=False, chain_hw=hws[0])
            return chain_exit(out, h, w)
        return super().__call__(img1, img2, train)

    def _chain_fuse(self, feats, n, hws):
        return tuple(
            attention_fusion(f[:n], f[n:], self.fusion_mode, caxis=1,
                             valid_hw=hw)
            for f, hw in zip(feats, hws))

    def _hiw_forward(self, img1, img2):
        """H-major multi-leg whole-model path (round 5, VERDICT #4): the
        U-Net++ decoder's concat-consuming convs run all their parts in
        one strip kernel (ops/pallas/hiw_scale.py), the reform that took
        DenseFuse 27.7 -> 196.9 pairs/s. Scale boundaries (maxpool,
        nearest/bilinear up) and the per-scale attention fusion stay on
        the H-major valid view. Reference model.py:846-905 forward."""
        from ..ops.pallas.hiw_kernel import hiw_enter, hiw_exit
        from ..ops.pallas.hiw_scale import hiw_conv, hiw_max_pool

        interp = _hiw_interp()
        ch = self.num_ch
        n, h, w = img1.shape[0], img1.shape[1], img1.shape[2]
        hws = [(h, w)]
        for _ in range(3):
            ph, pw = hws[-1]
            hws.append((ph // 2, pw // 2))

        def cb(blk, t, c_in, hw):
            y = t
            for p, ci in blk(None, False, chain_hw=hw,
                             chain_defer_in_chs=(c_in,)):
                y = hiw_conv(y, p, ci, *hw, interpret=interp)
            return y

        t = hiw_enter(jnp.concatenate([img1, img2], axis=0))
        x = hiw_conv(t, self.conv_in(None, chain_hw=hws[0],
                                     chain_defer_in_ch=1), 1, *hws[0],
                     interpret=interp)
        x1 = cb(self.CB1_0, x, 16, hws[0])
        d1, _ = hiw_max_pool(x1, ch[0], *hws[0])
        x2 = cb(self.CB2_0, d1, ch[0], hws[1])
        d2, _ = hiw_max_pool(x2, ch[1], *hws[1])
        x3 = cb(self.CB3_0, d2, ch[1], hws[2])
        d3, _ = hiw_max_pool(x3, ch[2], *hws[2])
        x4 = cb(self.CB4_0, d3, ch[2], hws[3])
        fused = self._hiw_fuse((x1, x2, x3, x4), n, hws)
        y = self.decode(fused, train=False, chain_hws=hws, hiw=True)
        out = hiw_conv(y, self.conv_out(None, chain_hw=hws[0],
                                        chain_defer_in_ch=ch[0]),
                       ch[0], *hws[0], interpret=interp)
        return hiw_exit(out, h, w)

    def _hiw_fuse(self, feats, n, hws):
        from ..ops.pallas.hiw_scale import hiw_attention_fusion
        return tuple(
            hiw_attention_fusion(f, n, c, *hw, mode=self.fusion_mode)
            for f, c, hw in zip(feats, self.num_ch, hws))


class RFNNest(NestFuse):
    """NestFuse + learned per-scale RFN fusion modules."""

    def setup(self):
        NestFuse.setup(self)
        self.RFN1 = RFN(self.num_ch[0], name="RFN1")
        self.RFN2 = RFN(self.num_ch[1], name="RFN2")
        self.RFN3 = RFN(self.num_ch[2], name="RFN3")
        self.RFN4 = RFN(self.num_ch[3], name="RFN4")

    def fusion(self, feats1, feats2, train=False):
        return (
            self.RFN1(feats1[0], feats2[0], train),
            self.RFN2(feats1[1], feats2[1], train),
            self.RFN3(feats1[2], feats2[2], train),
            self.RFN4(feats1[3], feats2[3], train),
        )

    def _chain_fuse(self, feats, n, hws):
        rfns = (self.RFN1, self.RFN2, self.RFN3, self.RFN4)
        return tuple(
            r(f[:n], f[n:], train=False, chain_hw=hw)
            for r, f, hw in zip(rfns, feats, hws))

    def _hiw_fuse(self, feats, n, hws):
        rfns = (self.RFN1, self.RFN2, self.RFN3, self.RFN4)
        return tuple(
            r(f, train=False, chain_hw=hw, hiw_n=n)
            for r, f, hw in zip(rfns, feats, hws))


class UNFusion(_FusionModel):
    """Dense multi-scale encoder grid + U-Net++ decoder, wavg fusion."""

    down_mode: str = "stride"
    up_mode: str = "bilinear"
    fusion_mode: str = "wavg"

    def setup(self):
        enc_ch = (16, 32, 48, 64)
        dec_ch = (16, 64, 256, 1024)
        self.enc_ch, self.dec_ch = enc_ch, dec_ch
        self.CB1_0 = ConvLayer(enc_ch[0], name="CB1_0")
        self.CB2_0 = ConvLayer(enc_ch[1], name="CB2_0")
        self.CB3_0 = ConvLayer(enc_ch[2], name="CB3_0")
        self.CB4_0 = ConvLayer(enc_ch[3], name="CB4_0")
        if self.down_mode == "stride":
            self.down1 = ConvLayer(enc_ch[0], stride=2, name="down1")
            self.down2 = ConvLayer(enc_ch[1], stride=2, name="down2")
            self.down3 = ConvLayer(enc_ch[2], stride=2, name="down3")
        self.encode = NestEncoder(ECB, enc_ch, dec_ch, self.down_mode,
                                  name="encode")
        self.decode = NestDecoder(DCB, dec_ch, self.up_mode, name="decode")
        self.conv_out = ConvLayer(1, ksize=1, name="conv_out")

    def _down(self, which, x, train):
        if self.down_mode == "maxpool":
            return max_pool(x, 2, 2)
        return getattr(self, f"down{which}")(x, train)

    def encoder(self, img, train):
        x1_0 = self.CB1_0(img, train)
        d1_0 = self._down(1, x1_0, train)
        x2_0 = self.CB2_0(d1_0, train)
        d2_0 = self._down(2, x2_0, train)
        x3_0 = self.CB3_0(d2_0, train)
        d3_0 = self._down(3, x3_0, train)
        x4_0 = self.CB4_0(d3_0, train)
        return self.encode(
            (x1_0, (x2_0, d1_0), (x3_0, d2_0), (x4_0, d3_0)), train)

    def fusion(self, feats1, feats2):
        return tuple(
            attention_fusion(f1, f2, self.fusion_mode)
            for f1, f2 in zip(feats1, feats2))

    def decoder(self, feats, train):
        return self.conv_out(self.decode(feats, train), train)

    def __call__(self, img1, img2=None, train=False):
        from ..ops.layers import chain_ready

        # Hybrid fast path: the encoder keeps the NHWC route (its
        # stride-2 down convs are not chain-eligible; eligible stride-1
        # convs still use the standalone kernel), then fusion + the
        # HEAVY U-Net++ decoder (16/64/256/1024 channels) run
        # NCHW-resident — one chain_enter per scale instead of a
        # pad+2 transposes per decoder conv.
        if (img2 is not None and not train and chain_ready()
                and self.fusion_mode in ("sa", "ca", "sca", "wavg")):
            from ..ops.pallas.hiw_kernel import hiw_multi_enabled
            if hiw_multi_enabled("unfusion"):
                return self._hiw_forward(img1, img2)
            from ..ops.pallas.conv_kernel import chain_enter, chain_exit

            n, h, w = img1.shape[0], img1.shape[1], img1.shape[2]
            feats = self.encoder(jnp.concatenate([img1, img2], axis=0),
                                 False)
            hws = [(f.shape[1], f.shape[2]) for f in feats]
            fused = []
            for f, hw in zip(feats, hws):
                t = chain_enter(f)
                fused.append(attention_fusion(t[:n], t[n:],
                                              self.fusion_mode, caxis=1,
                                              valid_hw=hw))
            y = self.decode(fused, train=False, chain_hws=hws)
            out = self.conv_out(y, train=False, chain_hw=hws[0])
            return chain_exit(out, h, w)
        return super().__call__(img1, img2, train)

    def _hiw_forward(self, img1, img2):
        """H-major decode path (round 5, VERDICT #4): the NHWC encoder
        stays (stride-2 down convs are not chain-eligible), then each
        scale enters the H-major layout once; wavg fusion and the HEAVY
        U-Net++ decoder (16/64/256/1024 ch, DCB k3->k3 blocks) run as
        multi-leg strip kernels — the wide 1280->640 leg takes the
        VMEM-aware rows/g pick (hiw_scale.hiw_pick_rows). Reference
        model.py:311-389 forward."""
        from ..ops.pallas.hiw_kernel import hiw_exit
        from ..ops.pallas.hiw_scale import (hiw_attention_fusion,
                                            hiw_conv, hiw_enter_c)

        interp = _hiw_interp()
        n, h, w = img1.shape[0], img1.shape[1], img1.shape[2]
        feats = self.encoder(jnp.concatenate([img1, img2], axis=0),
                             False)
        hws = [(f.shape[1], f.shape[2]) for f in feats]
        fused = [
            hiw_attention_fusion(hiw_enter_c(f), n, c, *hw,
                                 mode=self.fusion_mode)
            for f, c, hw in zip(feats, self.dec_ch, hws)]
        y = self.decode(fused, train=False, chain_hws=hws, hiw=True)
        out = hiw_conv(y, self.conv_out(None, chain_hw=hws[0],
                                        chain_defer_in_ch=self.dec_ch[0]),
                       self.dec_ch[0], *hws[0], interpret=interp)
        return hiw_exit(out, h, w)


class Res2Fusion(_FusionModel):
    """Dense Res2 blocks + double non-local attention fusion."""

    fusion_method: str = "attn"   # 'elem' | 'attn'
    spatial_mode: str = "nl"
    channel_mode: str = "nl"

    def setup(self):
        self.conv_in = ConvLayer(16, name="conv_in")
        self.RB1 = Res2ConvBlock(32, scale=4, name="RB1")
        self.RB2 = Res2ConvBlock(64, scale=8, name="RB2")
        self.dec = [
            ConvLayer(64, name="dec0"),
            ConvLayer(32, name="dec1"),
            ConvLayer(16, name="dec2"),
            ConvLayer(1, name="dec3"),   # ref keeps default ReLU here
        ]

    def encoder(self, img, train):
        x = self.conv_in(img, train)
        x = concat_fusion((x, self.RB1(x, train)))
        x = concat_fusion((x, self.RB2(x, train)))
        return x

    def fusion(self, feat1, feat2):
        if self.fusion_method == "elem":
            return element_fusion(feat1, feat2, "mean")
        elif self.fusion_method == "attn":
            return attention_fusion(feat1, feat2, "sca", self.spatial_mode,
                                    self.channel_mode)
        raise ValueError("only supported ['elem', 'attn'] mode")

    def decoder(self, feat, train):
        for layer in self.dec:
            feat = layer(feat, train)
        return feat

    def __call__(self, img1, img2=None, train=False):
        from ..ops.layers import chain_ready

        # Hybrid fast path: Res2 encoder blocks (grouped dw convs) and the
        # streamed non-local fusion stay NHWC; the 4-conv decoder runs
        # NCHW-resident (or H-major when gated on, round 5).
        if img2 is not None and not train and chain_ready():
            from ..ops.pallas.hiw_kernel import hiw_multi_enabled
            if hiw_multi_enabled("res2fusion"):
                return self._hiw_forward(img1, img2)
            from ..ops.pallas.conv_kernel import chain_enter, chain_exit

            n, h, w = img1.shape[0], img1.shape[1], img1.shape[2]
            feat = self.encoder(jnp.concatenate([img1, img2], axis=0),
                                False)
            if self.fusion_method == "elem":
                t = chain_enter(feat)
                fused = element_fusion(t[:n], t[n:], "mean")
            else:
                fused = chain_enter(self.fusion(feat[:n], feat[n:]))
            for layer in self.dec:
                fused = layer(fused, train=False, chain_hw=(h, w))
            return chain_exit(fused, h, w)
        return super().__call__(img1, img2, train)

    def _hiw_forward(self, img1, img2):
        """H-major forward (round 5): the WHOLE encoder runs in the
        chain layout — the Res2 blocks' hierarchical dw chains as
        diagonal banded dots, the dense growth concats as leg lists
        never materialized. The nl fusion needs NHWC (flash kernel /
        streamed attention), so the 112-ch feature exits for fusion and
        re-enters for the 112->64->32->16->1 decode (two transpose
        passes). Reference model.py forward for Res2Fusion."""
        from ..ops.pallas.hiw_kernel import hiw_enter, hiw_exit
        from ..ops.pallas.hiw_scale import (hiw_conv, hiw_enter_c,
                                            hiw_mconv, hiw_to_nhwc)

        interp = _hiw_interp()
        n, h, w = img1.shape[0], img1.shape[1], img1.shape[2]
        t = hiw_enter(jnp.concatenate([img1, img2], axis=0))
        x16 = hiw_conv(t, self.conv_in(None, chain_hw=(h, w),
                                       chain_defer_in_ch=1),
                       1, h, w, interpret=interp)
        r1 = self.RB1(x16, train=False, chain_hw=(h, w), hiw_c_in=16)
        r2 = self.RB2([(x16, 16, 0), (r1, 32, 0)], train=False,
                      chain_hw=(h, w), hiw_c_in=48)
        legs = [(x16, 16, 0), (r1, 32, 0), (r2, 64, 0)]
        if self.fusion_method == "elem":
            fused_legs = [(element_fusion(t_[:n], t_[n:], "mean"), c, 0)
                          for t_, c, _ in legs]
            t = hiw_mconv(fused_legs, self.dec[0](
                None, chain_hw=(h, w), chain_defer_in_ch=112), h, w,
                n_out=n, interpret=interp)
        else:
            feat = jnp.concatenate(
                [hiw_to_nhwc(t_, c, h, w) for t_, c, _ in legs], axis=-1)
            t = hiw_enter_c(self.fusion(feat[:n], feat[n:]))
            t = hiw_conv(t, self.dec[0](None, chain_hw=(h, w),
                                        chain_defer_in_ch=112),
                         112, h, w, interpret=interp)
        c_in = self.dec[0].out_ch
        for layer in self.dec[1:]:
            t = hiw_conv(t, layer(None, chain_hw=(h, w),
                                  chain_defer_in_ch=c_in),
                         c_in, h, w, interpret=interp)
            c_in = layer.out_ch
        return hiw_exit(t, h, w)


class MAFusion(NestFuse):
    """NestFuse variant with wider channels and a U-Net3+ decoder."""

    down_mode: str = "maxpool"
    up_mode: str = "bilinear"
    num_ch: Sequence[int] = (64, 128, 256, 512)
    _hiw_ok: bool = True

    def setup(self):
        ch = self.num_ch
        self.conv_in = ConvLayer(16, ksize=1, name="conv_in")
        self.CB1_0 = ConvBlock(ch[0], name="CB1_0")
        self.CB2_0 = ConvBlock(ch[1], name="CB2_0")
        self.CB3_0 = ConvBlock(ch[2], name="CB3_0")
        self.CB4_0 = ConvBlock(ch[3], name="CB4_0")
        if self.down_mode == "stride":
            self.down1 = ConvLayer(ch[0], stride=2, name="down1")
            self.down2 = ConvLayer(ch[1], stride=2, name="down2")
            self.down3 = ConvLayer(ch[2], stride=2, name="down3")
        self.decode = FSDecoder(ConvBlock, ch, self.up_mode, name="decode")
        self.conv_out = ConvLayer(1, ksize=1, name="conv_out")


# ---------------------------------------------------------------------------
# 3. general image fusion
# ---------------------------------------------------------------------------


class IFCNN(_FusionModel):
    """7x7 + BN conv encoder, elementwise-max fusion."""

    norm: Optional[str] = "batch"

    def setup(self):
        self.enc = [
            ConvLayer(64, ksize=7, act=None, name="enc0"),
            ConvLayer(64, norm=self.norm, name="enc1"),
        ]
        self.dec = [
            ConvLayer(64, norm=self.norm, name="dec0"),
            ConvLayer(1, ksize=1, act=None, name="dec1"),
        ]

    def encoder(self, img, train):
        for layer in self.enc:
            img = layer(img, train)
        return img

    def fusion(self, feat1, feat2):
        return element_fusion(feat1, feat2, "max")

    def decoder(self, feat, train):
        for layer in self.dec:
            feat = layer(feat, train)
        return feat

    def __call__(self, img1, img2=None, train=False):
        from ..ops.layers import chain_ready

        # chain fast path: eval-mode BN folds into the convs, max fusion
        # is elementwise, dec1 is a k1 channel matmul
        if img2 is not None and not train and chain_ready():
            from ..ops.pallas.hiw_kernel import hiw_multi_enabled
            if hiw_multi_enabled("ifcnn"):
                return self._hiw_forward(img1, img2)
            from ..ops.pallas.conv_kernel import chain_enter, chain_exit

            n, h, w = img1.shape[0], img1.shape[1], img1.shape[2]
            t = chain_enter(jnp.concatenate([img1, img2], axis=0))
            for layer in self.enc:
                t = layer(t, train=False, chain_hw=(h, w))
            t = element_fusion(t[:n], t[n:], "max")
            for layer in self.dec:
                t = layer(t, train=False, chain_hw=(h, w))
            return chain_exit(t, h, w)
        return super().__call__(img1, img2, train)

    def _hiw_forward(self, img1, img2):
        """H-major chain: folded-BN convs, elementwise max fusion on the
        flat chain tensors, k1 head (reference model.py:514-528)."""
        from ..ops.pallas.hiw_kernel import hiw_enter, hiw_exit

        n, h, w = img1.shape[0], img1.shape[1], img1.shape[2]

        def dfr(layer, c):
            return layer(None, chain_hw=(h, w), chain_defer_in_ch=c)

        t = hiw_enter(jnp.concatenate([img1, img2], axis=0))
        t = _hiw_conv(t, dfr(self.enc[0], 1), 1, h, w)
        t = _hiw_conv(t, dfr(self.enc[1], 64), 64, h, w)
        t = element_fusion(t[:n], t[n:], "max")
        t = _hiw_conv(t, dfr(self.dec[0], 64), 64, h, w)
        t = _hiw_conv(t, dfr(self.dec[1], 64), 64, h, w)
        return hiw_exit(t, h, w)


class DIFNet(_FusionModel):
    """ResBlock encoder/decoder with a learned 1-conv concat fusion."""

    norm: Optional[str] = "batch"

    def setup(self):
        self.enc = [
            ConvLayer(16, name="enc0"),
            ResBlock(16, norm1=self.norm, name="enc1"),
            ResBlock(16, norm1=self.norm, name="enc2"),
        ]
        self.fuse = ConvLayer(16, act=None, name="fuse")
        self.dec = [
            ResBlock(16, norm1=self.norm, name="dec0"),
            ResBlock(16, norm1=self.norm, name="dec1"),
            ResBlock(16, norm1=self.norm, name="dec2"),
            ConvLayer(1, act=None, name="dec3"),
        ]

    def encoder(self, img, train):
        for layer in self.enc:
            img = layer(img, train)
        return img

    def fusion(self, feat1, feat2, train=False):
        return self.fuse(concat_fusion((feat1, feat2)), train)

    def decoder(self, feat, train):
        for layer in self.dec:
            feat = layer(feat, train)
        return feat

    def __call__(self, img1, img2=None, train=False):
        from ..ops.layers import chain_ready

        if img2 is not None and not train and chain_ready():
            from ..ops.pallas.hiw_kernel import hiw_multi_enabled
            if hiw_multi_enabled("difnet"):
                return self._hiw_forward(img1, img2)
            from ..ops.pallas.conv_kernel import chain_enter, chain_exit

            n, h, w = img1.shape[0], img1.shape[1], img1.shape[2]
            t = chain_enter(jnp.concatenate([img1, img2], axis=0))
            for layer in self.enc:
                t = layer(t, train=False, chain_hw=(h, w))
            t = self.fuse(concat_fusion((t[:n], t[n:]), axis=1),
                          train=False, chain_hw=(h, w))
            for layer in self.dec:
                t = layer(t, train=False, chain_hw=(h, w))
            return chain_exit(t, h, w)
        if img2 is None:
            return self.decoder(self.encoder(img1, train), train)
        feat1 = self.encoder(img1, train)
        feat2 = self.encoder(img2, train)
        return self.decoder(self.fusion(feat1, feat2, train), train)

    def _hiw_forward(self, img1, img2):
        """H-major chain: the 6 ResBlock residual adds ride their second
        convs as identity-kernel legs; the learned concat fusion is a
        2-leg conv across batch halves (reference model.py:531-552)."""
        from ..ops.pallas.hiw_kernel import hiw_enter, hiw_exit

        n, h, w = img1.shape[0], img1.shape[1], img1.shape[2]

        def dfr(layer, c):
            return layer(None, chain_hw=(h, w), chain_defer_in_ch=c)

        def rb(block, t, n_out):
            return _hiw_resblock(
                block(None, chain_hw=(h, w), chain_defer_in_ch=16),
                t, 16, h, w, n_out)

        t = hiw_enter(jnp.concatenate([img1, img2], axis=0))
        t = _hiw_conv(t, dfr(self.enc[0], 1), 1, h, w)
        for block in self.enc[1:]:
            t = rb(block, t, 2 * n)
        t = _hiw_mconv([(t, 16, 0), (t, 16, n)], dfr(self.fuse, 32),
                       h, w, n_out=n)
        for block in self.dec[:-1]:
            t = rb(block, t, n)
        t = _hiw_conv(t, dfr(self.dec[-1], 16), 16, h, w)
        return hiw_exit(t, h, w)


class PMGI(nn.Module):
    """Proportional maintenance of gradient and intensity: two 4-layer paths
    with cross-path 1x1 transfer convs, Tanh head, out/2+0.5.

    Reference quirk preserved (model.py:591): `transfer1[1]` is constructed
    but never called — `f1_conv2` uses `transfer2[1]`. We create the dead
    layer too so parameter counts match.
    """

    norm: Optional[str] = "batch"
    act: Optional[str] = "lrelu"

    def setup(self):
        kw = dict(norm=self.norm, act=self.act)
        self.gradient = [
            ConvLayer(16, ksize=5, name="gradient0", **kw),
            ConvLayer(16, name="gradient1", **kw),
            ConvLayer(16, name="gradient2", **kw),
            ConvLayer(16, name="gradient3", **kw),
        ]
        self.intensity = [
            ConvLayer(16, ksize=5, name="intensity0", **kw),
            ConvLayer(16, name="intensity1", **kw),
            ConvLayer(16, name="intensity2", **kw),
            ConvLayer(16, name="intensity3", **kw),
        ]
        self.transfer1 = [
            ConvLayer(16, ksize=1, name="transfer1_0", **kw),
            ConvLayer(16, ksize=1, name="transfer1_1", **kw),  # dead layer
        ]
        self.transfer2 = [
            ConvLayer(16, ksize=1, name="transfer2_0", **kw),
            ConvLayer(16, ksize=1, name="transfer2_1", **kw),
        ]
        self.decode = ConvLayer(1, ksize=1, act="tanh", name="decode")

    def __call__(self, img1, img2, train=False):
        from ..ops.layers import chain_ready

        # Whole-graph chain fast path (round 3): every PMGI op is a
        # stride-1 conv (BN folded in eval) or a channel concat, so both
        # paths run NCHW-resident end to end.
        chain = not train and chain_ready()
        if chain:
            from ..ops.pallas.hiw_kernel import hiw_multi_enabled
            if hiw_multi_enabled("pmgi"):
                return self._hiw_forward(img1, img2)
            from ..ops.pallas.conv_kernel import chain_enter, chain_exit

            h, w = img1.shape[1], img1.shape[2]
            kw = dict(train=False, chain_hw=(h, w))
            cat = functools.partial(concat_fusion, axis=1)
            x1 = chain_enter(concat_fusion((img1, img1, img2)))
            x2 = chain_enter(concat_fusion((img2, img2, img1)))
        else:
            kw = dict(train=train)
            cat = concat_fusion
            x1 = concat_fusion((img1, img1, img2))
            x2 = concat_fusion((img2, img2, img1))
        f0_1 = self.gradient[0](x1, **kw)
        f0_2 = self.intensity[0](x2, **kw)

        f1_1 = self.gradient[1](f0_1, **kw)
        f1_2 = self.intensity[1](f0_2, **kw)
        f1 = cat((f1_1, f1_2))
        f1_conv1 = self.transfer1[0](f1, **kw)
        f1_conv2 = self.transfer2[1](f1, **kw)      # quirk: not transfer1[1]
        # materialize the dead layer's params (flax creates params only for
        # called modules); its output is unused and DCE'd by XLA.
        _ = self.transfer1[1](f1, **kw)
        f1_fuse1 = cat((f0_1, f1_1, f1_conv1))
        f1_fuse2 = cat((f0_2, f1_2, f1_conv2))

        f2_1 = self.gradient[2](f1_fuse1, **kw)
        f2_2 = self.intensity[2](f1_fuse2, **kw)
        f2 = cat((f2_1, f2_2))
        f2_conv1 = self.transfer2[0](f2, **kw)
        f2_conv2 = self.transfer2[1](f2, **kw)
        f2_fuse1 = cat((f0_1, f1_1, f2_1, f2_conv1))
        f2_fuse2 = cat((f0_2, f1_2, f2_2, f2_conv2))

        f3_1 = self.gradient[3](f2_fuse1, **kw)
        f3_2 = self.intensity[3](f2_fuse2, **kw)

        feats = cat((f0_1, f0_2, f1_1, f1_2, f2_1, f2_2, f3_1, f3_2))
        out = self.decode(feats, **kw)
        out = out / 2.0 + 0.5
        if chain:
            return chain_exit(out, h, w)
        return out

    def _hiw_forward(self, img1, img2):
        """H-major chain: every cross-path concat is a leg list; the
        stacked entries concat((i,i,j)) fold to two gray legs with summed
        duplicate weights (reference model.py:555-624; the dead
        transfer1[1] still materializes params, quirk at model.py:591)."""
        from ..ops.pallas.hiw_kernel import hiw_enter, hiw_exit

        n, h, w = img1.shape[0], img1.shape[1], img1.shape[2]
        g1, g2 = hiw_enter(img1), hiw_enter(img2)

        def dfr(layer, c):
            return layer(None, chain_hw=(h, w), chain_defer_in_ch=c)

        def entry(params, ga, gb):
            wgt, bias, k, act = params
            wf = jnp.concatenate(
                [wgt[:, :, 0:1] + wgt[:, :, 1:2], wgt[:, :, 2:3]], axis=2)
            return _hiw_mconv([(ga, 1, 0), (gb, 1, 0)],
                              (wf, bias, k, act), h, w, n_out=n)

        def sconv(t, layer):
            return _hiw_conv(t, dfr(layer, 16), 16, h, w)

        def mconv(tensors, layer):
            legs = [(t, 16, 0) for t in tensors]
            return _hiw_mconv(legs, dfr(layer, 16 * len(legs)), h, w,
                              n_out=n)

        f0_1 = entry(dfr(self.gradient[0], 3), g1, g2)
        f0_2 = entry(dfr(self.intensity[0], 3), g2, g1)
        f1_1 = sconv(f0_1, self.gradient[1])
        f1_2 = sconv(f0_2, self.intensity[1])
        f1_conv1 = mconv((f1_1, f1_2), self.transfer1[0])
        f1_conv2 = mconv((f1_1, f1_2), self.transfer2[1])
        dfr(self.transfer1[1], 32)  # dead layer's params (model.py:591)
        f2_1 = mconv((f0_1, f1_1, f1_conv1), self.gradient[2])
        f2_2 = mconv((f0_2, f1_2, f1_conv2), self.intensity[2])
        f2_conv1 = mconv((f2_1, f2_2), self.transfer2[0])
        f2_conv2 = mconv((f2_1, f2_2), self.transfer2[1])
        f3_1 = mconv((f0_1, f1_1, f2_1, f2_conv1), self.gradient[3])
        f3_2 = mconv((f0_2, f1_2, f2_2, f2_conv2), self.intensity[3])
        out = mconv((f0_1, f0_2, f1_1, f1_2, f2_1, f2_2, f3_1, f3_2),
                    self.decode)
        return hiw_exit(out / 2.0 + 0.5, h, w)


# ---------------------------------------------------------------------------
# 4. configurable meta-model
# ---------------------------------------------------------------------------

_ENCODERS = {
    "sep": SepConvBlock,
    "mix": MixConvBlock,
    "res2": Res2ConvBlock,
    "conv_former": ConvFormerBlock,
    "mix_former": MixFormerBlock,
    "res2_former": Res2FormerBlock,
    "transformer": TransformerBlock,
}

_DECODERS = {
    "plain": Decoder,
    "ls": LSDecoder,
    "nest": NestDecoder,
    "fs": FSDecoder,
}


class MyFusion(nn.Module):
    """Fully configurable 4-scale meta-model (model.py:630-842): encoder
    block type(s), decoder topology, fusion method x mode, down/up modes,
    and how many encoder levels are siamese-shared (4 = fully shared)."""

    encoder: Union[str, Sequence[str]] = "sep"
    decoder: str = "nest"
    use_bias: bool = False
    norm: Optional[str] = None
    act: Optional[str] = "relu6"
    fusion_method: str = "attn"    # 'elem' | 'attn' | 'concat' | 'rfn'
    fusion_mode: str = "sca"
    down_mode: str = "stride"
    up_mode: str = "bilinear"
    share_weight_levels: int = 4
    num_ch: Sequence[int] = (16, 32, 64, 128)

    def setup(self):
        ch = self.num_ch
        kw = dict(use_bias=self.use_bias, norm=self.norm, act=self.act)
        tkw = dict(use_bias=self.use_bias, norm=self.norm, act=self.act,
                   down_mode=self.down_mode)
        swl = self.share_weight_levels

        self.conv_in_1 = ConvLayer(8, ksize=1, name="conv_in_1", **kw)
        self.down1_1 = TransitionBlock(ch[0], stride=1, name="down1_1",
                                       use_bias=self.use_bias,
                                       norm=self.norm, act=self.act)
        self.down2_1 = TransitionBlock(ch[1], stride=2, name="down2_1",
                                       **tkw)
        self.down3_1 = TransitionBlock(ch[2], stride=2, name="down3_1",
                                       **tkw)
        self.down4_1 = TransitionBlock(ch[3], stride=2, name="down4_1",
                                       **tkw)
        if swl < 4:
            self.conv_in_2 = ConvLayer(8, ksize=1, name="conv_in_2", **kw)
            self.down1_2 = TransitionBlock(ch[0], stride=1, name="down1_2",
                                           use_bias=self.use_bias,
                                           norm=self.norm, act=self.act)
        if swl < 3:
            self.down2_2 = TransitionBlock(ch[1], stride=2, name="down2_2",
                                           **tkw)
        if swl < 2:
            self.down3_2 = TransitionBlock(ch[2], stride=2, name="down3_2",
                                           **tkw)
        if swl < 1:
            self.down4_2 = TransitionBlock(ch[3], stride=2, name="down4_2",
                                           **tkw)

        enc = self.encoder
        if isinstance(enc, str):
            enc = [enc] * 4
        blocks = [_ENCODERS[e] for e in enc]
        self.EB1_1 = blocks[0](ch[0], name="EB1_1")
        self.EB2_1 = blocks[1](ch[1], name="EB2_1")
        self.EB3_1 = blocks[2](ch[2], name="EB3_1")
        self.EB4_1 = blocks[3](ch[3], name="EB4_1")
        if swl < 4:
            self.EB1_2 = blocks[0](ch[0], name="EB1_2")
        if swl < 3:
            self.EB2_2 = blocks[1](ch[1], name="EB2_2")
        if swl < 2:
            self.EB3_2 = blocks[2](ch[2], name="EB3_2")
        if swl < 1:
            self.EB4_2 = blocks[3](ch[3], name="EB4_2")

        if self.fusion_method == "elem":
            assert self.fusion_mode in ("sum", "mean", "max")
        elif self.fusion_method == "attn":
            assert self.fusion_mode in ("sa", "ca", "sca", "wavg")
        elif self.fusion_method == "concat":
            self.fuse1 = ConvLayer(ch[0], act=None, name="fuse1")
            self.fuse2 = ConvLayer(ch[1], act=None, name="fuse2")
            self.fuse3 = ConvLayer(ch[2], act=None, name="fuse3")
            self.fuse4 = ConvLayer(ch[3], act=None, name="fuse4")
        elif self.fusion_method == "rfn":
            self.RFN1 = RFN(ch[0], name="RFN1")
            self.RFN2 = RFN(ch[1], name="RFN2")
            self.RFN3 = RFN(ch[2], name="RFN3")
            self.RFN4 = RFN(ch[3], name="RFN4")
        else:
            raise ValueError(
                "only supported ['elem', 'attn', 'concat', 'rfn'] method")

        self.decode = _DECODERS[self.decoder](DCBlock, ch, self.up_mode,
                                              name="decode")
        self.conv_out = ConvLayer(1, ksize=1, name="conv_out", **kw)

    def _branch(self, img, level_mods, train):
        conv_in, d1, e1, d2, e2, d3, e3, d4, e4 = level_mods
        x1 = e1(d1(conv_in(img, train), train), train)
        x2 = e2(d2(x1, train), train)
        x3 = e3(d3(x2, train), train)
        x4 = e4(d4(x3, train), train)
        return x1, x2, x3, x4

    def encoder_fn(self, img1, img2, train):
        swl = self.share_weight_levels
        mods1 = (self.conv_in_1, self.down1_1, self.EB1_1, self.down2_1,
                 self.EB2_1, self.down3_1, self.EB3_1, self.down4_1,
                 self.EB4_1)
        feats1 = self._branch(img1, mods1, train)

        # second branch: levels < (4 - swl) use the unshared copies
        conv_in = self.conv_in_2 if swl < 4 else self.conv_in_1
        d1 = self.down1_2 if swl < 4 else self.down1_1
        e1 = self.EB1_2 if swl < 4 else self.EB1_1
        d2 = self.down2_2 if swl < 3 else self.down2_1
        e2 = self.EB2_2 if swl < 3 else self.EB2_1
        d3 = self.down3_2 if swl < 2 else self.down3_1
        e3 = self.EB3_2 if swl < 2 else self.EB3_1
        d4 = self.down4_2 if swl < 1 else self.down4_1
        e4 = self.EB4_2 if swl < 1 else self.EB4_1
        feats2 = self._branch(img2, (conv_in, d1, e1, d2, e2, d3, e3, d4,
                                     e4), train)
        return feats1, feats2

    def fusion(self, feats1, feats2, train):
        m = self.fusion_method
        if m == "elem":
            return tuple(
                element_fusion(a, b, self.fusion_mode)
                for a, b in zip(feats1, feats2))
        if m == "attn":
            return tuple(
                attention_fusion(a, b, self.fusion_mode)
                for a, b in zip(feats1, feats2))
        if m == "concat":
            fuses = (self.fuse1, self.fuse2, self.fuse3, self.fuse4)
            return tuple(
                fuse(concat_fusion((a, b)), train)
                for fuse, a, b in zip(fuses, feats1, feats2))
        if m == "rfn":
            rfns = (self.RFN1, self.RFN2, self.RFN3, self.RFN4)
            return tuple(
                rfn(a, b, train) for rfn, a, b in zip(rfns, feats1, feats2))
        raise ValueError(m)

    def __call__(self, img1, img2, train=False):
        from ..ops.layers import chain_ready

        # H-major decode fast path (round 5, VERDICT #4): the stride-2
        # TransitionBlock encoder stays NHWC, then fusion + the nest
        # decoder's DCBlocks (pw -> dw -> pw) run as H-major strip
        # kernels with the dw as a diagonal banded dot
        # (ops/pallas/hiw_kernel._hiw_band_weights).
        if (not train and chain_ready() and self.decoder == "nest"
                and self.norm is None
                and self.fusion_method in ("elem", "attn")
                and (self.fusion_method != "attn"
                     or self.fusion_mode in ("sa", "ca", "sca", "wavg"))):
            from ..ops.pallas.hiw_kernel import hiw_multi_enabled
            if hiw_multi_enabled("myfusion"):
                return self._hiw_forward(img1, img2)
        feats1, feats2 = self.encoder_fn(img1, img2, train)
        fused = self.fusion(feats1, feats2, train)
        return self.conv_out(self.decode(fused, train), train)

    def _hiw_forward(self, img1, img2):
        """Reference model.py:630-842 forward, H-major. With a fully
        siamese-shared sep/res2 encoder (share_weight_levels == 4,
        myfusion's default config) the WHOLE model runs in the chain
        layout — the strided TransitionBlock downs become per-channel
        weighted stride-pools on the valid view, the Sep/Res2 dw convs
        run as diagonal banded dots. Other encoder configs keep the
        hybrid route (NHWC encoder, H-major fusion + decode)."""
        from ..ops.fusion import element_fusion
        from ..ops.pallas.hiw_kernel import hiw_enter, hiw_exit
        from ..ops.pallas.hiw_scale import (hiw_attention_fusion,
                                            hiw_conv, hiw_enter_c)

        interp = _hiw_interp()
        ch = self.num_ch
        n = img1.shape[0]
        enc = (self.encoder if not isinstance(self.encoder, str)
               else [self.encoder] * 4)
        full = (self.share_weight_levels == 4
                and all(e in ("sep", "res2") for e in enc))
        if full:
            hw = (img1.shape[1], img1.shape[2])
            t = hiw_enter(jnp.concatenate([img1, img2], axis=0))
            t = hiw_conv(t, self.conv_in_1(None, chain_hw=hw,
                                           chain_defer_in_ch=1),
                         1, *hw, interpret=interp)
            feats, hws, c_in = [], [], 8
            downs = (self.down1_1, self.down2_1, self.down3_1,
                     self.down4_1)
            ebs = (self.EB1_1, self.EB2_1, self.EB3_1, self.EB4_1)
            for down, eb, c_out in zip(downs, ebs, ch):
                t, hw = down(t, train=False, chain_hw=hw, hiw_c_in=c_in)
                t = eb(t, train=False, chain_hw=hw, hiw_c_in=c_out)
                feats.append(t)
                hws.append(hw)
                c_in = c_out
            fused = []
            for f, c, hw in zip(feats, ch, hws):
                if self.fusion_method == "elem":
                    fused.append(element_fusion(f[:n], f[n:],
                                                self.fusion_mode))
                else:
                    fused.append(hiw_attention_fusion(
                        f, n, c, *hw, mode=self.fusion_mode))
        else:
            feats1, feats2 = self.encoder_fn(img1, img2, False)
            hws = [(f.shape[1], f.shape[2]) for f in feats1]
            fused = []
            for f1, f2, c, hw in zip(feats1, feats2, ch, hws):
                t = hiw_enter_c(jnp.concatenate([f1, f2], axis=0))
                if self.fusion_method == "elem":
                    fused.append(element_fusion(t[:n], t[n:],
                                                self.fusion_mode))
                else:
                    fused.append(hiw_attention_fusion(
                        t, n, c, *hw, mode=self.fusion_mode))
        y = self.decode(fused, train=False, chain_hws=hws, hiw=True)
        out = hiw_conv(y, self.conv_out(None, chain_hw=hws[0],
                                        chain_defer_in_ch=ch[0]),
                       ch[0], *hws[0], interpret=interp)
        return hiw_exit(out, *hws[0])


MODEL_ZOO = {
    "deepfuse": DeepFuse,
    "densefuse": DenseFuse,
    "vifnet": VIFNet,
    "dbnet": DBNet,
    "sedrfuse": SEDRFuse,
    "nestfuse": NestFuse,
    "rfnnest": RFNNest,
    "unfusion": UNFusion,
    "res2fusion": Res2Fusion,
    "mafusion": MAFusion,
    "ifcnn": IFCNN,
    "difnet": DIFNet,
    "pmgi": PMGI,
    "pfnetv1": PFNetv1,
    "pfnetv2": PFNetv2,
    "myfusion": MyFusion,
}


def create_model(name, **kwargs):
    """Instantiate a zoo model by (case-insensitive) name."""
    key = name.lower()
    if key not in MODEL_ZOO:
        raise ValueError(
            f"unknown model {name!r}; available: {sorted(MODEL_ZOO)}")
    return MODEL_ZOO[key](**kwargs)
