"""Convert PyTorch reference checkpoints (core/model.py state_dicts) into
this framework's flax parameter trees, so models trained with the reference
can be served/evaluated here directly.

Input is a {torch_name: numpy array} dict (load a .pth with torch on the
host and pass `{k: v.numpy() for k, v in sd.items()}`, or use
tools/convert_torch_ckpt.py). Conversion rules:

- conv weight (O, I/g, kh, kw) -> HWIO (kh, kw, I/g, O)
- conv-transpose weight (I, O, kh, kw) -> our HWIO param (kh, kw, I, O);
  the ConvLayer flips spatially at apply time
- batch/group-norm weight/bias -> scale/bias; BN running stats ->
  batch_stats collection

All 16 zoo models are covered (the configurable MyFusion via
`convert_myfusion` / `convert_state_dict(..., **model_cfg)` with the
design-space kwargs the checkpoint was trained with); conversion fails
loudly if any torch key is left unconsumed (so drift in either
implementation is caught, backed by the exact param-count parity tests).
"""

import numpy as np

__all__ = ["convert_state_dict", "convert_myfusion"]


def _conv_w(w):
    return np.transpose(w, (2, 3, 1, 0))


def _deconv_w(w):
    return np.transpose(w, (2, 3, 0, 1))


class _Taker:
    def __init__(self, sd):
        self.sd = dict(sd)

    def take(self, key):
        if key not in self.sd:
            raise KeyError(f"missing torch key {key!r}")
        return self.sd.pop(key)

    def has(self, key):
        return key in self.sd

    def done(self):
        # BN's num_batches_tracked has no flax equivalent
        left = [k for k in self.sd if not k.endswith("num_batches_tracked")]
        if left:
            raise ValueError(f"unconsumed torch keys: {left}")


def _conv(t, key, transpose=False, stats=None, stats_path=None):
    """ConvLayer params from torch `<key>.layers.{0 conv,[1 norm]}`."""
    wkey = f"{key}.layers.0.weight"
    out = {"kernel": (_deconv_w if transpose else _conv_w)(t.take(wkey))}
    bkey = f"{key}.layers.0.bias"
    if t.has(bkey):
        out["bias"] = t.take(bkey)
    nw = f"{key}.layers.1.weight"
    if t.has(nw):
        out["norm"] = {"scale": t.take(nw),
                       "bias": t.take(f"{key}.layers.1.bias")}
        rm = f"{key}.layers.1.running_mean"
        if t.has(rm):  # batch norm: running stats -> batch_stats
            assert stats is not None and stats_path is not None
            d = stats
            for p in stats_path[:-1]:
                d = d.setdefault(p, {})
            d[stats_path[-1]] = {"norm": {
                "mean": t.take(rm),
                "var": t.take(f"{key}.layers.1.running_var"),
            }}
    return out


def _res_block(t, key, stats=None, path=None):
    """ResBlock: torch <key>.layers.{0,1} -> flax ConvLayer_{0,1}."""
    return {
        "ConvLayer_0": _conv(t, f"{key}.layers.0", stats=stats,
                             stats_path=(path or []) + ["ConvLayer_0"]),
        "ConvLayer_1": _conv(t, f"{key}.layers.1", stats=stats,
                             stats_path=(path or []) + ["ConvLayer_1"]),
    }


def _dense_block(t, key):
    return {f"conv{i}": _conv(t, f"{key}.layers.{i}") for i in range(3)}


def _conv_block(t, key):
    """ConvBlock / ECB / DCB: layers.{0,1} -> conv1/conv2."""
    return {"conv1": _conv(t, f"{key}.layers.0"),
            "conv2": _conv(t, f"{key}.layers.1")}


def _rfn(t, key):
    return {
        "res": _conv(t, f"{key}.res"),
        "conv1": _conv(t, f"{key}.conv1"),
        "conv2": _conv(t, f"{key}.conv2"),
        "fuse1": _conv(t, f"{key}.layers.0"),
        "fuse2": _conv(t, f"{key}.layers.1"),
        "fuse3": _conv(t, f"{key}.layers.2"),
    }


def _res2_block(t, key, scale):
    out = {
        "pwconv1": _conv(t, f"{key}.pwconv1"),
        "dwconv": _conv(t, f"{key}.dwconv"),       # dead params, kept
        "pwconv2": _conv(t, f"{key}.pwconv2"),
    }
    if t.has(f"{key}.shortcut.layers.0.weight"):
        out["shortcut"] = _conv(t, f"{key}.shortcut")
    for i in range(scale):
        out[f"dwconv{i}"] = _conv(t, f"{key}.dwconvs.{i}")
    return out


def _j(key, sub):
    """Join torch module path segments ('' prefix for standalone blocks)."""
    return f"{key}.{sub}" if key else sub


def _sep_block(t, key):
    """SepConvBlock: pwconv1/dwconv/pwconv2 (+shortcut, +attention pwconv),
    reference block.py:154-227."""
    out = {
        "pwconv1": _conv(t, _j(key, "pwconv1")),
        "dwconv": _conv(t, _j(key, "dwconv")),
        "pwconv2": _conv(t, _j(key, "pwconv2")),
    }
    if t.has(_j(key, "shortcut.layers.0.weight")):
        out["shortcut"] = _conv(t, _j(key, "shortcut"))
    if t.has(_j(key, "pwconv.layers.0.weight")):
        out["pwconv"] = _conv(t, _j(key, "pwconv"))
    return out


def _attention(t, key):
    """PVT SR-MHSA (reference block.py:355-434): q/k/v/proj 1x1 ConvLayers
    + the unconditionally-constructed stride pool."""
    out = {n: _conv(t, _j(key, n)) for n in ("q", "k", "v", "proj")}
    if t.has(_j(key, "pool.layers.0.weight")):
        out["pool"] = _conv(t, _j(key, "pool"))
    return out


def _ffn(t, key):
    """Conv-FFN (reference block.py:437-457): layers.{0,1,2} -> pw1/dw/pw2."""
    return {"pw1": _conv(t, _j(key, "layers.0")),
            "dw": _conv(t, _j(key, "layers.1")),
            "pw2": _conv(t, _j(key, "layers.2"))}


def _standalone_norm(t, key, stats=None, stats_path=None):
    """A bare norm module (MetaFormer norm1/norm2): torch LayerNorm
    (weight (C,1,1) [+bias]) or BatchNorm2d -> flax scale/bias
    (+batch_stats)."""
    out = {"scale": np.asarray(t.take(f"{key}.weight")).reshape(-1)}
    if t.has(f"{key}.bias"):
        out["bias"] = np.asarray(t.take(f"{key}.bias")).reshape(-1)
    rm = f"{key}.running_mean"
    if t.has(rm):
        assert stats is not None and stats_path is not None
        d = stats
        for p in stats_path[:-1]:
            d = d.setdefault(p, {})
        d[stats_path[-1]] = {"mean": t.take(rm),
                             "var": t.take(f"{key}.running_var")}
    return out


_FORMER_MIXERS = {
    "conv_former": ("sep", _sep_block),
    "mix_former": ("mix", lambda t, k: _res2_block(t, k, 4)),
    "res2_former": ("res2", lambda t, k: _res2_block(t, k, 4)),
    "transformer": ("attn", _attention),
    "metaformer": (None, None),
}


def convert_block(block_name, torch_sd):
    """Convert a standalone reference block's state_dict to flax variables.

    Supported: 'attention', 'sep', 'mix', 'res2', 'ffn', and the MetaFormer
    family ('metaformer' identity mixer, 'conv_former', 'mix_former',
    'res2_former', 'transformer'). Used by the block-parity tests and by
    MyFusion checkpoint conversion."""
    t = _Taker(torch_sd)
    stats = {}
    name = block_name.lower()
    if name == "attention":
        p = _attention(t, "")
    elif name == "sep":
        p = _sep_block(t, "")
    elif name == "ffn":
        p = _ffn(t, "")
    elif name in _FORMER_MIXERS:
        _, mixer_fn = _FORMER_MIXERS[name]
        p = {
            "norm1": _standalone_norm(t, "norm1", stats, ["norm1"]),
            "norm2": _standalone_norm(t, "norm2", stats, ["norm2"]),
            "ffn": _ffn(t, "ffn"),
        }
        if mixer_fn is not None:
            p["token_mixer"] = mixer_fn(t, "token_mixer")
        for s in ("layer_scale1", "res_scale1", "layer_scale2",
                  "res_scale2"):
            if t.has(f"{s}.scale"):
                p[s] = {"scale": t.take(f"{s}.scale")}
    else:
        raise ValueError(f"unsupported block {block_name!r}")
    t.done()
    out = {"params": p}
    if stats:
        out["batch_stats"] = stats
    return out


def _nest_decoder(t, key, block_fn):
    names = ["DB1_1", "DB2_1", "DB3_1", "DB1_2", "DB2_2", "DB1_3"]
    return {n: block_fn(t, f"{key}.{n}") for n in names}


def _transition(t, key):
    """TransitionBlock (reference block.py:620-664): maxpool mode has one
    pw ConvLayer at layers.1 (layers.0 MaxPool2d is parameterless); stride
    mode has dw at layers.0, pw at layers.1."""
    if t.has(f"{key}.layers.0.layers.0.weight"):
        return {"dw": _conv(t, f"{key}.layers.0"),
                "pw": _conv(t, f"{key}.layers.1")}
    return {"pw": _conv(t, f"{key}.layers.1")}


def _dc_block(t, key):
    """DCBlock pw->dw->pw (reference block.py:667-705)."""
    out = {"pw1": _conv(t, f"{key}.layers.0"),
           "dw": _conv(t, f"{key}.layers.1"),
           "pw2": _conv(t, f"{key}.layers.2")}
    if t.has(f"{key}.shortcut.layers.0.weight"):
        out["shortcut"] = _conv(t, f"{key}.shortcut")
    return out


def _former(t, key, mixer_fn, stats=None, path=None):
    """MetaFormer-family block at a nested key; the concrete Formers'
    BatchNorm norm1/norm2 running stats route into batch_stats."""
    path = path or []
    p = {
        "norm1": _standalone_norm(t, f"{key}.norm1", stats,
                                  path + ["norm1"]),
        "norm2": _standalone_norm(t, f"{key}.norm2", stats,
                                  path + ["norm2"]),
        "ffn": _ffn(t, f"{key}.ffn"),
    }
    if mixer_fn is not None:
        p["token_mixer"] = mixer_fn(t, f"{key}.token_mixer")
    for s in ("layer_scale1", "res_scale1", "layer_scale2", "res_scale2"):
        if t.has(f"{key}.{s}.scale"):
            p[s] = {"scale": t.take(f"{key}.{s}.scale")}
    return p


def _myfusion_encoder_fn(kind):
    if kind == "sep":
        return lambda t, k, stats, path: _sep_block(t, k)
    if kind in ("mix", "res2"):
        return lambda t, k, stats, path: _res2_block(t, k, 4)
    mixers = {"conv_former": _sep_block,
              "mix_former": lambda t2, k2: _res2_block(t2, k2, 4),
              "res2_former": lambda t2, k2: _res2_block(t2, k2, 4),
              "transformer": _attention}
    mixer = mixers[kind]
    return lambda t, k, stats, path: _former(t, k, mixer, stats, path)


def convert_myfusion(torch_sd, encoder="sep", decoder="nest",
                     fusion_method="attn", share_weight_levels=4):
    """Convert a reference MyFusion state_dict (model.py:630-842) for the
    given design-space configuration."""
    t = _Taker(torch_sd)
    stats = {}
    swl = share_weight_levels
    enc = [encoder] * 4 if isinstance(encoder, str) else list(encoder)
    enc_fns = [_myfusion_encoder_fn(e) for e in enc]

    def eb(i, branch):
        name = f"EB{i}_{branch}"
        return enc_fns[i - 1](t, name, stats, [name])

    p = {
        "conv_in_1": _conv(t, "conv_in_1"),
        "down1_1": _transition(t, "down1_1"),
        "down2_1": _transition(t, "down2_1"),
        "down3_1": _transition(t, "down3_1"),
        "down4_1": _transition(t, "down4_1"),
        "EB1_1": eb(1, 1),
        "EB2_1": eb(2, 1),
        "EB3_1": eb(3, 1),
        "EB4_1": eb(4, 1),
        "conv_out": _conv(t, "conv_out"),
    }
    if swl < 4:
        p["conv_in_2"] = _conv(t, "conv_in_2")
        p["down1_2"] = _transition(t, "down1_2")
        p["EB1_2"] = eb(1, 2)
    if swl < 3:
        p["down2_2"] = _transition(t, "down2_2")
        p["EB2_2"] = eb(2, 2)
    if swl < 2:
        p["down3_2"] = _transition(t, "down3_2")
        p["EB3_2"] = eb(3, 2)
    if swl < 1:
        p["down4_2"] = _transition(t, "down4_2")
        p["EB4_2"] = eb(4, 2)

    if fusion_method == "concat":
        for i in range(1, 5):
            p[f"fuse{i}"] = _conv(t, f"fuse{i}")
    elif fusion_method == "rfn":
        for i in range(1, 5):
            p[f"RFN{i}"] = _rfn(t, f"RFN{i}")

    if decoder == "nest":
        p["decode"] = _nest_decoder(t, "decode", _dc_block)
    else:   # 'plain' | 'ls' | 'fs' all use DB1..DB3
        p["decode"] = {f"DB{i}": _dc_block(t, f"decode.DB{i}")
                       for i in (1, 2, 3)}

    t.done()
    out = {"params": p}
    if stats:
        out["batch_stats"] = stats
    return out


def _seq(t, prefix, flax_names, **kw):
    return {fn: _conv(t, f"{prefix}.{i}", **kw)
            for i, fn in enumerate(flax_names)}


def convert_state_dict(model_name, torch_sd, **model_cfg):
    """Returns {"params": ..., [\"batch_stats\": ...]} for the zoo model.

    MyFusion checkpoints are config-dependent (reference model.py:630-842):
    pass the design-space kwargs the checkpoint was trained with
    (encoder/decoder/fusion_method/share_weight_levels), mirroring the
    train CLI's --model_cfg."""
    name = model_name.lower()
    if name == "myfusion":
        kw = {k: model_cfg[k] for k in ("encoder", "decoder",
                                        "fusion_method",
                                        "share_weight_levels")
              if k in model_cfg}
        return convert_myfusion(torch_sd, **kw)
    if model_cfg:
        raise ValueError(
            f"model_cfg kwargs only apply to 'myfusion', not {name!r}")
    t = _Taker(torch_sd)
    stats = {}

    if name == "deepfuse":
        p = {**_seq(t, "encode", ["enc0", "enc1"]),
             **_seq(t, "decode", ["dec0", "dec1", "dec2"])}

    elif name == "densefuse":
        p = {"conv_in": _conv(t, "encode.0"),
             "dense": _dense_block(t, "encode.1"),
             **_seq(t, "decode", ["dec0", "dec1", "dec2", "dec3"])}

    elif name == "vifnet":
        p = {"conv_in": _conv(t, "encode.0"),
             "dense": _dense_block(t, "encode.1"),
             **_seq(t, "decode", ["dec0", "dec1", "dec2", "dec3", "dec4"])}

    elif name == "dbnet":
        p = {"conv_in": _conv(t, "encode"),
             "detail0": _conv(t, "detail.0"),
             "detail1": _dense_block(t, "detail.1"),
             **_seq(t, "semantic", ["semantic0", "semantic1", "semantic2"]),
             **_seq(t, "decode", ["dec0", "dec1", "dec2", "dec3"])}

    elif name == "sedrfuse":
        p = {"enc0": _conv(t, "encode.0"),
             "enc1": _conv(t, "encode.1"),
             "enc2": _conv(t, "encode.2"),
             "res": _res_block(t, "encode.3"),
             "dec0": _conv(t, "decode.0", transpose=True),
             "dec1": _conv(t, "decode.1", transpose=True),
             "dec2": _conv(t, "decode.2")}

    elif name == "ifcnn":
        p = {"enc0": _conv(t, "encode.0"),
             "enc1": _conv(t, "encode.1", stats=stats,
                           stats_path=["enc1"]),
             "dec0": _conv(t, "decode.0", stats=stats,
                           stats_path=["dec0"]),
             "dec1": _conv(t, "decode.1")}

    elif name == "difnet":
        p = {"enc0": _conv(t, "encode.0"),
             "enc1": _res_block(t, "encode.1", stats, ["enc1"]),
             "enc2": _res_block(t, "encode.2", stats, ["enc2"]),
             "fuse": _conv(t, "fuse"),
             "dec0": _res_block(t, "decode.0", stats, ["dec0"]),
             "dec1": _res_block(t, "decode.1", stats, ["dec1"]),
             "dec2": _res_block(t, "decode.2", stats, ["dec2"]),
             "dec3": _conv(t, "decode.3")}

    elif name == "pfnetv1":
        p = {"conv_in_1": _conv(t, "encode1.0"),
             "dense_1": _dense_block(t, "encode1.1"),
             "conv_in_2": _conv(t, "encode2.0"),
             "dense_2": _dense_block(t, "encode2.1"),
             **_seq(t, "decode",
                    [f"decode{i}" for i in range(5)])}

    elif name == "pfnetv2":
        p = {"conv_in": _conv(t, "encode.0"),
             "dense": _dense_block(t, "encode.1"),
             **{f"fuse{i}": _conv(t, f"fuse.{i}") for i in range(3)},
             **_seq(t, "decode", [f"decode{i}" for i in range(4)])}

    elif name == "pmgi":
        p = {}
        for i in range(4):
            p[f"gradient{i}"] = _conv(t, f"gradient.{i}", stats=stats,
                                      stats_path=[f"gradient{i}"])
            p[f"intensity{i}"] = _conv(t, f"intensity.{i}", stats=stats,
                                       stats_path=[f"intensity{i}"])
        for i in range(2):
            p[f"transfer1_{i}"] = _conv(t, f"transfer1.{i}", stats=stats,
                                        stats_path=[f"transfer1_{i}"])
            p[f"transfer2_{i}"] = _conv(t, f"transfer2.{i}", stats=stats,
                                        stats_path=[f"transfer2_{i}"])
        p["decode"] = _conv(t, "decode")

    elif name == "res2fusion":
        p = {"conv_in": _conv(t, "conv_in"),
             "RB1": _res2_block(t, "RB1", 4),
             "RB2": _res2_block(t, "RB2", 8),
             **_seq(t, "decode", ["dec0", "dec1", "dec2", "dec3"])}

    elif name in ("nestfuse", "rfnnest", "mafusion"):
        p = {"conv_in": _conv(t, "conv_in"),
             "conv_out": _conv(t, "conv_out")}
        for i in range(1, 5):
            p[f"CB{i}_0"] = _conv_block(t, f"CB{i}_0")
        if name == "mafusion":
            p["decode"] = {n: _conv_block(t, f"decode.{n}")
                           for n in ["DB1", "DB2", "DB3"]}
        else:
            p["decode"] = _nest_decoder(t, "decode", _conv_block)
        if name == "rfnnest":
            for i in range(1, 5):
                p[f"RFN{i}"] = _rfn(t, f"RFN{i}")
        for i in (1, 2, 3):      # stride-mode downs, if present
            if t.has(f"down{i}.layers.0.weight"):
                p[f"down{i}"] = _conv(t, f"down{i}")

    elif name == "unfusion":
        p = {"conv_out": _conv(t, "conv_out")}
        for i in range(1, 5):
            p[f"CB{i}_0"] = _conv(t, f"CB{i}_0")
        for i in (1, 2, 3):
            if t.has(f"down{i}.layers.0.weight"):
                p[f"down{i}"] = _conv(t, f"down{i}")
        enc = {}
        for n in ["EB2_1", "EB3_1", "EB4_1", "EB3_2", "EB4_2", "EB4_3"]:
            enc[n] = _conv_block(t, f"encode.{n}")
        for i in (1, 2, 3):
            if t.has(f"encode.down{i}.layers.0.weight"):
                enc[f"down{i}"] = _conv(t, f"encode.down{i}")
        p["encode"] = enc
        p["decode"] = _nest_decoder(t, "decode", _conv_block)

    else:
        raise ValueError(f"no converter for model {model_name!r}")

    t.done()
    out = {"params": p}
    if stats:
        out["batch_stats"] = stats
    return out
