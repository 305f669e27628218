"""Generate golden parity fixtures by RUNNING the PyTorch reference
(/root/reference) and recording inputs/outputs as .npz files under
tests/golden/. Dev-time tool only: tests consume the fixtures and never
import torch or the reference.

Usage: python tools/gen_golden.py
"""

import os
import sys

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

sys.path.insert(0, REF)

import torch  # noqa: E402

torch.manual_seed(0)
os.makedirs(OUT, exist_ok=True)


def t2n(t):
    return t.detach().cpu().numpy()


def save(name, **arrays):
    path = os.path.join(OUT, name + ".npz")
    np.savez_compressed(path, **arrays)
    print("wrote", path, "::", ", ".join(sorted(arrays)))


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def gen_losses():
    from core.loss import (GradLoss, NormLoss, PixelLoss, SSIMLoss, TVLoss,
                           calc_msssim, calc_ssim)

    g = torch.Generator().manual_seed(0)
    x1 = torch.rand(2, 1, 256, 256, generator=g)
    x2 = torch.rand(2, 1, 256, 256, generator=g)
    y = torch.rand(2, 1, 256, 256, generator=g)

    out = {"x1": t2n(x1), "x2": t2n(x2), "y": t2n(y)}

    for mode in ["ssim", "w-ssim", "ms-ssim", "msw-ssim"]:
        out[f"ssimloss_{mode}"] = t2n(SSIMLoss(mode, weight=1.0)(x1, x2, y))
    for mode in ["l1", "l2"]:
        for m in ["avg", "max"]:
            out[f"pixel_{mode}_{m}"] = t2n(
                PixelLoss(mode, weight=1.0)(x1, x2, y, mode=m))
            out[f"grad_{mode}_{m}"] = t2n(
                GradLoss(mode, weight=1.0)(x1, x2, y, mode=m))
        out[f"tv_{mode}"] = t2n(TVLoss(mode, weight=1.0)(y - x1))
        out[f"norm_{mode}"] = t2n(NormLoss(mode, weight=1.0)(y - x1))

    d = calc_ssim(x1, y, data_range=1.0)
    out["ssim_vec"] = t2n(d["ssim"])
    out["cs_vec"] = t2n(d["cs"])
    out["sigma_vec"] = t2n(d["sigma"])
    d = calc_ssim(x1, y, data_range=1.0, use_padding=True,
                  size_average=False)
    out["ssim_map"] = t2n(d["ssim"])
    out["msssim_vec"] = t2n(calc_msssim(x1, y, data_range=1.0))
    save("losses", **out)


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def gen_metrics():
    from core import metric as M

    g = torch.Generator().manual_seed(0)
    x1 = torch.rand(1, 1, 256, 256, generator=g) * 255.0
    x2 = torch.rand(1, 1, 256, 256, generator=g) * 255.0
    y = torch.rand(1, 1, 256, 256, generator=g) * 255.0
    # quantized variants (like real dumped images) for histogram metrics
    x1q, x2q, yq = [t.round() for t in (x1, x2, y)]

    out = {"x1": t2n(x1), "x2": t2n(x2), "y": t2n(y)}
    out["mean"] = t2n(M.calc_mean(y))
    out["std"] = t2n(M.calc_std(y))
    out["ag"] = t2n(M.calc_ag(y))
    out["sf"] = t2n(M.calc_sf(y))
    mse = M.calc_mse(x1, y)
    out["mse"] = t2n(mse)
    out["psnr"] = t2n(M.calc_psnr(mse))
    out["psnr_root"] = t2n(M.calc_psnr(mse, root=True))
    out["cc"] = t2n(M.calc_cc(x1, y))
    out["scd"] = t2n(M.calc_scd(x1, x2, y))
    out["entropy"] = t2n(M.calc_entropy(x1q))
    out["cross_ent"] = t2n(M.calc_cross_ent(x1q, yq))
    out["joint_ent"] = t2n(M.calc_joint_ent(x1q, yq))
    out["mi"] = t2n(M.calc_mul_info(x1q, yq))
    out["mi_norm"] = t2n(M.calc_mul_info(x1q, yq, normalized=True))
    out["qabf"] = t2n(M.calc_Qabf(x1, x2, y, L=1.5))
    q, n, l = M.calc_Qabf(x1, x2, y, L=1.5, full=True)
    out["qabf_full"] = np.array([t2n(q), t2n(n), t2n(l)])
    out["nabf_mod"] = t2n(M.calc_Nabf(x1, x2, y, modified=True))
    out["nabf_orig"] = t2n(M.calc_Nabf(x1, x2, y, modified=False))
    out["labf"] = t2n(M.calc_Labf(x1, x2, y))
    out["ssim_255"] = t2n(M.calc_ssim(x1, y))
    out["ssim_1"] = t2n(M.calc_ssim(x1 / 255.0, y / 255.0, data_range=1.0))
    s, c = M.calc_ssim(x1, y, full=True)
    out["ssim_cs"] = np.array([t2n(s), t2n(c)])
    out["msssim"] = t2n(M.calc_msssim(x1, y))
    out["viff_simple"] = t2n(M.calc_viff(x1, x2, y, simple=True))
    out["viff_weighted"] = t2n(M.calc_viff(x1, x2, y, simple=False))
    save("metrics", **out)


# ---------------------------------------------------------------------------
# fusion strategies
# ---------------------------------------------------------------------------

def gen_fusion():
    from core import fusion as F

    g = torch.Generator().manual_seed(0)
    t1 = torch.rand(2, 8, 32, 32, generator=g)
    t2 = torch.rand(2, 8, 32, 32, generator=g)

    out = {"t1": t2n(t1), "t2": t2n(t2)}
    for m in ["sum", "mean", "max"]:
        out[f"elem_{m}"] = t2n(F.element_fusion(t1, t2, m))
    out["weighted"] = t2n(
        F.weighted_fusion(t1, t2, t1.mean(), t2.mean()))
    for m in ["sa", "ca", "sca", "wavg"]:
        out[f"attn_{m}"] = t2n(F.attention_fusion(t1, t2, m))
    for m in ["sum", "mean", "l1", "l2", "linf", "nl"]:
        out[f"spool_{m}"] = t2n(F.spatial_pooling(t1, m))
    for m in ["avg", "max", "nuclear", "nl"]:
        out[f"cpool_{m}"] = t2n(F.channel_pooling(t1, m))
    out["attn_nl"] = t2n(
        F.attention_fusion(t1, t2, "sca", spatial_mode="nl",
                           channel_mode="nl"))
    save("fusion", **out)


# ---------------------------------------------------------------------------
# layers: ConvLayer variants with exported weights
# ---------------------------------------------------------------------------

def gen_layers():
    import torch.nn as nn

    from core.block import ConvLayer, Downsample, Upsample

    g = torch.Generator().manual_seed(0)
    x = torch.rand(2, 8, 21, 27, generator=g)  # odd spatial dims

    cases = {
        "k3": dict(ksize=3),
        "k5": dict(ksize=5),
        "k7": dict(ksize=7),
        "k1_pad0": dict(ksize=1),
        "stride2": dict(ksize=3, stride=2),
        "dw": dict(ksize=3, groups=8),
        "lrelu": dict(act=nn.LeakyReLU),
        "tanh": dict(act=nn.Tanh),
        "noact": dict(act=None),
        "gn": dict(norm=nn.GroupNorm),
        "bn": dict(norm=nn.BatchNorm2d),
    }
    out = {"x": t2n(x)}
    for name, kw in cases.items():
        torch.manual_seed(1)
        layer = ConvLayer(8, 16, **kw).eval()
        sd = {k: t2n(v) for k, v in layer.state_dict().items()}
        with torch.no_grad():
            y = layer(x)
        out[f"{name}__out"] = t2n(y)
        for k, v in sd.items():
            out[f"{name}__sd__{k}"] = v

    # transpose conv (SEDRFuse decoder)
    torch.manual_seed(1)
    layer = ConvLayer(8, 4, stride=2, layer=nn.ConvTranspose2d).eval()
    with torch.no_grad():
        y = layer(x)
    out["deconv__out"] = t2n(y)
    for k, v in layer.state_dict().items():
        out[f"deconv__sd__{k}"] = t2n(v)

    # shape-repair resamples on odd sizes
    shape = (2, 8, 21, 27)
    down = Downsample(2, 2)
    up = Upsample("bilinear", 2)
    upn = Upsample("nearest", 2)
    small = torch.rand(2, 8, 10, 13, generator=g)
    out["down_pad__out"] = t2n(down(x, shape))
    out["up_bilinear__out"] = t2n(up(small, shape))
    out["up_nearest__out"] = t2n(upn(small, shape))
    out["small"] = t2n(small)
    save("layers", **out)


if __name__ == "__main__":
    gen_losses()
    gen_metrics()
    gen_fusion()
    gen_layers()


# ---------------------------------------------------------------------------
# full-model forward parity (DeepFuse, DenseFuse with exported weights)
# ---------------------------------------------------------------------------

def gen_models():
    from core.model import DeepFuse, DenseFuse

    g = torch.Generator().manual_seed(0)
    x1 = torch.rand(2, 1, 96, 80, generator=g)
    x2 = torch.rand(2, 1, 96, 80, generator=g)

    for name, cls in [("deepfuse", DeepFuse), ("densefuse", DenseFuse)]:
        torch.manual_seed(3)
        model = cls().eval()
        with torch.no_grad():
            y = model(x1, x2)
            y_ae = model(x1)
        out = {"x1": t2n(x1), "x2": t2n(x2), "y": t2n(y), "y_ae": t2n(y_ae)}
        for k, v in model.state_dict().items():
            out[f"sd__{k}"] = t2n(v)
        save(f"model_{name}", **out)


if __name__ == "__main__" and os.environ.get("GOLDEN_MODELS"):
    gen_models()


def gen_sedrfuse():
    from core.model import SEDRFuse

    g = torch.Generator().manual_seed(0)
    x1 = torch.rand(1, 1, 64, 48, generator=g)
    x2 = torch.rand(1, 1, 64, 48, generator=g)
    torch.manual_seed(5)
    model = SEDRFuse().eval()
    with torch.no_grad():
        y = model(x1, x2)
        y_ae = model(x1)
    out = {"x1": t2n(x1), "x2": t2n(x2), "y": t2n(y), "y_ae": t2n(y_ae)}
    for kk, v in model.state_dict().items():
        out[f"sd__{kk}"] = t2n(v)
    save("model_sedrfuse", **out)


if __name__ == "__main__" and os.environ.get("GOLDEN_SEDR"):
    gen_sedrfuse()


def gen_sd_shapes():
    """Shape-only state_dict manifests for every classic model: enough to
    validate checkpoint conversion structurally without shipping weights."""
    import json

    from core.model import (DBNet, DeepFuse, DenseFuse, DIFNet, IFCNN,
                            MAFusion, NestFuse, PFNetv1, PFNetv2, PMGI,
                            Res2Fusion, RFNNest, SEDRFuse, UNFusion, VIFNet)

    models = dict(deepfuse=DeepFuse, densefuse=DenseFuse, vifnet=VIFNet,
                  dbnet=DBNet, sedrfuse=SEDRFuse, nestfuse=NestFuse,
                  rfnnest=RFNNest, unfusion=UNFusion,
                  res2fusion=Res2Fusion, mafusion=MAFusion, ifcnn=IFCNN,
                  difnet=DIFNet, pmgi=PMGI, pfnetv1=PFNetv1,
                  pfnetv2=PFNetv2)
    out = {}
    for name, cls in models.items():
        sd = cls().state_dict()
        out[name] = {k: list(v.shape) for k, v in sd.items()}
    with open(os.path.join(OUT, "sd_shapes.json"), "w") as f:
        json.dump(out, f)
    print("wrote sd_shapes.json:", {k: len(v) for k, v in out.items()})


if __name__ == "__main__" and os.environ.get("GOLDEN_SHAPES"):
    gen_sd_shapes()


def gen_edge_cases():
    from core.loss import calc_ssim as loss_ssim
    from core.metric import calc_msssim as metric_msssim
    from core.metric import calc_ssim as metric_ssim

    g = torch.Generator().manual_seed(0)
    out = {}
    # tiny images: window shrinks to min(win, h, w); loss sigma becomes
    # 0.15*(ws-1), metric sigma stays 1.5
    for h, w in [(8, 8), (9, 15), (16, 300)]:
        x1 = torch.rand(1, 1, h, w, generator=g)
        x2 = torch.rand(1, 1, h, w, generator=g)
        key = f"{h}x{w}"
        out[f"x1_{key}"] = t2n(x1)
        out[f"x2_{key}"] = t2n(x2)
        d = loss_ssim(x1, x2, data_range=1.0)
        out[f"loss_ssim_{key}"] = t2n(d["ssim"])
        out[f"metric_ssim_{key}"] = t2n(
            metric_ssim(x1 * 255, x2 * 255))
    # large msssim at a 176-boundary size (min for 5 levels of win 11)
    x1 = torch.rand(1, 1, 176, 180, generator=g)
    x2 = torch.rand(1, 1, 176, 180, generator=g)
    out["x1_176x180"] = t2n(x1)
    out["x2_176x180"] = t2n(x2)
    out["metric_msssim_176x180"] = t2n(
        metric_msssim(x1 * 255, x2 * 255))
    save("edge_cases", **out)


if __name__ == "__main__" and os.environ.get("GOLDEN_EDGE"):
    gen_edge_cases()


def gen_model_forward():
    """Forward-parity fixtures for the 15 fixed zoo models (VERDICT.md item
    3): synthetic deterministic weights (tests/param_synth.py) loaded into
    the reference models, outputs recorded in fusion + AE modes at 64x64
    and at an odd 45x61 size (exercising the shape-safe resample paths,
    reference block.py:941-991). MyFusion is covered separately
    (GOLDEN_MYFUSION)."""
    import json

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from param_synth import synth_value

    from core import model as RM

    names = ["PFNetv1", "PFNetv2", "DeepFuse", "DenseFuse", "VIFNet",
             "DBNet", "SEDRFuse", "NestFuse", "RFNNest", "UNFusion",
             "Res2Fusion", "MAFusion", "IFCNN", "DIFNet", "PMGI"]
    r = np.random.RandomState(1234)
    x1 = torch.tensor(r.rand(2, 1, 64, 64), dtype=torch.float32)
    x2 = torch.tensor(r.rand(2, 1, 64, 64), dtype=torch.float32)
    x1o = torch.tensor(r.rand(1, 1, 45, 61), dtype=torch.float32)
    x2o = torch.tensor(r.rand(1, 1, 45, 61), dtype=torch.float32)

    for name in names:
        m = getattr(RM, name)().eval()
        sd = m.state_dict()
        synth = {k: torch.tensor(synth_value(k, tuple(v.shape)))
                 for k, v in sd.items()}
        m.load_state_dict(synth)
        out = {
            "x1": t2n(x1), "x2": t2n(x2), "x1o": t2n(x1o), "x2o": t2n(x2o),
            "keyshapes": np.frombuffer(json.dumps(
                {k: list(v.shape) for k, v in sd.items()}).encode(),
                dtype=np.uint8),
        }
        with torch.no_grad():
            out["y"] = t2n(m(x1, x2))
            try:
                out["y_odd"] = t2n(m(x1o, x2o))
            except RuntimeError:
                pass   # the reference itself rejects odd sizes here
                       # (e.g. SEDRFuse: stride-2 down + transpose-up skip
                       # shapes mismatch at 45x61)
            try:
                out["y_ae"] = t2n(m(x1))
            except TypeError:
                pass   # PFNetv1/PMGI require both inputs
            except RuntimeError:
                pass   # concat-fusion decoders (VIFNet...) cannot run AE
        save(f"model_fwd_{name.lower()}", **out)


if __name__ == "__main__" and os.environ.get("GOLDEN_FWD"):
    gen_model_forward()


def gen_blocks():
    """Block-level forward-parity fixtures for Attention + the MetaFormer
    family (VERDICT.md round-2 weak item 3: these numerics were never
    compared to torch). Synthetic deterministic weights via
    tests/param_synth; stored: input, output, key->shape table."""
    import json

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from param_synth import synth_value

    from core import block as RB

    r = np.random.RandomState(77)

    def x(b, c, h, w):
        return torch.tensor(r.rand(b, c, h, w), dtype=torch.float32)

    cases = {
        # in_ch 32 -> heads 2, sr 8 (stride pool); 64 -> heads 4, sr 4;
        # 256 -> sr 1 (pool constructed but bypassed, block.py:422)
        "attn32": (lambda: RB.Attention(32, 32), x(2, 32, 24, 24)),
        "attn64_bias": (lambda: RB.Attention(64, 64, qkv_bias=True,
                                             proj_bias=True),
                        x(2, 64, 16, 16)),
        "attn256_sr1": (lambda: RB.Attention(256, 256), x(1, 256, 8, 8)),
        "attn32_avgpool": (lambda: RB.Attention(32, 32,
                                                down_mode='avgpool'),
                           x(2, 32, 24, 24)),
        "conv_former": (lambda: RB.ConvFormerBlock(32, 32),
                        x(2, 32, 24, 24)),
        "mix_former": (lambda: RB.MixFormerBlock(32, 32), x(2, 32, 24, 24)),
        "res2_former": (lambda: RB.Res2FormerBlock(32, 32),
                        x(2, 32, 24, 24)),
        "transformer": (lambda: RB.TransformerBlock(32, 32),
                        x(2, 32, 24, 24)),
        # default MetaFormer skeleton: identity mixer, channel LayerNorm,
        # learned layer/res scales
        "metaformer_scales": (lambda: RB.MetaFormerBlock(32, 32,
                                                         layer_scale=0.5,
                                                         res_scale=2.0),
                              x(2, 32, 24, 24)),
    }

    for name, (ctor, xin) in cases.items():
        m = ctor().eval()
        sd = m.state_dict()
        synth = {k: torch.tensor(synth_value(k, tuple(v.shape)))
                 for k, v in sd.items()}
        m.load_state_dict(synth)
        with torch.no_grad():
            y = m(xin)
        save(f"block_{name}", x=t2n(xin), y=t2n(y),
             keyshapes=np.frombuffer(json.dumps(
                 {k: list(v.shape) for k, v in sd.items()}).encode(),
                 dtype=np.uint8))


if __name__ == "__main__" and os.environ.get("GOLDEN_BLOCKS"):
    gen_blocks()


MYFUSION_CONFIGS = {
    # name: (reference ctor kwargs builder, our create_model kwargs)
    "default": ({}, {}),
    "transformer_fs_elem": (
        dict(encoder="TransformerBlock", decoder="FSDecoder",
             fusion_method="elem", fusion_mode="sum"),
        dict(encoder="transformer", decoder="fs",
             fusion_method="elem", fusion_mode="sum")),
    "mixformer_ls_concat": (
        dict(encoder="MixFormerBlock", decoder="LSDecoder",
             fusion_method="concat", up_mode="nearest",
             share_weight_levels=2),
        dict(encoder="mix_former", decoder="ls", fusion_method="concat",
             up_mode="nearest", share_weight_levels=2)),
    "res2_plain_rfn": (
        dict(encoder="Res2ConvBlock", decoder="Decoder",
             fusion_method="rfn", down_mode="maxpool",
             share_weight_levels=0),
        dict(encoder="res2", decoder="plain", fusion_method="rfn",
             down_mode="maxpool", share_weight_levels=0)),
}


def gen_myfusion():
    """Forward-parity fixtures across the MyFusion design space
    (reference model.py:630-842): all 4 decoders, all 4 fusion methods,
    raw conv blocks + Formers + Attention encoders, both down/up modes,
    share_weight_levels in {4, 2, 0}."""
    import json

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from param_synth import synth_value

    from core import block as RB
    from core.model import MyFusion

    r = np.random.RandomState(555)
    x1 = torch.tensor(r.rand(2, 1, 64, 64), dtype=torch.float32)
    x2 = torch.tensor(r.rand(2, 1, 64, 64), dtype=torch.float32)
    x1o = torch.tensor(r.rand(1, 1, 52, 44), dtype=torch.float32)
    x2o = torch.tensor(r.rand(1, 1, 52, 44), dtype=torch.float32)

    for name, (ref_kw, _our_kw) in MYFUSION_CONFIGS.items():
        kw = dict(ref_kw)
        if "encoder" in kw:
            kw["encoder"] = getattr(RB, kw["encoder"])
        if "decoder" in kw:
            kw["decoder"] = getattr(RB, kw["decoder"])
        m = MyFusion(**kw).eval()
        sd = m.state_dict()
        synth = {k: torch.tensor(synth_value(k, tuple(v.shape)))
                 for k, v in sd.items()}
        m.load_state_dict(synth)
        out = {
            "x1": t2n(x1), "x2": t2n(x2), "x1o": t2n(x1o), "x2o": t2n(x2o),
            "keyshapes": np.frombuffer(json.dumps(
                {k: list(v.shape) for k, v in sd.items()}).encode(),
                dtype=np.uint8),
        }
        with torch.no_grad():
            out["y"] = t2n(m(x1, x2))
            try:
                out["y_odd"] = t2n(m(x1o, x2o))
            except RuntimeError:
                pass
        save(f"model_fwd_myfusion_{name}", **out)


if __name__ == "__main__" and os.environ.get("GOLDEN_MYFUSION"):
    gen_myfusion()
