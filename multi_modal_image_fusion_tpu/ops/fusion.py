"""Training-free fusion strategies (reference core/fusion.py, NHWC re-design).

All eight strategies are pure jnp functions of NHWC feature maps; the string
dispatch is resolved at Python trace time (static under jit), so each model
compiles to a single fused XLA graph with no data-dependent control flow.

channel axis: -1 (torch ref uses dim=1 in NCHW).
"""

import jax
import jax.numpy as jnp

__all__ = [
    "element_fusion", "weighted_fusion", "concat_fusion", "attention_fusion",
    "spatial_fusion", "channel_fusion", "spatial_pooling", "channel_pooling",
]

eps = 1e-7


def _dot_prec(t):
    """Precision for the nl-attention einsums: exact multi-pass f32 when the
    features are f32 (parity/golden path), single-pass MXU dot for bf16
    inference (f32 accumulation via preferred_element_type either way). The
    f32-forced dot on bf16 inputs runs ~6x slower on the MXU and was the
    dominant cost of Res2Fusion at full resolution."""
    return "float32" if t.dtype == jnp.float32 else None


def _flash_nl_ready():
    """Use the VMEM-resident flash kernel (pallas/nl_kernel.py) for
    above-threshold 'nl' spatial attention. Default: on for TPU, off
    elsewhere; MMIF_FLASH_NL=0/1 overrides."""
    import os
    v = os.environ.get("MMIF_FLASH_NL", "auto")
    if v in ("0", "1"):
        return v == "1"
    return jax.default_backend() == "tpu"


def element_fusion(t1, t2, mode="sum"):
    """reference core/fusion.py:21-29"""
    if mode == "sum":
        return t1 + t2
    elif mode == "mean":
        return (t1 + t2) / 2.0
    elif mode == "max":
        return jnp.maximum(t1, t2)
    raise ValueError("only supported ['sum', 'mean', 'max'] mode")


def weighted_fusion(t1, t2, w1, w2):
    """reference core/fusion.py:32-35"""
    w = w1 / jnp.clip(w1 + w2, eps, None)
    return w * t1 + (1.0 - w) * t2


def concat_fusion(tensors, axis=-1):
    """reference core/fusion.py:38-39 (dim=1 in NCHW == -1 in NHWC)"""
    return jnp.concatenate(tensors, axis=axis)


def attention_fusion(t1, t2, mode="sca", spatial_mode="l1",
                     channel_mode="avg", caxis=-1, valid_hw=None):
    """reference core/fusion.py:42-59

    caxis: channel axis (-1 NHWC; 1 for guard-layout chain tensors).
    Chain-safe combinations: per-pixel spatial modes always (the attention
    map mirrors along with the tensor, so guard bands stay coherent);
    channel modes avg/max need `valid_hw` so the spatial reduction covers
    only the valid region. 'nl'/'nuclear' pooling stays NHWC-only."""
    if caxis != -1:
        # hard error (not assert): under `python -O` a silent fall-through
        # would unpack the NCHW chain tensor as NHWC and corrupt results
        if spatial_mode == "nl" or (
                mode != "sa" and (valid_hw is None
                                  or channel_mode not in ("avg", "max"))):
            raise ValueError(
                f"attention_fusion(mode={mode!r}, spatial_mode="
                f"{spatial_mode!r}, channel_mode={channel_mode!r}, "
                f"valid_hw={valid_hw}) is not chain-safe (caxis={caxis})")
    f_spatial = spatial_fusion(t1, t2, spatial_mode, softmax=False,
                               caxis=caxis)
    if mode == "sa":
        return f_spatial
    f_channel = channel_fusion(t1, t2, channel_mode, softmax=False,
                               caxis=caxis, valid_hw=valid_hw)

    if mode == "ca":
        return f_channel
    elif mode == "sca":
        return element_fusion(f_spatial, f_channel, "mean")
    elif mode == "wavg":
        return weighted_fusion(f_spatial, f_channel, f_spatial, f_channel)
    raise ValueError("only supported ['sa', 'ca', 'sca', 'wavg'] mode")


def spatial_fusion(t1, t2, mode="l1", softmax=True, caxis=-1):
    """reference core/fusion.py:62-70"""
    s1 = spatial_pooling(t1, mode, caxis=caxis)
    s2 = spatial_pooling(t2, mode, caxis=caxis)
    if softmax:
        s1 = jnp.exp(s1)
        s2 = jnp.exp(s2)
    return weighted_fusion(t1, t2, s1, s2)


def channel_fusion(t1, t2, mode="avg", softmax=True, caxis=-1,
                   valid_hw=None):
    """reference core/fusion.py:73-81"""
    c1 = channel_pooling(t1, mode, caxis=caxis, valid_hw=valid_hw)
    c2 = channel_pooling(t2, mode, caxis=caxis, valid_hw=valid_hw)
    if softmax:
        c1 = jnp.exp(c1)
        c2 = jnp.exp(c2)
    return weighted_fusion(t1, t2, c1, c2)


def _avg_pool8(x):
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 8, 8, 1), (1, 8, 8, 1),
                              "VALID")
    return s / 64.0


def spatial_pooling(t, mode="l1", caxis=-1):
    """Per-pixel channel pooling -> (N,H,W,1) map, or the 'nl' non-local
    spatial attention (reference core/fusion.py:84-117). caxis selects the
    channel axis (NHWC -1 / chain-layout 1) for the per-pixel modes."""
    if mode == "sum":
        return t.sum(axis=caxis, keepdims=True)
    elif mode == "mean":
        return t.mean(axis=caxis, keepdims=True)
    elif mode == "l1":
        return jnp.abs(t).sum(axis=caxis, keepdims=True)
    elif mode == "l2":
        return jnp.sqrt(jnp.sum(t * t, axis=caxis, keepdims=True))
    elif mode == "linf":
        return t.max(axis=caxis, keepdims=True)
    # 'nl' mixes across spatial positions: NHWC only
    if caxis != -1:
        raise ValueError(f"mode {mode!r} is not channel-axis-agnostic "
                         f"(caxis={caxis})")

    if mode == "nl":
        # q: [B,HW,C] x k: [B,HW/64,C] -> energy [B,HW,HW/64]; min-max
        # normalized, softmaxed, applied to pooled v. At full resolution the
        # dense energy matrix is enormous (1224x1024 -> ~98GB, which the
        # torch reference cannot materialize either, fusion.py:97-113); we
        # stream query blocks in two scanned passes (global min/max, then
        # softmax @ v), so full-res inference works in a few hundred MB.
        b, h, w, c = t.shape
        pooled = _avg_pool8(t)
        q = t.reshape(b, h * w, c)
        k = pooled.reshape(b, -1, c)
        prec = _dot_prec(t)
        if h * w <= (1 << 18):
            energy = jnp.einsum("bnc,bmc->bnm", q, k, precision=prec,
                                preferred_element_type=jnp.float32)
            e_min = energy.min()
            e_max = energy.max()
            energy = (energy - e_min) / (e_max - e_min)
            attn_w = jax.nn.softmax(energy, axis=-1)
            attn = jnp.einsum("bnm,bmc->bnc", attn_w.astype(k.dtype), k,
                              precision=prec,
                              preferred_element_type=jnp.float32)
        elif _flash_nl_ready():
            attn = _nl_spatial_flash_diff(q, k)
        else:
            attn = _nl_spatial_blocked(q, k)
        return attn.astype(t.dtype).reshape(b, h, w, c) + t

    raise ValueError(
        "only supported ['sum', 'mean', 'l1', 'l2', 'linf', 'nl'] mode")


def _nl_spatial_blocked(q, k, block=4096):
    """Streaming non-local spatial attention: identical math to the dense
    path (global min-max normalize, row softmax, @ pooled values) computed
    block-by-block over queries with lax.scan. Two passes because the
    normalization needs the global energy min/max before any softmax."""
    b, n, c = q.shape
    prec = _dot_prec(q)
    pad = (-n) % block
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    blocks = qp.reshape(b, -1, block, c).transpose(1, 0, 2, 3)

    def emin_emax(carry, q_blk):
        lo, hi = carry
        e = jnp.einsum("bnc,bmc->bnm", q_blk, k, precision=prec,
                       preferred_element_type=jnp.float32)
        return (jnp.minimum(lo, e.min()), jnp.maximum(hi, e.max())), None

    # padded rows produce energies of all-zero queries; exclude them from
    # the min/max by scanning only full blocks, then the remainder exactly
    n_full = n // block
    (lo, hi), _ = jax.lax.scan(emin_emax, (jnp.inf, -jnp.inf),
                               blocks[:n_full])
    if n % block:
        e_tail = jnp.einsum("bnc,bmc->bnm", q[:, n_full * block:], k,
                            precision=prec,
                            preferred_element_type=jnp.float32)
        lo = jnp.minimum(lo, e_tail.min())
        hi = jnp.maximum(hi, e_tail.max())

    def apply_blk(_, q_blk):
        e = jnp.einsum("bnc,bmc->bnm", q_blk, k, precision=prec,
                       preferred_element_type=jnp.float32)
        e = (e - lo) / (hi - lo)
        a = jax.nn.softmax(e, axis=-1)
        o = jnp.einsum("bnm,bmc->bnc", a.astype(k.dtype), k, precision=prec,
                       preferred_element_type=jnp.float32)
        return None, o

    _, outs = jax.lax.scan(apply_blk, None, blocks)
    out = outs.transpose(1, 0, 2, 3).reshape(b, -1, c)
    return out[:, :n]


@jax.custom_vjp
def _nl_spatial_flash_diff(q, k):
    """Flash kernel forward with a blocked-XLA-path backward: the Pallas
    kernel has no VJP, so gradients recompute through
    `_nl_spatial_blocked` (differentiable scan) — identical math, same
    memory behavior under grad as before the kernel existed."""
    from .pallas.nl_kernel import nl_spatial_flash
    return nl_spatial_flash(q, k)


def _nl_flash_fwd(q, k):
    return _nl_spatial_flash_diff(q, k), (q, k)


def _nl_flash_bwd(res, g):
    q, k = res
    _, vjp = jax.vjp(_nl_spatial_blocked, q, k)
    dq, dk = vjp(g.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype)


_nl_spatial_flash_diff.defvjp(_nl_flash_fwd, _nl_flash_bwd)


def channel_pooling(t, mode="avg", caxis=-1, valid_hw=None):
    """Per-channel spatial pooling -> (N,1,1,C) vector, or the 'nuclear' /
    'nl' attention variants (reference core/fusion.py:120-153).

    caxis=1 (guard-layout chain tensors): avg/max reduce over the VALID
    region only (`valid_hw` required — guard bands hold mirrored/stale
    pixels that must not enter global statistics)."""
    if caxis == 1:
        if mode not in ("avg", "max") or valid_hw is None:
            raise ValueError(
                f"channel_pooling(mode={mode!r}, valid_hw={valid_hw}) is "
                "not chain-safe (caxis=1)")
        from .pallas.chain_ops import chain_valid
        v = chain_valid(t, *valid_hw)
        if mode == "avg":
            return v.mean(axis=(2, 3), keepdims=True)
        return v.max(axis=(2, 3), keepdims=True)
    b, h, w, c = t.shape

    if mode == "avg":
        return t.mean(axis=(1, 2), keepdims=True)
    elif mode == "max":
        return t.max(axis=(1, 2), keepdims=True)

    elif mode == "nuclear":
        # Per-channel nuclear norm (sum of singular values) of the first
        # batch element (fusion.py:128-135 loops a per-channel torch.svd;
        # here: one batched SVD over the channel dim).
        mats = jnp.clip(t[0], eps, None)          # (H,W,C)
        mats = jnp.moveaxis(mats, -1, 0)          # (C,H,W)
        s = jnp.linalg.svd(mats, compute_uv=False)  # (C,min(H,W))
        vec = s.sum(axis=-1)
        return vec.reshape(1, 1, 1, c)

    elif mode == "nl":
        # Gram-matrix channel attention: energy [B,C,C]
        prec = _dot_prec(t)
        q = jnp.moveaxis(t, -1, 1).reshape(b, c, h * w)
        energy = jnp.einsum("bcn,bdn->bcd", q, q, precision=prec,
                            preferred_element_type=jnp.float32)
        e_min = energy.min()
        e_max = energy.max()
        energy = (energy - e_min) / (e_max - e_min)
        attn_w = jax.nn.softmax(energy, axis=-1)
        attn = jnp.einsum("bcd,bdn->bcn", attn_w.astype(q.dtype), q,
                          precision=prec,
                          preferred_element_type=jnp.float32)
        attn = jnp.moveaxis(attn.reshape(b, c, h, w), 1, -1)
        return attn.astype(t.dtype) + t

    raise ValueError("only supported ['avg', 'max', 'nuclear', 'nl'] mode")
