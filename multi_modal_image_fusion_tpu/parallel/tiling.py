"""Single-chip height tiling: trade recompute for activation memory.

The spatial sharding module (parallel/spatial.py) splits one pair's
height over N CHIPS. This module applies the same receptive-field-halo
argument on ONE chip: run the forward as a sequential loop over height
slabs, keeping only one slab's activations live at a time. Peak
activation HBM drops ~n_tiles-fold (the conv stack's full-res feature
maps dominate; the input pair itself stays resident), at the price of
recomputing 2R overlap rows per interior slab.

The reference has no equivalent — its answer to memory pressure is
cropping to 256 (reference train.py:192-201) or a smaller batch. Here a
pair whose activations exceed HBM still fuses exactly: slab outputs are
numerically IDENTICAL to the whole-image forward (tests/test_tiling.py).

Two regimes:

1. **Whole-model slabs** (stride-1, per-pixel-local-fusion models — the
   SPATIAL_ELIGIBLE set): run the unmodified forward per slab and
   discard the halo rows, exactly like spatial.py but sequentially.

2. **Two-phase slabs** (multi-scale and/or global-fusion models —
   reference core/model.py:319-508 NestFuse/RFNNest/UNFusion/MAFusion,
   Res2Fusion): their fusion reduces over the full spatial extent
   (global channel pooling in 'sca'/'wavg' attention, non-local 'nl'
   attention — reference core/fusion.py:62-150), so whole-model slabs
   would fuse per-slab statistics and drift. Instead:

     a. *tiled encode*: the encoder (conv + pool/stride transitions,
        shift-covariant at stride-aligned slab boundaries) runs per
        slab; the per-scale feature pyramids ARE materialized in HBM —
        they are small next to the decoder's concat working set
        (reference core/block.py:836-938, the 10-30 GB tail).
     b. *global fusion*: the model's own fusion method runs on the full
        pyramids — global statistics exact by construction.
     c. *tiled decode*: the decoder runs per slab on halo-padded slices
        of the fused pyramids. Bilinear align_corners upsampling weights
        depend on ABSOLUTE row position and FULL image height
        (reference core/block.py:965-973), so slabs alone would drift;
        ops/layers.py `tile_rows_ctx` threads the full geometry into
        `interpolate`, restoring bit-equality with the whole-image
        forward.

   Slab boundaries and halos are multiples of 8 full-res rows so every
   pool window / strided conv / x8-upsample at every scale (1,2,4,8)
   stays aligned; halos are per-model receptive-field bounds validated
   by the exactness tests.
"""

import jax
import jax.numpy as jnp

from ..ops.layers import tile_rows_ctx
from .spatial import check_spatial_eligible, receptive_halo

__all__ = ["tiled_forward", "receptive_halo", "TILED_MULTISCALE"]

# model name (lowercase class name) -> (encode_halo, decode_halo) in
# full-resolution rows. Receptive-field upper bounds: sum over the worst
# conv path of (kh // 2) * scale, plus `scale_in` per bilinear upsample
# tap, rounded up to a multiple of 8 (alignment). Validated end-to-end
# by tests/test_tiling.py exactness asserts.
TILED_MULTISCALE = {
    "nestfuse": (16, 16),
    "rfnnest": (16, 16),
    "mafusion": (16, 24),
    "unfusion": (48, 48),
    "res2fusion": (16, 8),
}


def tiled_forward(model, variables, img1, img2, n_tiles, halo=None):
    """Inference forward of `model.apply(variables, img1, img2,
    train=False)` computed in `n_tiles` sequential height slabs.

    img1/img2: (B, H, W, C). Returns the identical fused output.
    Dispatches on the model class: stride-1 local-fusion models run
    whole-model slabs; the multi-scale / global-fusion set runs the
    two-phase encode-fuse-decode tiling (see module docstring). Models
    outside both sets raise (ineligible geometry: cross-phase skips,
    attention encoders)."""
    n = int(n_tiles)
    if n <= 1:
        return model.apply(variables, img1, img2, train=False)
    name = type(model).__name__.lower()
    if name in TILED_MULTISCALE:
        enc_rh, dec_rh = TILED_MULTISCALE[name] if halo is None \
            else (int(halo), int(halo))
        return _two_phase(model, variables, img1, img2, n, enc_rh, dec_rh)
    # whole-model slab path: same eligibility as spatial sharding
    # (stride-1 convs, per-pixel-local fusion)
    check_spatial_eligible(name, getattr(model, "fusion_mode", None))
    return _whole_model(model, variables, img1, img2, n, halo)


def _slab_geometry(h, n, rh):
    if h % n:
        raise ValueError(f"H={h} not divisible by n_tiles={n}; pad the "
                         f"input (cli pad_bucket) or use fewer tiles")
    s = h // n
    if s % 8 or rh % 8:
        raise ValueError(
            f"slab height {s} and halo {rh} must be multiples of 8 "
            f"(scale/pool alignment); pad H={h} or change n_tiles={n}")
    if s < rh:
        # an interior slab's halo window would cross the true image
        # boundary, where its reflect padding is NOT at the real edge
        raise ValueError(
            f"slab height {s} < receptive halo {rh}: use fewer tiles "
            f"for H={h}")
    return s


def _whole_model(model, variables, img1, img2, n, halo):
    b, h, w, _ = img1.shape
    s = h // n if h % n == 0 else None
    if s is None:
        raise ValueError(f"H={h} not divisible by n_tiles={n}; pad the "
                         f"input (cli pad_bucket) or use fewer tiles")
    r = receptive_halo(variables) if halo is None else int(halo)
    if s < r:
        raise ValueError(
            f"slab height {s} < receptive halo {r}: context would span "
            f"non-neighbor slabs; use fewer tiles for H={h}")

    def run(a1, a2):
        return model.apply(variables, a1, a2, train=False)

    # top slab: true boundary above (reflect exact), R context rows below
    top = run(img1[:, :s + r], img2[:, :s + r])[:, :s]
    # bottom slab: R context rows above, true boundary below
    bot = run(img1[:, h - (s + r):], img2[:, h - (s + r):])[:, r:]

    if n == 2:
        return jnp.concatenate([top, bot], axis=1)

    # interior slabs share one trace via lax.map: XLA's loop keeps a
    # single slab's activations live, which is the whole point
    starts = jnp.arange(1, n - 1) * s - r

    def mid(lo):
        a1 = jax.lax.dynamic_slice_in_dim(img1, lo, s + 2 * r, axis=1)
        a2 = jax.lax.dynamic_slice_in_dim(img2, lo, s + 2 * r, axis=1)
        return run(a1, a2)[:, r:r + s]

    mids = jax.lax.map(mid, starts)             # (n-2, B, s, W, C)
    mids = jnp.moveaxis(mids, 0, 1).reshape((b, (n - 2) * s) +
                                            mids.shape[3:])
    return jnp.concatenate([top, mids, bot], axis=1)


def _stitch(n, s, top, mids, bot):
    """Concatenate per-scale slab crops back into full pyramids."""

    def leaf(t, m, bo):
        if n == 2:
            return jnp.concatenate([t, bo], axis=1)
        b = t.shape[0]
        m = jnp.moveaxis(m, 0, 1).reshape((b, m.shape[0] * m.shape[2]) +
                                          m.shape[3:])
        return jnp.concatenate([t, m, bo], axis=1)

    if n == 2:
        return jax.tree.map(lambda t, bo: leaf(t, None, bo), top, bot)
    return jax.tree.map(leaf, top, mids, bot)


def _two_phase(model, variables, img1, img2, n, enc_rh, dec_rh):
    b, h, w, _ = img1.shape
    s = _slab_geometry(h, n, max(enc_rh, dec_rh))

    # ---- phase A: tiled encode (siamese fold: both images in one batch)
    img = jnp.concatenate([img1, img2], axis=0)

    def crop(f, slab_h, lo_rows, keep_rows):
        sc = slab_h // f.shape[1]
        if f.shape[1] * sc != slab_h:
            raise ValueError(
                f"encoder feature height {f.shape[1]} does not divide "
                f"slab height {slab_h}: non-uniform scale transition")
        return f[:, lo_rows // sc: (lo_rows + keep_rows) // sc]

    def enc(a, lo, slab_h):
        with tile_rows_ctx(lo, slab_h, h):
            return model.apply(variables, a, False, method="encoder")

    f_top = jax.tree.map(
        lambda f: crop(f, s + enc_rh, 0, s),
        enc(img[:, :s + enc_rh], 0, s + enc_rh))
    f_bot = jax.tree.map(
        lambda f: crop(f, s + enc_rh, enc_rh, s),
        enc(img[:, h - (s + enc_rh):], h - (s + enc_rh), s + enc_rh))

    if n > 2:
        starts = jnp.arange(1, n - 1) * s - enc_rh

        def mid(lo):
            a = jax.lax.dynamic_slice_in_dim(img, lo, s + 2 * enc_rh,
                                             axis=1)
            return jax.tree.map(
                lambda f: crop(f, s + 2 * enc_rh, enc_rh, s),
                enc(a, lo, s + 2 * enc_rh))

        f_mid = jax.lax.map(mid, starts)
    else:
        f_mid = None
    feats = _stitch(n, s, f_top, f_mid, f_bot)

    # ---- phase B: global fusion on the full pyramids (exact global stats)
    feats1 = jax.tree.map(lambda f: f[:b], feats)
    feats2 = jax.tree.map(lambda f: f[b:], feats)
    fused = model.apply(variables, feats1, feats2, method="fusion")

    # ---- phase C: tiled decode on halo-padded slices of the pyramids
    def dec(lo, slab_h):
        def sl(t):
            sc = h // t.shape[1]
            return jax.lax.dynamic_slice_in_dim(
                t, lo // sc, slab_h // sc, axis=1)

        parts = jax.tree.map(sl, fused)
        with tile_rows_ctx(lo, slab_h, h):
            return model.apply(variables, parts, False, method="decoder")

    top = dec(0, s + dec_rh)[:, :s]
    bot = dec(h - (s + dec_rh), s + dec_rh)[:, dec_rh:]
    if n == 2:
        return jnp.concatenate([top, bot], axis=1)

    starts = jnp.arange(1, n - 1) * s - dec_rh

    def midd(lo):
        return dec(lo, s + 2 * dec_rh)[:, dec_rh:dec_rh + s]

    mids = jax.lax.map(midd, starts)
    mids = jnp.moveaxis(mids, 0, 1).reshape((b, (n - 2) * s) +
                                            mids.shape[3:])
    return jnp.concatenate([top, mids, bot], axis=1)
