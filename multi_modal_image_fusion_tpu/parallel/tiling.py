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
numerically IDENTICAL to the whole-image forward (tests/test_tiling.py),
by the same argument as spatial.py — stride-1 reflect-SAME convs and
per-pixel-local fusion mean output rows [a, b) depend on input rows
[a - R, b + R) only, and interior slab edges take R true context rows
(sliced from the resident input, where spatial.py needed a ppermute)
while true image boundaries keep their reflect semantics.

Eligibility is shared with spatial.py (check_spatial_eligible): stride-1
local-fusion models. Multi-scale models need scale-aligned slab
geometry (halo growing by the cumulative stride per transition) — a
recorded extension, rejected loudly for now.
"""

import jax
import jax.numpy as jnp

from .spatial import receptive_halo

__all__ = ["tiled_forward", "receptive_halo"]


def tiled_forward(model, variables, img1, img2, n_tiles, halo=None):
    """Inference forward of `model.apply(variables, img1, img2,
    train=False)` computed in `n_tiles` sequential height slabs.

    img1/img2: (B, H, W, C) with H divisible by n_tiles and
    H / n_tiles >= halo (each slab's context comes from its immediate
    neighbors only). Returns the identical fused output.
    """
    b, h, w, _ = img1.shape
    n = int(n_tiles)
    if n <= 1:
        return model.apply(variables, img1, img2, train=False)
    if h % n:
        raise ValueError(f"H={h} not divisible by n_tiles={n}; pad the "
                         f"input (cli pad_bucket) or use fewer tiles")
    s = h // n
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
