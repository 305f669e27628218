"""Spatial (height) sharding: one full-resolution pair across many chips.

The reference's only parallel axis is the batch (single-node NCCL DDP,
reference common.py:96-113); images larger than one GPU's appetite are
handled by cropping (train.py:192-201). This module adds the axis the
reference never had — the vision analogue of sequence parallelism: shard
the IMAGE's height over a device mesh and fuse one full-res pair with
all chips cooperating. Useful when latency on a single pair matters
(batch-DP cannot shrink it) or when a gigapixel input exceeds one chip's
HBM.

Design (receptive-field halo, one exchange total):

- Every conv in the eligible models is stride-1 with reflect-'SAME'
  padding (reference block.py:26-99), and every fusion op they use is
  per-pixel local, so output rows [a, b) depend on input rows
  [a - R, b + R) only, where R = sum over the conv stack of (kh // 2).
  R is derived from the parameter tree (`receptive_halo`) as a safe
  upper bound: summing over ALL kernels over-counts parallel branches,
  which only widens the slab (more overlap compute), never breaks
  exactness.
- Each device owns S = H / n rows and receives R context rows from each
  neighbor via one `lax.ppermute` pair up front — ICI neighbor traffic,
  no host gathers, no per-layer communication.
- The model then runs UNMODIFIED on the local slab. At slab edges that
  are true image boundaries its reflect padding is semantically correct;
  at interior slab edges the padding reads wrong rows, but the
  contamination penetrates at most R rows — exactly the overlap being
  discarded. Three static variants (top / middle / bottom slab) under
  `lax.switch` keep the true-boundary reflect exact; outputs crop back
  to the owned S rows, so the sharded result is numerically IDENTICAL to
  the single-device forward (tests/test_spatial.py asserts equality).

Eligibility: whole-forward stride-1 models whose fusion is per-pixel
local — deepfuse, densefuse (sum/mean/max/l1), vifnet, pfnetv1, pfnetv2,
ifcnn, difnet, pmgi. Multi-scale models (pool/stride transitions change
the halo geometry per level) and global fusion ('nl' attention, nuclear
pooling) are rejected loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from .mesh import make_mesh

# Models whose forward is a stride-1 conv stack with per-pixel-local
# fusion (see module docstring). Keys match models.create_model.
SPATIAL_ELIGIBLE = ("deepfuse", "densefuse", "vifnet", "pfnetv1",
                    "pfnetv2", "ifcnn", "difnet", "pmgi")

# Fusion modes that reduce over the full spatial extent (reference
# fusion.py:97-150); a model configured with one cannot be height-sharded
# exactly. (The eligible models' defaults — sum/mean/max/l1/concat and
# the learned 1x1 fusers — are all per-pixel local.)
_GLOBAL_FUSION_MODES = ("nl", "nuclear")


def receptive_halo(variables):
    """Upper bound on the forward's receptive-field halo, in rows.

    Sums (kh // 2) over every 4-D conv kernel in the parameter tree.
    Exact for a sequential stride-1 stack; an over-estimate when blocks
    branch (dense blocks, unshared siamese encoders), which costs
    overlap compute but preserves exactness.
    """
    halo = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(variables):
        if getattr(leaf, "ndim", 0) == 4:
            name = str(path[-1])
            if "kernel" in name:
                halo += int(leaf.shape[0]) // 2
    return halo


def check_spatial_eligible(model_name, fusion_mode=None):
    name = model_name.lower()
    if name not in SPATIAL_ELIGIBLE:
        raise ValueError(
            f"model '{model_name}' cannot be height-sharded exactly: "
            f"only stride-1 local-fusion models qualify "
            f"({', '.join(SPATIAL_ELIGIBLE)}); multi-scale transitions "
            f"and global fusion change the halo geometry")
    if fusion_mode in _GLOBAL_FUSION_MODES:
        raise ValueError(
            f"fusion mode '{fusion_mode}' reduces over the full image "
            f"and cannot be height-sharded exactly")


def spatial_forward(model, variables, img1, img2, mesh=None,
                    axis_name="data", halo=None, train=False):
    """Fused forward of one (batch of) pair(s), height-sharded over the
    mesh. Returns the same values as `model.apply(variables, img1, img2,
    train=train)` — bit-comparable, see tests/test_spatial.py.

    img1/img2: (B, H, W, C) with H divisible by the mesh size and
    H / n >= halo (each device's context comes from its immediate
    neighbor only).

    train=True is differentiable end-to-end (shard_map transposes the
    ppermute exchange automatically) and exact for norm-free models;
    batch-stat-bearing models are rejected (their stats would reduce
    per-shard).
    """
    if train and variables.get("batch_stats"):
        raise ValueError(
            "spatial training is exact only for norm-free models: "
            "batch statistics would reduce over each height shard "
            "instead of the global extent")
    if mesh is None:
        mesh = make_mesh()
    n = int(np.prod(mesh.shape[axis_name]))
    if n == 1:
        return model.apply(variables, img1, img2, train=train)

    _, h, _, _ = img1.shape
    if h % n:
        raise ValueError(f"H={h} not divisible by mesh size {n}; pad the "
                         f"input (cli pad_bucket) or use fewer devices")
    s = h // n
    r = receptive_halo(variables) if halo is None else int(halo)
    if s < r:
        raise ValueError(
            f"shard height {s} < receptive halo {r}: context would span "
            f"non-neighbor devices; use fewer devices for H={h}")

    up_perm = [(i, i + 1) for i in range(n - 1)]    # ctx from device above
    down_perm = [(i + 1, i) for i in range(n - 1)]  # ctx from device below

    def exchange(blk):
        top_ctx = jax.lax.ppermute(blk[:, -r:], axis_name, up_perm)
        bot_ctx = jax.lax.ppermute(blk[:, :r], axis_name, down_perm)
        return jnp.concatenate([top_ctx, blk, bot_ctx], axis=1)

    def local(v, b1, b2):
        s1, s2 = exchange(b1), exchange(b2)  # (B, S + 2R, W, C)
        idx = jax.lax.axis_index(axis_name)

        # Three static slab variants so reflect padding acts on true
        # image boundaries only; ppermute's zero-fill for the missing
        # neighbor lands in the rows each variant slices away.
        def top(a1, a2):
            return model.apply(v, a1[:, r:], a2[:, r:],
                               train=train)[:, :s]

        def mid(a1, a2):
            return model.apply(v, a1, a2, train=train)[:, r:r + s]

        def bot(a1, a2):
            return model.apply(v, a1[:, :s + r], a2[:, :s + r],
                               train=train)[:, r:r + s]

        branch = jnp.where(idx == 0, 0, jnp.where(idx == n - 1, 2, 1))
        return jax.lax.switch(branch, (top, mid, bot), s1, s2)

    shard = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, axis_name), P(None, axis_name)),
        out_specs=P(None, axis_name), check_vma=False)
    return shard(variables, img1, img2)


def spatial_forward_multiscale(model, variables, img1, img2, mesh=None,
                               axis_name="data"):
    """Height-shard a multi-scale / global-fusion model over the mesh
    (SURVEY §2.3 SP row; VERDICT r3 item #7) — the multi-chip analogue of
    parallel/tiling.py's two-phase forward:

    1. *sharded encode* (shard_map): each device takes its input slab
       plus a ppermute halo exchange of TILED_MULTISCALE's encode halo,
       runs the encoder, crops to its owned rows — producing per-scale
       feature pyramids sharded over H.
    2. *global fusion* (GSPMD): the model's fusion runs under plain jit
       on the H-sharded pyramids; XLA inserts the cross-device
       reductions for the global attention statistics (psum over ICI)
       rather than the code hand-gathering anything.
    3. *sharded decode* (shard_map): per-scale ppermute halo exchanges of
       the decode halo, then the decoder on each device's halo-padded
       slices; `tile_rows_ctx` threads the absolute geometry into
       bilinear upsampling so the sharded result matches the
       single-device forward.

    Exact parity with `model.apply` at mesh-divisible, 8-aligned slab
    heights (tests/test_spatial.py)."""
    import numpy as np

    from ..ops.layers import tile_rows_ctx
    from .mesh import make_mesh
    from .tiling import TILED_MULTISCALE

    name = type(model).__name__.lower()
    if name not in TILED_MULTISCALE:
        raise ValueError(
            f"model '{name}' has no multi-scale spatial-shard geometry; "
            f"known: {sorted(TILED_MULTISCALE)}")
    enc_rh, dec_rh = TILED_MULTISCALE[name]
    if mesh is None:
        mesh = make_mesh()
    n = int(np.prod(mesh.shape[axis_name]))
    if n == 1:
        return model.apply(variables, img1, img2, train=False)
    b, h, w, _ = img1.shape
    if h % n:
        raise ValueError(f"H={h} not divisible by mesh size {n}; pad the "
                         f"input (cli pad_bucket) or use fewer devices")
    s = h // n
    if s % 8:
        raise ValueError(f"shard height {s} must be a multiple of 8 "
                         f"(scale/pool alignment)")
    if s < max(enc_rh, dec_rh):
        raise ValueError(
            f"shard height {s} < receptive halo "
            f"{max(enc_rh, dec_rh)}: use fewer devices for H={h}")

    up_perm = [(i, i + 1) for i in range(n - 1)]
    down_perm = [(i + 1, i) for i in range(n - 1)]

    def exchange(blk, r):
        top_ctx = jax.lax.ppermute(blk[:, -r:], axis_name, up_perm)
        bot_ctx = jax.lax.ppermute(blk[:, :r], axis_name, down_perm)
        return jnp.concatenate([top_ctx, blk, bot_ctx], axis=1)

    # ---- phase A: sharded encode (siamese fold over the batch axis)
    def enc_local(v, b1, b2):
        x = jnp.concatenate([b1, b2], axis=0)
        x = exchange(x, enc_rh)                 # (2B, S + 2R, W, C)
        idx = jax.lax.axis_index(axis_name)

        def crop(feats, slab_h, lo):
            return jax.tree.map(
                lambda f: jax.lax.dynamic_slice_in_dim(
                    f, lo * f.shape[1] // slab_h,
                    s * f.shape[1] // slab_h, axis=1),
                feats)

        def run(a, lo_abs, slab_h, lo):
            with tile_rows_ctx(lo_abs, slab_h, h):
                feats = model.apply(v, a, False, method="encoder")
            return crop(feats, slab_h, lo)

        def top(a):
            return run(a[:, enc_rh:], 0, s + enc_rh, 0)

        def mid(a):
            return run(a, idx * s - enc_rh, s + 2 * enc_rh, enc_rh)

        def bot(a):
            return run(a[:, :s + enc_rh], h - (s + enc_rh), s + enc_rh,
                       enc_rh)

        branch = jnp.where(idx == 0, 0, jnp.where(idx == n - 1, 2, 1))
        return jax.lax.switch(branch, (top, mid, bot), x)

    feats = jax.shard_map(
        enc_local, mesh=mesh,
        in_specs=(P(), P(None, axis_name), P(None, axis_name)),
        out_specs=P(None, axis_name), check_vma=False)(
            variables, img1, img2)

    # ---- phase B: global fusion under GSPMD (H-sharded pyramids in,
    # XLA inserts the global-pooling collectives)
    feats1 = jax.tree.map(lambda f: f[:b], feats)
    feats2 = jax.tree.map(lambda f: f[b:], feats)
    fused = jax.jit(
        lambda v, f1, f2: model.apply(v, f1, f2, method="fusion"))(
            variables, feats1, feats2)

    # ---- phase C: sharded decode with per-scale halo exchanges
    def dec_local(v, fused):
        idx = jax.lax.axis_index(axis_name)
        # exchange dec_rh full-res rows' worth at each scale: local leaf
        # height is s // sc, so the halo is dec_rh // sc rows
        padded = jax.tree.map(
            lambda f: exchange(f, dec_rh // (s // f.shape[1])), fused)

        def run(parts, lo_abs, slab_h, lo):
            with tile_rows_ctx(lo_abs, slab_h, h):
                y = model.apply(v, parts, False, method="decoder")
            return y[:, lo:lo + s]

        def sl(feats, lo_rows, len_rows):
            # slice [lo_rows, lo_rows + len_rows) full-res rows from the
            # (s + 2*dec_rh)-row padded slabs, per scale
            def leaf(f):
                sc = (s + 2 * dec_rh) // f.shape[1]
                return jax.lax.dynamic_slice_in_dim(
                    f, lo_rows // sc, len_rows // sc, axis=1)
            return jax.tree.map(leaf, feats)

        def top(p):
            # drop the zero-filled top ctx: true boundary reflect exact
            return run(sl(p, dec_rh, s + dec_rh), 0, s + dec_rh, 0)

        def mid(p):
            return run(sl(p, 0, s + 2 * dec_rh), idx * s - dec_rh,
                       s + 2 * dec_rh, dec_rh)

        def bot(p):
            return run(sl(p, 0, s + dec_rh), h - (s + dec_rh),
                       s + dec_rh, dec_rh)

        branch = jnp.where(idx == 0, 0, jnp.where(idx == n - 1, 2, 1))
        return jax.lax.switch(branch, (top, mid, bot), padded)

    return jax.shard_map(
        dec_local, mesh=mesh,
        in_specs=(P(), jax.tree.map(lambda _: P(None, axis_name), fused)),
        out_specs=P(None, axis_name), check_vma=False)(variables, fused)
